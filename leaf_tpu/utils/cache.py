"""Persistent XLA compilation cache setup.

Compiles for the big towers take minutes on first trace; caching the
executables on disk makes every subsequent process (bench runs, eval
CLIs, resumed training) start hot.  Call `enable_compilation_cache()`
before the first jit execution.
"""
from __future__ import annotations

import logging
import os

LOG = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.environ.get(
    "LEAF_TPU_JAX_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "leaf_tpu_jax"))


def enable_compilation_cache(cache_dir: str = DEFAULT_CACHE_DIR) -> None:
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # noqa: BLE001
        LOG.warning("could not enable jax compilation cache: %r", e)
