"""Test configuration: force an 8-device virtual CPU backend.

Mirrors the SURVEY.md §4 implication: the reference could only test
distributed code at world_size=1; here every test sees 8 XLA CPU
devices so mesh/pjit paths are exercised for real.
"""
import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# at interpreter start, overriding the env var — re-force CPU so tests
# run on the virtual 8-device host mesh, not through the TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Deregister the axon backend factory entirely: its get_backend hook
# initializes EVERY registered platform, so a down/flaky TPU tunnel
# would hang the whole suite inside make_c_api_client even though all
# tests run on CPU.
try:
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
except Exception:  # noqa: BLE001 — jax internals moved; tests still run
    pass

# JAX's default matmul precision is bf16-grade (the TPU MXU fast path);
# parity tests need true fp32 accumulation.
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: first-compiles dominate test wall time
# in this environment; reruns hit the disk cache.
from leaf_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


@pytest.fixture(scope="session")
def tokenizer():
    from leaf_tpu.tokenizer import get_tokenizer
    return get_tokenizer()
