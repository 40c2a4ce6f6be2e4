"""Ahead-of-time model export (the reference's TorchScript equivalent).

The reference offers `trace_model` / `--torchscript`
(`/root/reference/src/open_clip/model.py:507-520`) to freeze a model
into a deployable artifact.  The TPU-native counterpart is
`jax.export`: serialise the lowered StableHLO of the jitted forward
(with weights embedded as constants or left as inputs) to a portable
artifact that any JAX runtime of a compatible version can load without
the Python model code.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def trace_model(params, cfg: CLIPConfig, batch_size: int = 1,
                dtype=jnp.float32, normalize: bool = False):
    """Return (exported_text, exported_image): `jax.export.Exported`
    objects for the two encoders with fixed shapes.  `normalize` bakes
    L2 normalization into the artifact (match it to however the
    consumer compares features — serve.py exports with its own
    setting so artifact and .npz features agree)."""
    from jax import export as jexport

    tokens_spec = jax.ShapeDtypeStruct(
        (batch_size, cfg.text.context_length), jnp.int32)
    image_size = (cfg.resnet.image_size if cfg.resnet is not None
                  else cfg.vision.image_size)
    images_spec = jax.ShapeDtypeStruct(
        (batch_size, image_size, image_size, 3), dtype)

    text_fn = jax.jit(lambda t: lclip.encode_text(
        params["text"], cfg.text, t, cfg.quick_gelu,
        normalize=normalize, dtype=dtype))
    image_fn = jax.jit(lambda im: lclip.encode_image_model(
        params, cfg, im, normalize=normalize, dtype=dtype))

    exported_text = jexport.export(text_fn)(tokens_spec)
    exported_image = jexport.export(image_fn)(images_spec)
    return exported_text, exported_image


def save_exported(exported, path: str):
    with open(path, "wb") as f:
        f.write(exported.serialize())


def load_exported(path: str):
    from jax import export as jexport
    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def export_model(params, cfg: CLIPConfig, output_dir: str,
                 batch_size: int = 1, dtype=jnp.float32,
                 normalize: bool = False) -> Tuple[str, str]:
    """Serialise both encoders; returns the two artifact paths."""
    os.makedirs(output_dir, exist_ok=True)
    exported_text, exported_image = trace_model(params, cfg, batch_size,
                                                dtype, normalize)
    # hub model names carry '/' and ':' (hf-hub:org/repo) — sanitise
    # or open() fails on the phantom subdirectory
    tag = cfg.name.replace("/", "-").replace(":", "-")
    text_path = os.path.join(output_dir, f"{tag}.text.stablehlo")
    image_path = os.path.join(output_dir, f"{tag}.image.stablehlo")
    save_exported(exported_text, text_path)
    save_exported(exported_image, image_path)
    return text_path, image_path
