"""Registry for non-ViT timm trunk families.

The reference reaches EVA / ViTamin / Swin / FastViT vision towers by
wrapping `timm.create_model` (`src/open_clip/timm_model.py:64-90`).
Here each family is a native scan-stacked JAX implementation in its own
module (models/eva.py, models/vitamin.py, ...), and this registry is the
single dispatch point between them and the generic model machinery
(config ingestion, init, encode, checkpoint interop):

  * a family module defines a frozen *spec* dataclass (hashable — specs
    ride on CLIPConfig, which is a static jit argument) and registers
    `(spec_cls, init, encode, from_timm, match)` at import time;
  * `spec_for_timm_name` resolves an open_clip `timm_model_name` to a
    spec (or None → the generic ViT mapping in models/timm_vision.py);
  * `init` / `encode` / `from_timm` dispatch on the spec's class.

Families are imported lazily inside `spec_for_timm_name` so importing
leaf_tpu.models.config stays cheap.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

Params = Dict[str, Any]

_FAMILIES = []          # (spec_cls, init_fn, encode_fn, from_timm_fn)
_MATCHERS = []          # fn(name, embed_dim, image_size, pool, proj) -> spec|None

# module paths probed by spec_for_timm_name; importing one registers
# its family
_FAMILY_MODULES = (
    "leaf_tpu.models.eva",
    "leaf_tpu.models.vitamin",
    "leaf_tpu.models.swin",
    "leaf_tpu.models.relpos_vit",
    "leaf_tpu.models.mci",
)


def register_trunk(spec_cls, init_fn: Callable, encode_fn: Callable,
                   from_timm_fn: Optional[Callable] = None,
                   match_fn: Optional[Callable] = None) -> None:
    _FAMILIES.append((spec_cls, init_fn, encode_fn, from_timm_fn))
    if match_fn is not None:
        _MATCHERS.append(match_fn)


def _load_families() -> None:
    import importlib
    import logging
    for mod in _FAMILY_MODULES:
        try:
            importlib.import_module(mod)
        except ImportError as e:
            # a swallowed import failure would surface later as a
            # misleading "unsupported timm model" — keep the real cause
            logging.getLogger(__name__).warning(
                "trunk family %s failed to import (%r); its configs "
                "will be unavailable", mod, e)


def spec_for_timm_name(name: str, embed_dim: int,
                       image_size: Optional[int] = None,
                       pool: str = "", proj: str = "linear"):
    """Resolve an open_clip vision_cfg timm_model_name to a family
    spec, or None when the name belongs to the generic ViT mapping
    (models/timm_vision.py) / convnext (models/convnext.py)."""
    _load_families()
    for match in _MATCHERS:
        spec = match(name, embed_dim, image_size=image_size, pool=pool,
                     proj=proj)
        if spec is not None:
            return spec
    return None


def _family(spec):
    _load_families()
    for fam in _FAMILIES:
        if isinstance(spec, fam[0]):
            return fam
    raise TypeError(f"no registered trunk family for spec {type(spec)!r}")


def init(key, spec) -> Params:
    return _family(spec)[1](key, spec)


def encode(params: Params, spec, images, normalize: bool = False,
           dtype=None, **kw):
    import jax.numpy as jnp
    return _family(spec)[2](params, spec, images, normalize=normalize,
                            dtype=dtype or jnp.float32, **kw)


def from_timm(sd, spec, trunk_prefix: str = "visual.trunk.",
              head_prefix: str = "visual.head.") -> Params:
    """timm/open_clip state dict → native pytree for this trunk."""
    fn = _family(spec)[3]
    if fn is None:
        raise NotImplementedError(
            f"checkpoint ingestion not implemented for {type(spec).__name__}")
    return fn(sd, spec, trunk_prefix=trunk_prefix, head_prefix=head_prefix)
