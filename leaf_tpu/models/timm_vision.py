"""timm ViT vision towers.

TPU-native counterpart of the reference's `src/open_clip/
timm_model.py` for the vision-transformer family: instead of wrapping
a torch `timm.create_model` trunk, a timm ViT checkpoint is *mapped*
onto the generalized leaf_tpu ViT tower (biased patch embedding, no
ln_pre, 'tok'/'avg_patch' pooling, linear/mlp projection head) and
runs through the same scan-stacked XLA forward as every other tower.

Covered: `vit_{tiny,small,base,large,huge,giant}_patch{14,16,32}_*`
trunks with pool ∈ {'tok', 'avg'} and proj ∈ {'linear', 'mlp',
'none'} — the combinations open_clip model configs actually use.
Convolutional timm trunks live elsewhere: convnext in
models/convnext.py, the ModifiedResNet family in models/resnet.py.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Mapping, Optional

import numpy as np

from leaf_tpu.models.config import VisionConfig

_VIT_DIMS = {
    # name-part → (width, layers, head_width)
    "tiny": (192, 12, 64),
    "small": (384, 12, 64),
    "base": (768, 12, 64),
    "large": (1024, 24, 64),
    "huge": (1280, 32, 80),
    "giant": (1408, 40, 88),
}

_VIT_RE = re.compile(
    r"^vit_(tiny|small|base|large|huge|giant)_patch(\d+)(?:_(\d+))?")


def parse_timm_vit_name(model_name: str):
    """'vit_base_patch16_224' → (width, layers, head_width, patch,
    image_size or None)."""
    m = _VIT_RE.match(model_name)
    if not m:
        raise ValueError(
            f"unsupported timm model {model_name!r}: only the ViT "
            "family maps onto the native tower (convnext trunks are "
            "handled by models/convnext.py, resnets by models/resnet.py)")
    width, layers, head_width = _VIT_DIMS[m.group(1)]
    patch = int(m.group(2))
    image = int(m.group(3)) if m.group(3) else None
    return width, layers, head_width, patch, image


def timm_vision_config(model_name: str, embed_dim: int,
                       image_size: Optional[int] = None,
                       pool: str = "avg", proj: str = "linear",
                       mlp_ratio: float = 4.0) -> VisionConfig:
    """VisionConfig for a timm ViT trunk (reference TimmModel args
    `timm_model.py:33-45`)."""
    width, layers, head_width, patch, name_size = parse_timm_vit_name(
        model_name)
    pool_type = {"tok": "tok", "avg": "avg_patch", "": "tok"}.get(pool)
    if pool_type is None:
        raise ValueError(f"unsupported timm pool {pool!r} "
                         "(abs_attn/rot_attn need conv feature maps)")
    return VisionConfig(
        image_size=image_size or name_size or 224,
        patch_size=patch, width=width, layers=layers,
        head_width=head_width, mlp_ratio=mlp_ratio, output_dim=embed_dim,
        pool_type=pool_type, patch_bias=True, ln_pre=False)


def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def timm_vit_to_params(sd: Mapping[str, Any], cfg: VisionConfig,
                       trunk_prefix: str = "visual.trunk.",
                       head_prefix: str = "visual.head.",
                       proj: str = "linear") -> Dict[str, Any]:
    """timm vision_transformer state dict → leaf_tpu vision pytree.

    Key layout: `patch_embed.proj`, `cls_token`, `pos_embed`,
    `blocks.N.{norm1,attn.qkv,attn.proj,norm2,mlp.fc1,mlp.fc2}`,
    `norm`; the projection lives either under `visual.head.proj`
    (open_clip extra head), `visual.head.mlp` or as the trunk
    classifier `head` (proj='linear' via num_classes)."""
    g = lambda k: _np(sd[trunk_prefix + k])  # noqa: E731

    conv = g("patch_embed.proj.weight")          # [D, 3, p, p]
    p = conv.shape[-1]
    patch_embedding = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, -1)

    def stack(fmt, transpose=False):
        per = []
        for i in range(cfg.layers):
            w = g(fmt.format(i))
            per.append(w.T if transpose else w)
        return np.stack(per)

    out = {
        "patch_embedding": patch_embedding,
        "patch_bias": g("patch_embed.proj.bias"),
        "class_embedding": g("cls_token").reshape(-1),
        "positional_embedding": g("pos_embed").reshape(
            -1, cfg.width),
        "blocks": {
            "ln_1": {"scale": stack("blocks.{}.norm1.weight"),
                     "bias": stack("blocks.{}.norm1.bias")},
            "attn": {"qkv_w": stack("blocks.{}.attn.qkv.weight", True),
                     "qkv_b": stack("blocks.{}.attn.qkv.bias"),
                     "out_w": stack("blocks.{}.attn.proj.weight", True),
                     "out_b": stack("blocks.{}.attn.proj.bias")},
            "ln_2": {"scale": stack("blocks.{}.norm2.weight"),
                     "bias": stack("blocks.{}.norm2.bias")},
            "mlp": {"fc_w": stack("blocks.{}.mlp.fc1.weight", True),
                    "fc_b": stack("blocks.{}.mlp.fc1.bias"),
                    "proj_w": stack("blocks.{}.mlp.fc2.weight", True),
                    "proj_b": stack("blocks.{}.mlp.fc2.bias")},
        },
        "ln_post": {"scale": g("norm.weight"), "bias": g("norm.bias")},
    }

    if proj == "mlp" and head_prefix + "mlp.fc1.weight" in sd:
        head = {"fc_w": _np(sd[head_prefix + "mlp.fc1.weight"]).T,
                "fc_b": _np(sd[head_prefix + "mlp.fc1.bias"]),
                "proj_w": _np(sd[head_prefix + "mlp.fc2.weight"]).T}
        if head_prefix + "mlp.fc2.bias" in sd:
            head["proj_b"] = _np(sd[head_prefix + "mlp.fc2.bias"])
        out["head_mlp"] = head
    elif head_prefix + "proj.weight" in sd:
        out["proj"] = _np(sd[head_prefix + "proj.weight"]).T
        if head_prefix + "proj.bias" in sd:
            out["proj_bias"] = _np(sd[head_prefix + "proj.bias"])
    elif trunk_prefix + "head.weight" in sd:
        # trunk classifier used as projection (proj unset in config)
        out["proj"] = _np(sd[trunk_prefix + "head.weight"]).T
        if trunk_prefix + "head.bias" in sd:
            out["proj_bias"] = _np(sd[trunk_prefix + "head.bias"])
    # proj == 'none': features pass through at trunk width
    return out
