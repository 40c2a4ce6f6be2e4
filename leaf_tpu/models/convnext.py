"""ConvNeXt vision tower (timm-trunk CLIP models).

TPU-native counterpart of the reference's convnext model configs
(`src/open_clip/model_configs/convnext_*.json`), which wrap a timm
`convnext_*` trunk through `src/open_clip/timm_model.py` with
`timm_pool: ""` (the trunk's own avg-pool + head-norm) and
`timm_proj: "linear" | "mlp"`.

Instead of wrapping torch, the trunk is re-expressed functionally in
NHWC: stem 4x4/4 conv + LN, four stages of (LN + 2x2/2 downsample,
then depthwise-7x7 -> LN -> pointwise 4x MLP -> layer-scale blocks),
global average pool, head LayerNorm, and the open_clip projection
head.  Within a stage every block has identical shapes, so blocks are
stacked on a leading axis and driven by one `lax.scan` — one compiled
block body per stage regardless of depth (27-deep stage 3 compiles as
fast as a 3-deep one), and the 7x7 depthwise + 1x1 GEMM pair is
exactly the shape XLA fuses well on the MXU.

Inference/eval semantics (stochastic depth is identity); the LEAF /
FARE training recipes fine-tune ViT towers, convnext towers are an
eval/model-zoo surface here.

State-dict mapping accepts both modern timm (`conv_dw`, `mlp.fc1`)
and original facebookresearch (`dwconv`, `pwconv1`) key spellings.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers

Params = Dict[str, Any]


def _l2_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch F.normalize (same as clip.l2_normalize; local copy
    avoids a config→convnext→clip import cycle)."""
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, eps)
LN_EPS = 1e-6  # timm/fb convnext LayerNorm eps


@dataclasses.dataclass(frozen=True)
class ConvNeXtVisionSpec:
    """Trunk shape (timm `convnext_<size>`) + open_clip head config
    (`timm_model.py:58-109`: proj 'linear' -> Linear(no bias),
    'mlp' -> Mlp(prev, 2*embed, embed))."""
    depths: Tuple[int, ...] = (3, 3, 27, 3)
    dims: Tuple[int, ...] = (128, 256, 512, 1024)
    image_size: int = 256
    output_dim: int = 640
    proj: str = "linear"  # 'linear' | 'mlp' | 'none'


# timm convnext_<name> trunk shapes
CONVNEXT_DIMS = {
    "tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
    "xlarge": ((3, 3, 27, 3), (256, 512, 1024, 2048)),
    "xxlarge": ((3, 4, 30, 3), (384, 768, 1536, 3072)),
}


def convnext_spec(timm_name: str, embed_dim: int, image_size: int = 256,
                  proj: str = "linear") -> ConvNeXtVisionSpec:
    """'convnext_base' → ConvNeXtVisionSpec."""
    size = timm_name.removeprefix("convnext_")
    if size not in CONVNEXT_DIMS:
        raise ValueError(f"unsupported convnext trunk {timm_name!r}; "
                         f"known sizes: {sorted(CONVNEXT_DIMS)}")
    depths, dims = CONVNEXT_DIMS[size]
    return ConvNeXtVisionSpec(depths=depths, dims=dims,
                              image_size=image_size,
                              output_dim=embed_dim, proj=proj)


# -- forward ------------------------------------------------------------------

def _conv(x, w, b, stride):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _block_body(x: jnp.ndarray, p: Params, dtype) -> jnp.ndarray:
    """One ConvNeXt block on NHWC x: depthwise 7x7 (pad 3) -> LN ->
    fc1 -> GELU -> fc2 -> gamma scale -> residual."""
    C = x.shape[-1]
    h = jax.lax.conv_general_dilated(
        x, p["dw_w"].astype(dtype), window_strides=(1, 1),
        padding=[(3, 3), (3, 3)], feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h = h + p["dw_b"].astype(dtype)
    h = layers.layer_norm(p["ln"], h, eps=LN_EPS)
    h = h @ p["fc1_w"].astype(dtype) + p["fc1_b"].astype(dtype)
    h = jax.nn.gelu(h, approximate=False)
    h = h @ p["fc2_w"].astype(dtype) + p["fc2_b"].astype(dtype)
    return x + p["gamma"].astype(dtype) * h


def encode_image_convnext(params: Params, spec: ConvNeXtVisionSpec,
                          images: jnp.ndarray, normalize: bool = False,
                          dtype=jnp.float32) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    x = images.astype(dtype)
    stem = params["stem"]
    x = _conv(x, stem["conv_w"].astype(dtype), stem["conv_b"].astype(dtype), 4)
    x = layers.layer_norm(stem["ln"], x, eps=LN_EPS)

    for si in range(len(spec.depths)):
        sp = params["stages"][si]
        if "downsample" in sp:
            d = sp["downsample"]
            x = layers.layer_norm(d["ln"], x, eps=LN_EPS)
            x = _conv(x, d["conv_w"].astype(dtype),
                      d["conv_b"].astype(dtype), 2)

        def body(h, bp):
            return _block_body(h, bp, dtype), None

        x, _ = jax.lax.scan(body, x, sp["blocks"])

    x = jnp.mean(x, axis=(1, 2))                      # global avg pool
    x = layers.layer_norm(params["head_norm"], x, eps=LN_EPS)
    if spec.proj == "linear":
        x = x @ params["proj"].astype(dtype)
    elif spec.proj == "mlp":
        m = params["head_mlp"]
        x = x @ m["fc_w"].astype(dtype) + m["fc_b"].astype(dtype)
        x = jax.nn.gelu(x, approximate=False)
        x = x @ m["proj_w"].astype(dtype)
        if "proj_b" in m:
            x = x + m["proj_b"].astype(dtype)
    return _l2_normalize(x) if normalize else x


# -- init ----------------------------------------------------------------------

def init_convnext(key, spec: ConvNeXtVisionSpec) -> Params:
    """trunc-normal(.02) conv/linear weights, layer-scale 1e-6 — the
    timm convnext `_init_weights` scheme."""
    n_keys = 3 + 2 * len(spec.depths)
    ks = list(jax.random.split(key, n_keys))

    def tn(k, shape):
        return 0.02 * jax.random.truncated_normal(k, -2.0, 2.0, shape,
                                                  jnp.float32)

    d0 = spec.dims[0]
    p: Params = {
        "stem": {"conv_w": tn(ks.pop(), (4, 4, 3, d0)),
                 "conv_b": jnp.zeros((d0,)),
                 "ln": layers.init_layer_norm(d0)},
        "stages": [],
        "head_norm": layers.init_layer_norm(spec.dims[-1]),
    }
    for si, (depth, dim) in enumerate(zip(spec.depths, spec.dims)):
        hidden = 4 * dim
        kb = jax.random.split(ks.pop(), 3)
        stage: Params = {"blocks": {
            "dw_w": tn(kb[0], (depth, 7, 7, 1, dim)),
            "dw_b": jnp.zeros((depth, dim)),
            "ln": {"scale": jnp.ones((depth, dim)),
                   "bias": jnp.zeros((depth, dim))},
            "fc1_w": tn(kb[1], (depth, dim, hidden)),
            "fc1_b": jnp.zeros((depth, hidden)),
            "fc2_w": tn(kb[2], (depth, hidden, dim)),
            "fc2_b": jnp.zeros((depth, dim)),
            "gamma": jnp.full((depth, dim), 1e-6),
        }}
        if si > 0:
            prev = spec.dims[si - 1]
            stage["downsample"] = {
                "ln": layers.init_layer_norm(prev),
                "conv_w": tn(ks.pop(), (2, 2, prev, dim)),
                "conv_b": jnp.zeros((dim,)),
            }
        p["stages"].append(stage)

    if spec.proj == "linear":
        p["proj"] = (spec.dims[-1] ** -0.5) * jax.random.normal(
            ks.pop(), (spec.dims[-1], spec.output_dim), jnp.float32)
    elif spec.proj == "mlp":
        k1, k2 = jax.random.split(ks.pop())
        hid = 2 * spec.output_dim
        p["head_mlp"] = {"fc_w": tn(k1, (spec.dims[-1], hid)),
                         "fc_b": jnp.zeros((hid,)),
                         "proj_w": tn(k2, (hid, spec.output_dim))}
    return p


# -- timm state-dict mapping ---------------------------------------------------

def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def timm_convnext_to_params(sd: Mapping[str, Any], spec: ConvNeXtVisionSpec,
                            trunk_prefix: str = "visual.trunk.",
                            head_prefix: str = "visual.head.") -> Params:
    """timm/fb convnext state dict → leaf_tpu convnext pytree.

    timm keys: `stem.{0,1}`, `stages.S.downsample.{0,1}`,
    `stages.S.blocks.B.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}`,
    `head.norm`; fb spellings `downsample_layers.*` /
    `stages.S.B.{dwconv,norm,pwconv1,pwconv2,gamma}` + `norm` are
    accepted too.  The open_clip projection lives under
    `visual.head.{proj,mlp}` (`timm_model.py:102-107`)."""

    def g(*names) -> np.ndarray:
        for n in names:
            if trunk_prefix + n in sd:
                return _np(sd[trunk_prefix + n])
        raise KeyError(f"none of {names} under {trunk_prefix!r}")

    def conv_hwio(w: np.ndarray) -> np.ndarray:
        return w.transpose(2, 3, 1, 0)  # OIHW → HWIO

    p: Params = {
        "stem": {
            "conv_w": conv_hwio(g("stem.0.weight",
                                  "downsample_layers.0.0.weight")),
            "conv_b": g("stem.0.bias", "downsample_layers.0.0.bias"),
            "ln": {"scale": g("stem.1.weight", "downsample_layers.0.1.weight"),
                   "bias": g("stem.1.bias", "downsample_layers.0.1.bias")},
        },
        "stages": [],
        "head_norm": {"scale": g("head.norm.weight", "norm.weight"),
                      "bias": g("head.norm.bias", "norm.bias")},
    }
    for si, depth in enumerate(spec.depths):
        def b(i, *suffixes):
            names = []
            for s in suffixes:
                names += [f"stages.{si}.blocks.{i}.{s}",
                          f"stages.{si}.{i}.{s}"]
            return g(*names)

        def stack(*suffixes, t=False):
            ws = [b(i, *suffixes) for i in range(depth)]
            return np.stack([w.T if t else w for w in ws])

        # depthwise OIHW [C,1,7,7] → HWIO [7,7,1,C]
        dw = np.stack([b(i, "conv_dw.weight", "dwconv.weight")
                       .transpose(2, 3, 1, 0) for i in range(depth)])
        stage: Params = {"blocks": {
            "dw_w": dw,
            "dw_b": stack("conv_dw.bias", "dwconv.bias"),
            "ln": {"scale": stack("norm.weight"),
                   "bias": stack("norm.bias")},
            "fc1_w": stack("mlp.fc1.weight", "pwconv1.weight", t=True),
            "fc1_b": stack("mlp.fc1.bias", "pwconv1.bias"),
            "fc2_w": stack("mlp.fc2.weight", "pwconv2.weight", t=True),
            "fc2_b": stack("mlp.fc2.bias", "pwconv2.bias"),
            "gamma": stack("gamma"),
        }}
        if si > 0:
            stage["downsample"] = {
                "ln": {"scale": g(f"stages.{si}.downsample.0.weight",
                                  f"downsample_layers.{si}.0.weight"),
                       "bias": g(f"stages.{si}.downsample.0.bias",
                                 f"downsample_layers.{si}.0.bias")},
                "conv_w": conv_hwio(g(f"stages.{si}.downsample.1.weight",
                                      f"downsample_layers.{si}.1.weight")),
                "conv_b": g(f"stages.{si}.downsample.1.bias",
                            f"downsample_layers.{si}.1.bias"),
            }
        p["stages"].append(stage)

    has_linear = head_prefix + "proj.weight" in sd
    has_mlp = head_prefix + "mlp.fc1.weight" in sd
    if spec.proj == "linear":
        if not has_linear:
            raise KeyError(
                f"config expects a linear projection head but the "
                f"checkpoint has no {head_prefix}proj.weight"
                + (" (it carries an MLP head — config/checkpoint "
                   "mismatch)" if has_mlp else
                   " (trunk-only checkpoint?)"))
        p["proj"] = _np(sd[head_prefix + "proj.weight"]).T
    elif spec.proj == "mlp":
        if not has_mlp:
            raise KeyError(
                f"config expects an MLP projection head but the "
                f"checkpoint has no {head_prefix}mlp.fc1.weight"
                + (" (it carries a linear head — config/checkpoint "
                   "mismatch)" if has_linear else
                   " (trunk-only checkpoint?)"))
        m = {"fc_w": _np(sd[head_prefix + "mlp.fc1.weight"]).T,
             "fc_b": _np(sd[head_prefix + "mlp.fc1.bias"]),
             "proj_w": _np(sd[head_prefix + "mlp.fc2.weight"]).T}
        if head_prefix + "mlp.fc2.bias" in sd:
            m["proj_b"] = _np(sd[head_prefix + "mlp.fc2.bias"])
        p["head_mlp"] = m
    elif has_linear or has_mlp:
        raise KeyError(
            "config declares no projection head (proj='none') but the "
            "checkpoint carries one — embeddings would silently come "
            "out in trunk space")
    return jax.tree.map(jnp.asarray, p)


def params_to_timm_convnext(p: Params, spec: ConvNeXtVisionSpec,
                            trunk_prefix: str = "visual.trunk.",
                            head_prefix: str = "visual.head.") -> Dict[str, np.ndarray]:
    """Inverse mapping (modern timm spellings) for checkpoint export."""
    out: Dict[str, np.ndarray] = {}

    def put(k, v):
        out[k] = np.asarray(v, np.float32)

    st = p["stem"]
    put(trunk_prefix + "stem.0.weight",
        np.asarray(st["conv_w"]).transpose(3, 2, 0, 1))
    put(trunk_prefix + "stem.0.bias", st["conv_b"])
    put(trunk_prefix + "stem.1.weight", st["ln"]["scale"])
    put(trunk_prefix + "stem.1.bias", st["ln"]["bias"])
    for si, depth in enumerate(spec.depths):
        sp = p["stages"][si]
        if "downsample" in sp:
            d = sp["downsample"]
            put(f"{trunk_prefix}stages.{si}.downsample.0.weight",
                d["ln"]["scale"])
            put(f"{trunk_prefix}stages.{si}.downsample.0.bias",
                d["ln"]["bias"])
            put(f"{trunk_prefix}stages.{si}.downsample.1.weight",
                np.asarray(d["conv_w"]).transpose(3, 2, 0, 1))
            put(f"{trunk_prefix}stages.{si}.downsample.1.bias", d["conv_b"])
        bl = sp["blocks"]
        for i in range(depth):
            pre = f"{trunk_prefix}stages.{si}.blocks.{i}."
            put(pre + "conv_dw.weight",
                np.asarray(bl["dw_w"][i]).transpose(3, 2, 0, 1))
            put(pre + "conv_dw.bias", bl["dw_b"][i])
            put(pre + "norm.weight", bl["ln"]["scale"][i])
            put(pre + "norm.bias", bl["ln"]["bias"][i])
            put(pre + "mlp.fc1.weight", np.asarray(bl["fc1_w"][i]).T)
            put(pre + "mlp.fc1.bias", bl["fc1_b"][i])
            put(pre + "mlp.fc2.weight", np.asarray(bl["fc2_w"][i]).T)
            put(pre + "mlp.fc2.bias", bl["fc2_b"][i])
            put(pre + "gamma", bl["gamma"][i])
    put(trunk_prefix + "head.norm.weight", p["head_norm"]["scale"])
    put(trunk_prefix + "head.norm.bias", p["head_norm"]["bias"])
    if spec.proj == "linear" and "proj" in p:
        put(head_prefix + "proj.weight", np.asarray(p["proj"]).T)
    elif spec.proj == "mlp" and "head_mlp" in p:
        m = p["head_mlp"]
        put(head_prefix + "mlp.fc1.weight", np.asarray(m["fc_w"]).T)
        put(head_prefix + "mlp.fc1.bias", m["fc_b"])
        put(head_prefix + "mlp.fc2.weight", np.asarray(m["proj_w"]).T)
        if "proj_b" in m:
            put(head_prefix + "mlp.fc2.bias", m["proj_b"])
    return out
