"""ViTamin vision towers (reference `model_configs/ViTamin-*.json`).

Native JAX implementation of the `vitamin_{small,base,large,large2,
xlarge}_{224,256,336,384}` timm trunks the reference reaches through
`timm.create_model` (`timm_model.py:74-90`; all ViTamin configs use
`timm_pool=''`, `timm_proj='linear'` — trunk features at the ViT
width, open_clip head Linear(width → embed_dim, bias=False)).

Architecture (ViTamin, Chen et al. CVPR'24; timm `vitamin.py`):
a 3-stage hybrid at strides 2/4/8/16 —

  * stem: 3×3 conv s2 → LayerNorm → GELU → 3×3 conv s1;
  * stages 1–2: MBConv-LN blocks (LN at block input, 1×1 expand ×4 →
    GELU → 3×3 depthwise (stride 2 on the first block of a stage) →
    GELU → 1×1 project; shortcut = identity / 1×1 conv / avgpool+1×1
    on downsampling blocks);
  * stage-3 embed: LayerNorm → 3×3 conv s2 to the ViT width;
  * stage 3: plain pre-LN ViT blocks — fused-qkv MHA and a GeGLU FFN
    (`mlp.norm` at the FFN input, gelu(w0·x)⊙(w1·x) → w2, hidden =
    2×width) — no class token, no position embedding (the conv
    stages carry locality);
  * pool: token mean → LayerNorm (timm fc_norm, applied *after*
    pooling when global_pool='avg').

Oracle: timm itself is absent, so tests/test_trunk_oracles.py carries
an independent hand-written torch forward of the published timm
`vitamin.py` architecture (Stem, MbConvLNBlock, Downsample2d shortcut,
StridedConv pool, GeGluMlp ViT stage) consuming the same timm-layout
state dict; shapes/ingestion additionally pinned by
tests/test_vitamin.py.  LayerNorms/softmax accumulate in fp32 like
every other leaf_tpu tower; the ViT stage runs as one `lax.scan`.
"""
from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers

Params = Dict[str, Any]
LN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class ViTaminVisionSpec:
    name: str
    image_size: int = 224
    dims: Tuple[int, int, int] = (160, 320, 1024)   # stage widths
    depths: Tuple[int, int] = (2, 4)                # MBConv blocks/stage
    vit_depth: int = 31
    heads: int = 16
    output_dim: int = 768
    expand_ratio: int = 4

    @property
    def grid_size(self) -> int:
        return self.image_size // 16                # stride-16 tokens

    @property
    def width(self) -> int:                         # ViT-stage width
        return self.dims[2]

    # placeholder-VisionConfig compat
    @property
    def patch_size(self) -> int:
        return 16

    @property
    def layers(self) -> int:
        return self.vit_depth


_DIMS = {
    "small": ((64, 128, 384), 14, 6),
    "base": ((128, 256, 768), 14, 12),
    "large": ((160, 320, 1024), 31, 16),
    "large2": ((160, 320, 1024), 31, 16),   # L2 = L trunk, 1024-d CLIP head
    "xlarge": ((192, 384, 1152), 32, 16),
}

_NAME_RE = re.compile(r"^vitamin_(small|base|large2?|xlarge)_(\d+)$")


def match_vitamin(name: str, embed_dim: int,
                  image_size: Optional[int] = None, pool: str = "",
                  proj: str = "linear") -> Optional[ViTaminVisionSpec]:
    m = _NAME_RE.match(name)
    if not m:
        if name.startswith("vitamin"):
            raise ValueError(f"unsupported ViTamin trunk {name!r}; "
                             f"implemented sizes: {sorted(_DIMS)}")
        return None
    dims, depth, heads = _DIMS[m.group(1)]
    return ViTaminVisionSpec(
        name=name, image_size=image_size or int(m.group(2)), dims=dims,
        vit_depth=depth, heads=heads, output_dim=embed_dim)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _conv(x, w, b, stride=1, pad=0, groups=1):
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], feature_group_count=groups,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(x.dtype)


def _mbconv(p: Params, x: jnp.ndarray, stride: int) -> jnp.ndarray:
    """MBConv-LN block; p carries the shortcut kind via its keys.

    Stride-2 shortcut = timm vitamin `Downsample2d`: 2×2 avg pool, then
    a 1×1 expand conv ONLY when the channel count changes (expand is
    Identity for cin == cout — e.g. stage 0's first block — so real
    checkpoints carry no weights there)."""
    if stride == 2:
        shortcut = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID") * 0.25
        if "sc_w" in p:
            shortcut = _conv(shortcut, p["sc_w"], p["sc_b"])
    elif "sc_w" in p:
        shortcut = _conv(x, p["sc_w"], p["sc_b"])
    else:
        shortcut = x
    h = layers.layer_norm(p["ln"], x, LN_EPS)
    h = _conv(h, p["exp_w"], p["exp_b"])
    h = layers.gelu(h)
    mid = h.shape[-1]
    h = _conv(h, p["dw_w"], p["dw_b"], stride=stride, pad=1, groups=mid)
    h = layers.gelu(h)
    h = _conv(h, p["proj_w"], p["proj_b"])
    return h + shortcut


def _vit_block(p: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    x = x + layers.attention(p["attn"],
                             layers.layer_norm(p["ln_1"], x, LN_EPS),
                             None, heads)
    h = layers.layer_norm(p["ln_2"], x, LN_EPS)
    m = p["mlp"]
    h = layers.layer_norm(m["ln"], h, LN_EPS)       # GeGluMlp input norm
    dt = h.dtype
    g = layers.gelu(h @ m["w0_w"].astype(dt) + m["w0_b"].astype(dt))
    u = h @ m["w1_w"].astype(dt) + m["w1_b"].astype(dt)
    h = (g * u) @ m["w2_w"].astype(dt) + m["w2_b"].astype(dt)
    return x + h


def encode_image_vitamin(params: Params, spec: ViTaminVisionSpec,
                         images: jnp.ndarray, normalize: bool = False,
                         dtype=jnp.float32, remat: bool = False,
                         **_ignored) -> jnp.ndarray:
    from leaf_tpu.models.clip import l2_normalize
    x = images.astype(dtype)
    st = params["stem"]
    x = _conv(x, st["conv1_w"], st["conv1_b"], stride=2, pad=1)
    x = layers.layer_norm(st["ln"], x, LN_EPS)
    x = layers.gelu(x)
    x = _conv(x, st["conv2_w"], st["conv2_b"], pad=1)

    for si in range(2):
        for bi, bp in enumerate(params["stages"][si]):
            x = _mbconv(bp, x, stride=2 if bi == 0 else 1)

    emb = params["embed"]
    x = layers.layer_norm(emb["ln"], x, LN_EPS)
    x = _conv(x, emb["conv_w"], emb["conv_b"], stride=2, pad=1)
    B, H, W, D = x.shape
    x = x.reshape(B, H * W, D)

    block = functools.partial(_vit_block, heads=spec.heads)
    if remat:
        block = jax.checkpoint(block)

    def body(h, bp):
        return block(bp, h), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    pooled = x.mean(axis=1)                          # global_pool='avg'
    pooled = layers.layer_norm(params["fc_norm"], pooled, LN_EPS)
    pooled = pooled @ params["proj"].astype(dtype)   # open_clip head,
    if normalize:                                    # bias=False
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Init / checkpoint ingestion
# ---------------------------------------------------------------------------

def init_vitamin(key, spec: ViTaminVisionSpec) -> Params:
    d0, d1, d2 = spec.dims
    ks = iter(jax.random.split(key, 64))
    nrm = lambda *s: 0.02 * jax.random.normal(next(ks), s, jnp.float32)
    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    ln = lambda c: {"scale": jnp.ones((c,), jnp.float32), "bias": zeros(c)}

    def mbconv(cin, cout, stride):
        mid = cout * spec.expand_ratio
        p = {"ln": ln(cin),
             "exp_w": nrm(1, 1, cin, mid), "exp_b": zeros(mid),
             "dw_w": nrm(3, 3, 1, mid), "dw_b": zeros(mid),
             "proj_w": nrm(1, 1, mid, cout), "proj_b": zeros(cout)}
        if cin != cout:      # Downsample2d.expand is Identity otherwise
            p["sc_w"] = nrm(1, 1, cin, cout)
            p["sc_b"] = zeros(cout)
        return p

    stages = []
    for si, (cin, cout) in enumerate([(d0, d0), (d0, d1)]):
        blocks = [mbconv(cin, cout, 2)]
        blocks += [mbconv(cout, cout, 1)
                   for _ in range(spec.depths[si] - 1)]
        stages.append(blocks)

    L, Hn = spec.vit_depth, 2 * d2
    sln = lambda: {"scale": jnp.ones((L, d2), jnp.float32),  # noqa: E731
                   "bias": zeros(L, d2)}
    snrm = lambda *s: 0.02 * jax.random.normal(  # noqa: E731
        next(ks), (L,) + s, jnp.float32)
    return {
        "stem": {"conv1_w": nrm(3, 3, 3, d0), "conv1_b": zeros(d0),
                 "ln": ln(d0),
                 "conv2_w": nrm(3, 3, d0, d0), "conv2_b": zeros(d0)},
        "stages": stages,
        "embed": {"ln": ln(d1), "conv_w": nrm(3, 3, d1, d2),
                  "conv_b": zeros(d2)},
        "blocks": {
            "ln_1": sln(),
            "attn": {"qkv_w": snrm(d2, 3 * d2), "qkv_b": zeros(L, 3 * d2),
                     "out_w": snrm(d2, d2), "out_b": zeros(L, d2)},
            "ln_2": sln(),
            "mlp": {"ln": sln(),
                    "w0_w": snrm(d2, Hn), "w0_b": zeros(L, Hn),
                    "w1_w": snrm(d2, Hn), "w1_b": zeros(L, Hn),
                    "w2_w": snrm(Hn, d2), "w2_b": zeros(L, d2)},
        },
        "fc_norm": ln(d2),
        "proj": nrm(d2, spec.output_dim),
    }


def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def _conv_hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)      # torch OIHW → HWIO


def _dw_hwio(w: np.ndarray) -> np.ndarray:
    # torch depthwise [C, 1, H, W] → HWIO [H, W, 1, C]
    return w.transpose(2, 3, 1, 0)


def timm_vitamin_to_params(sd: Mapping[str, Any], spec: ViTaminVisionSpec,
                           trunk_prefix: str = "visual.trunk.",
                           head_prefix: str = "visual.head.") -> Params:
    """timm vitamin state dict → native pytree.

    timm layout: the conv stages live under
    `patch_embed.backbone.{stem,stages.S.blocks.B,pool}` (HybridEmbed
    wrapping MbConvStages), ViT blocks under `blocks.N` with the
    GeGLU FFN keys `mlp.{norm,w0,w1,w2}`, pooled norm `fc_norm`, and
    the open_clip projection under `visual.head.proj`."""
    g = lambda kk: _np(sd[trunk_prefix + kk])  # noqa: E731
    be = "patch_embed.backbone."

    def mb(si, bi):
        b = f"{be}stages.{si}.blocks.{bi}."
        p = {"ln": {"scale": g(b + "pre_norm.weight"),
                    "bias": g(b + "pre_norm.bias")},
             "exp_w": _conv_hwio(g(b + "conv1_1x1.weight")),
             "exp_b": g(b + "conv1_1x1.bias"),
             "dw_w": _dw_hwio(g(b + "conv2_kxk.weight")),
             "dw_b": g(b + "conv2_kxk.bias"),
             "proj_w": _conv_hwio(g(b + "conv3_1x1.weight")),
             "proj_b": g(b + "conv3_1x1.bias")}
        for sc in ("shortcut.expand.weight", "shortcut.conv.weight",
                   "shortcut.weight"):
            if trunk_prefix + b + sc in sd:
                p["sc_w"] = _conv_hwio(g(b + sc))
                p["sc_b"] = g(b + sc.replace("weight", "bias"))
                break
        return p

    L = spec.vit_depth

    def stack(fmt, transpose=False):
        per = [g(fmt.format(i)) for i in range(L)]
        if transpose:
            per = [w.T for w in per]
        return np.stack(per)

    ln = lambda fmt: {"scale": stack(fmt + ".weight"),  # noqa: E731
                      "bias": stack(fmt + ".bias")}

    return {
        "stem": {"conv1_w": _conv_hwio(g(be + "stem.conv1.weight")),
                 "conv1_b": g(be + "stem.conv1.bias"),
                 "ln": {"scale": g(be + "stem.norm1.weight"),
                        "bias": g(be + "stem.norm1.bias")},
                 "conv2_w": _conv_hwio(g(be + "stem.conv2.weight")),
                 "conv2_b": g(be + "stem.conv2.bias")},
        "stages": [[mb(si, bi) for bi in range(spec.depths[si])]
                   for si in range(2)],
        "embed": {"ln": {"scale": g(be + "pool.norm.weight"),
                         "bias": g(be + "pool.norm.bias")},
                  "conv_w": _conv_hwio(g(be + "pool.proj.weight")),
                  "conv_b": g(be + "pool.proj.bias")},
        "blocks": {
            "ln_1": ln("blocks.{}.norm1"),
            "attn": {"qkv_w": stack("blocks.{}.attn.qkv.weight", True),
                     "qkv_b": stack("blocks.{}.attn.qkv.bias"),
                     "out_w": stack("blocks.{}.attn.proj.weight", True),
                     "out_b": stack("blocks.{}.attn.proj.bias")},
            "ln_2": ln("blocks.{}.norm2"),
            "mlp": {"ln": ln("blocks.{}.mlp.norm"),
                    "w0_w": stack("blocks.{}.mlp.w0.weight", True),
                    "w0_b": stack("blocks.{}.mlp.w0.bias"),
                    "w1_w": stack("blocks.{}.mlp.w1.weight", True),
                    "w1_b": stack("blocks.{}.mlp.w1.bias"),
                    "w2_w": stack("blocks.{}.mlp.w2.weight", True),
                    "w2_b": stack("blocks.{}.mlp.w2.bias")},
        },
        "fc_norm": {"scale": g("fc_norm.weight"),
                    "bias": g("fc_norm.bias")},
        "proj": _np(sd[head_prefix + "proj.weight"]).T,
    }


from leaf_tpu.models.trunks import register_trunk  # noqa: E402

register_trunk(ViTaminVisionSpec, init_vitamin, encode_image_vitamin,
               timm_vitamin_to_params, match_vitamin)
