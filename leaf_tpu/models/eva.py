"""EVA vision towers (EVA01 giant, EVA02 B/L, EVA02 enormous).

Native JAX implementation of the trunks the reference reaches through
`timm.create_model` for the EVA model configs
(`src/open_clip/model_configs/EVA01-g-14*.json`, `EVA02-*.json` — all
`"timm_model_name": "eva*"`, `timm_pool='token'`, `timm_proj=null`,
i.e. the trunk classifier head is the CLIP projection,
`timm_model.py:62-73`).

Architecture (timm `eva.py` Eva / EVA-CLIP `eva_vit_model.py`):

  * EVA01 giant — a plain pre-LN ViT at width 1408 / depth 40 /
    MLP 6144, fused qkv whose k-bias is pinned to zero (adding a
    constant bias to every key shifts all logits of a query equally —
    softmax-invariant — so the fused path folds q/v biases into a
    standard qkv bias with zero k slice).
  * EVA02 B/L — the "TrV" block: separate q/k/v projections (k
    bias-less), 2-D axial rotary position embedding on q/k (class
    token excluded), sub-LN (LayerNorm on the attention output before
    the out-projection, and inside the FFN), SwiGLU FFN
    (silu(gate) * x, hidden = width * 8/3).
  * EVA02 enormous — post-norm blocks (residual + LN(attn(x))),
    plain GELU MLP at ratio 15360/1792, no rope / SwiGLU
    (EVA-CLIP's bigE config: postnorm=true).

Oracle: timm itself is not installed, so tests/test_trunk_oracles.py
carries an independent hand-written torch forward of the published
timm `eva.py` architecture (all three variants: fused-qkv EVA01,
rope+SwiGLU+sub-LN EVA02, post-norm enormous) that consumes the same
timm-layout state dict — the two implementations must agree
numerically.  Shapes/ingestion are additionally pinned by
tests/test_eva.py.

All towers run as a single `lax.scan` over stacked block params with
fp32 LayerNorm/softmax, like every other leaf_tpu tower.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class EvaVisionSpec:
    """Hashable spec (rides on CLIPConfig as a static jit argument)."""
    name: str
    image_size: int = 224
    patch_size: int = 14
    width: int = 1408
    layers: int = 40
    heads: int = 16
    mlp_hidden: int = 6144          # absolute FFN width (timm int())
    output_dim: int = 1024
    swiglu: bool = False            # SwiGLU FFN (timm swiglu_mlp)
    rope: bool = False              # 2-D axial rope on q/k (timm use_rot_pos_emb)
    inner_attn_ln: bool = False     # LN on attn output pre-proj (scale_attn_inner)
    mlp_ln: bool = False            # LN inside the FFN (timm scale_mlp)
    post_norm: bool = False         # x + norm(f(x)) blocks (timm use_post_norm)
    fused_qkv: bool = True          # one qkv matmul (EVA01) vs split q/k/v
    ref_feat_size: int = 16         # rope position rescale target
                                    # (timm ref_feat_shape — pretrain grid)
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


# timm_model_name → spec, exactly the trunks the reference's EVA
# configs name.
EVA_TRUNKS = {
    "eva_giant_patch14_224": dict(
        patch_size=14, width=1408, layers=40, heads=16, mlp_hidden=6144),
    "eva02_base_patch16_clip_224": dict(
        patch_size=16, width=768, layers=12, heads=12,
        mlp_hidden=int(768 * 4 * 2 / 3), swiglu=True, rope=True,
        inner_attn_ln=True, mlp_ln=True, fused_qkv=False),
    "eva02_large_patch14_clip_224": dict(
        patch_size=14, width=1024, layers=24, heads=16,
        mlp_hidden=int(1024 * 4 * 2 / 3), swiglu=True, rope=True,
        inner_attn_ln=True, mlp_ln=True, fused_qkv=False),
    "eva02_large_patch14_clip_336": dict(
        image_size=336, patch_size=14, width=1024, layers=24, heads=16,
        mlp_hidden=int(1024 * 4 * 2 / 3), swiglu=True, rope=True,
        inner_attn_ln=True, mlp_ln=True, fused_qkv=False),
    "eva02_enormous_patch14_clip_224": dict(
        patch_size=14, width=1792, layers=64, heads=16,
        mlp_hidden=15360, post_norm=True),
}


def match_eva(name: str, embed_dim: int, image_size: Optional[int] = None,
              pool: str = "token", proj=None) -> Optional[EvaVisionSpec]:
    """trunks-registry matcher: open_clip timm_model_name → spec."""
    if name not in EVA_TRUNKS:
        if name.startswith("eva"):
            raise ValueError(
                f"unsupported EVA trunk {name!r}; implemented: "
                f"{sorted(EVA_TRUNKS)}")
        return None
    kw = dict(EVA_TRUNKS[name])
    if image_size:
        kw["image_size"] = image_size
    return EvaVisionSpec(name=name, output_dim=embed_dim, **kw)


# ---------------------------------------------------------------------------
# Rotary position embedding (timm RotaryEmbeddingCat, in_pixels=False)
# ---------------------------------------------------------------------------

def rope_sin_cos(spec: EvaVisionSpec) -> Optional[np.ndarray]:
    """(2, grid², head_dim) float32 sin/cos table.

    timm semantics: per axis, positions t = arange(g) / g * ref (the
    ref_feat_shape rescale that keeps fine-tuned resolutions aligned
    with the pretrain grid); num_bands = head_dim // 4 frequencies
    `1 / 10000^(i / num_bands)`; axis tables are concatenated then each
    frequency repeated for its (even, odd) rotation pair."""
    if not spec.rope:
        return None
    g, hd = spec.grid_size, spec.head_dim
    num_bands = hd // 4
    bands = 1.0 / (10000.0 ** (np.arange(num_bands, dtype=np.float64)
                               / num_bands))
    t = np.arange(g, dtype=np.float64) / g * spec.ref_feat_size
    ax = np.outer(t, bands)                       # [g, hd//4]
    # 2-D grid: row (h) axis frequencies then column (w) axis
    h = np.repeat(ax, g, axis=0)                  # [g*g, hd//4] rows
    w = np.tile(ax, (g, 1))                       # [g*g, hd//4] cols
    freqs = np.concatenate([h, w], axis=-1)       # [g*g, hd//2]
    freqs = np.repeat(freqs, 2, axis=-1)          # pair-interleaved [g*g, hd]
    return np.stack([np.sin(freqs), np.cos(freqs)]).astype(np.float32)


def _rot_pairs(t: jnp.ndarray) -> jnp.ndarray:
    """(x0, x1, x2, x3, ...) → (-x1, x0, -x3, x2, ...)."""
    t2 = t.reshape(*t.shape[:-1], t.shape[-1] // 2, 2)
    return jnp.stack([-t2[..., 1], t2[..., 0]], axis=-1).reshape(t.shape)


def _apply_rope(t: jnp.ndarray, sin: jnp.ndarray,
                cos: jnp.ndarray) -> jnp.ndarray:
    """t: [B, H, N, hd] patch-token q/k; sin/cos: [N, hd]."""
    return t * cos.astype(t.dtype) + _rot_pairs(t) * sin.astype(t.dtype)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _attention(p: Params, x: jnp.ndarray, spec: EvaVisionSpec,
               sincos: Optional[jnp.ndarray]) -> jnp.ndarray:
    B, S, D = x.shape
    H, hd = spec.heads, spec.head_dim
    dt = x.dtype
    if spec.fused_qkv:
        qkv = x @ p["qkv_w"].astype(dt) + p["qkv_b"].astype(dt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q = x @ p["q_w"].astype(dt) + p["q_b"].astype(dt)
        k = x @ p["k_w"].astype(dt)            # k projection is bias-less
        v = x @ p["v_w"].astype(dt) + p["v_b"].astype(dt)

    def heads(t):
        return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if sincos is not None:
        sin, cos = sincos[0], sincos[1]
        # class token (index 0) is not rotated (timm eva.py forward)
        q = jnp.concatenate(
            [q[:, :, :1], _apply_rope(q[:, :, 1:], sin, cos)], axis=2)
        k = jnp.concatenate(
            [k[:, :, :1], _apply_rope(k[:, :, 1:], sin, cos)], axis=2)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    if spec.inner_attn_ln:
        out = layers.layer_norm(p["ln_inner"], out, spec.ln_eps)
    return out @ p["out_w"].astype(dt) + p["out_b"].astype(dt)


def _mlp(p: Params, x: jnp.ndarray, spec: EvaVisionSpec) -> jnp.ndarray:
    dt = x.dtype
    if spec.swiglu:
        g = x @ p["gate_w"].astype(dt) + p["gate_b"].astype(dt)
        u = x @ p["x_w"].astype(dt) + p["x_b"].astype(dt)
        h = jax.nn.silu(g) * u
        if spec.mlp_ln:
            h = layers.layer_norm(p["ln"], h, spec.ln_eps)
        return h @ p["proj_w"].astype(dt) + p["proj_b"].astype(dt)
    h = x @ p["fc_w"].astype(dt) + p["fc_b"].astype(dt)
    h = layers.gelu(h)
    if spec.mlp_ln:
        h = layers.layer_norm(p["ln"], h, spec.ln_eps)
    return h @ p["proj_w"].astype(dt) + p["proj_b"].astype(dt)


def _block(p: Params, x: jnp.ndarray, spec: EvaVisionSpec,
           sincos) -> jnp.ndarray:
    if spec.post_norm:
        x = x + layers.layer_norm(
            p["ln_1"], _attention(p["attn"], x, spec, sincos), spec.ln_eps)
        x = x + layers.layer_norm(
            p["ln_2"], _mlp(p["mlp"], x, spec), spec.ln_eps)
        return x
    x = x + _attention(p["attn"],
                       layers.layer_norm(p["ln_1"], x, spec.ln_eps),
                       spec, sincos)
    x = x + _mlp(p["mlp"], layers.layer_norm(p["ln_2"], x, spec.ln_eps),
                 spec)
    return x


def encode_image_eva(params: Params, spec: EvaVisionSpec,
                     images: jnp.ndarray, normalize: bool = False,
                     dtype=jnp.float32, remat: bool = False,
                     **_ignored) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    from leaf_tpu.models.clip import l2_normalize, patchify
    x = patchify(images.astype(dtype), spec.patch_size)
    x = x @ params["patch_embedding"].astype(dtype) \
        + params["patch_bias"].astype(dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                           (x.shape[0], 1, spec.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)
    sincos = None
    if spec.rope:
        sincos = jnp.asarray(rope_sin_cos(spec))

    block = functools.partial(_block, spec=spec, sincos=sincos)
    if remat:
        block = jax.checkpoint(block)

    def body(h, layer_p):
        return block(layer_p, h), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layers.layer_norm(params["ln_post"], x, spec.ln_eps)
    pooled = x[:, 0]                         # timm_pool='token'
    pooled = pooled @ params["proj"].astype(dtype) \
        + params["proj_bias"].astype(dtype)  # trunk head as projection
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Init / checkpoint ingestion
# ---------------------------------------------------------------------------

def init_eva(key, spec: EvaVisionSpec) -> Params:
    """Random init (trunc-normal-scale 0.02 like timm's default; EVA
    configs ship pretrained, so init precision only seeds tests)."""
    L, D, Hn = spec.layers, spec.width, spec.mlp_hidden
    k = jax.random.split(key, 12)
    nrm = lambda kk, *s: 0.02 * jax.random.normal(kk, s, jnp.float32)
    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    ln = lambda: {"scale": jnp.ones((L, D), jnp.float32),
                  "bias": zeros(L, D)}
    if spec.fused_qkv:
        attn = {"qkv_w": nrm(k[0], L, D, 3 * D), "qkv_b": zeros(L, 3 * D),
                "out_w": nrm(k[1], L, D, D), "out_b": zeros(L, D)}
    else:
        attn = {"q_w": nrm(k[0], L, D, D), "q_b": zeros(L, D),
                "k_w": nrm(k[2], L, D, D),
                "v_w": nrm(k[3], L, D, D), "v_b": zeros(L, D),
                "out_w": nrm(k[1], L, D, D), "out_b": zeros(L, D)}
    if spec.inner_attn_ln:
        attn["ln_inner"] = ln()
    if spec.swiglu:
        mlp = {"gate_w": nrm(k[4], L, D, Hn), "gate_b": zeros(L, Hn),
               "x_w": nrm(k[5], L, D, Hn), "x_b": zeros(L, Hn),
               "proj_w": nrm(k[6], L, Hn, D), "proj_b": zeros(L, D)}
    else:
        mlp = {"fc_w": nrm(k[4], L, D, Hn), "fc_b": zeros(L, Hn),
               "proj_w": nrm(k[6], L, Hn, D), "proj_b": zeros(L, D)}
    if spec.mlp_ln:
        mlp["ln"] = {"scale": jnp.ones((L, Hn), jnp.float32),
                     "bias": zeros(L, Hn)}
    n_tok = spec.grid_size ** 2 + 1
    return {
        "patch_embedding": nrm(k[7], spec.patch_size ** 2 * 3, D),
        "patch_bias": zeros(D),
        "class_embedding": nrm(k[8], D),
        "positional_embedding": nrm(k[9], n_tok, D),
        "blocks": {"ln_1": ln(), "attn": attn, "ln_2": ln(), "mlp": mlp},
        "ln_post": {"scale": jnp.ones((D,), jnp.float32), "bias": zeros(D)},
        "proj": nrm(k[10], D, spec.output_dim),
        "proj_bias": zeros(spec.output_dim),
    }


def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def timm_eva_to_params(sd: Mapping[str, Any], spec: EvaVisionSpec,
                       trunk_prefix: str = "visual.trunk.",
                       head_prefix: str = "visual.head.") -> Params:
    """timm Eva state dict → native pytree.

    Key layout (timm eva.py): `patch_embed.proj`, `cls_token`,
    `pos_embed`, `blocks.N.{norm1,attn,norm2,mlp}`, `norm`, `head`.
    Fused attention stores `attn.qkv.weight` + separate `attn.q_bias` /
    `attn.v_bias` buffers (k bias pinned zero); split attention uses
    `attn.{q,k,v}_proj`; SwiGLU uses `mlp.fc1_g/fc1_x/norm/fc2`; the
    inner attention LN is `attn.norm`."""
    g = lambda kk: _np(sd[trunk_prefix + kk])  # noqa: E731
    conv = g("patch_embed.proj.weight")
    p = conv.shape[-1]
    L = spec.layers

    def stack(fmt, transpose=False):
        per = [g(fmt.format(i)) for i in range(L)]
        if transpose:
            per = [w.T for w in per]
        return np.stack(per)

    ln = lambda fmt: {"scale": stack(fmt + ".weight"),  # noqa: E731
                      "bias": stack(fmt + ".bias")}

    if spec.fused_qkv:
        qkv_b = np.stack([
            np.concatenate([g(f"blocks.{i}.attn.q_bias"),
                            np.zeros(spec.width, np.float32),
                            g(f"blocks.{i}.attn.v_bias")])
            for i in range(L)])
        attn = {"qkv_w": stack("blocks.{}.attn.qkv.weight", True),
                "qkv_b": qkv_b,
                "out_w": stack("blocks.{}.attn.proj.weight", True),
                "out_b": stack("blocks.{}.attn.proj.bias")}
    else:
        attn = {"q_w": stack("blocks.{}.attn.q_proj.weight", True),
                "q_b": stack("blocks.{}.attn.q_proj.bias"),
                "k_w": stack("blocks.{}.attn.k_proj.weight", True),
                "v_w": stack("blocks.{}.attn.v_proj.weight", True),
                "v_b": stack("blocks.{}.attn.v_proj.bias"),
                "out_w": stack("blocks.{}.attn.proj.weight", True),
                "out_b": stack("blocks.{}.attn.proj.bias")}
    if spec.inner_attn_ln:
        attn["ln_inner"] = ln("blocks.{}.attn.norm")
    if spec.swiglu:
        mlp = {"gate_w": stack("blocks.{}.mlp.fc1_g.weight", True),
               "gate_b": stack("blocks.{}.mlp.fc1_g.bias"),
               "x_w": stack("blocks.{}.mlp.fc1_x.weight", True),
               "x_b": stack("blocks.{}.mlp.fc1_x.bias"),
               "proj_w": stack("blocks.{}.mlp.fc2.weight", True),
               "proj_b": stack("blocks.{}.mlp.fc2.bias")}
    else:
        mlp = {"fc_w": stack("blocks.{}.mlp.fc1.weight", True),
               "fc_b": stack("blocks.{}.mlp.fc1.bias"),
               "proj_w": stack("blocks.{}.mlp.fc2.weight", True),
               "proj_b": stack("blocks.{}.mlp.fc2.bias")}
    if spec.mlp_ln:
        mlp["ln"] = ln("blocks.{}.mlp.norm")

    return {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, -1),
        "patch_bias": g("patch_embed.proj.bias"),
        "class_embedding": g("cls_token").reshape(-1),
        "positional_embedding": g("pos_embed").reshape(-1, spec.width),
        "blocks": {"ln_1": ln("blocks.{}.norm1"), "attn": attn,
                   "ln_2": ln("blocks.{}.norm2"), "mlp": mlp},
        "ln_post": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "proj": g("head.weight").T,
        "proj_bias": g("head.bias"),
    }


from leaf_tpu.models.trunks import register_trunk  # noqa: E402

register_trunk(EvaVisionSpec, init_eva, encode_image_eva,
               timm_eva_to_params, match_eva)
