"""Relative-position ViT trunk (timm `vit_relpos_medium_patch16_cls_224`).

Native JAX implementation of the trunk behind the reference config
`src/open_clip/model_configs/vit_relpos_medium_patch16_cls_224.json`
(`timm_model_name: vit_relpos_medium_patch16_cls_224`, `timm_pool: ''`
→ trunk-default token pooling, `timm_proj: linear`).

Architecture (timm `vision_transformer_relpos.py`,
VisionTransformerRelPos):

  * standard conv patchify, NO absolute position embedding;
  * a class token (the `_cls` variants: class_token=True,
    global_pool='token', fc_norm=False);
  * every attention layer owns a RelPosMlp (mode 'cr'): a 2→hidden→heads
    ReLU MLP over signed-log relative coordinates
    `sign(Δ) * log1p(|Δ|)`, gathered into a [heads, N, N] additive
    bias via the usual (2g-1)² relative-index table, zero-padded over
    the class-token row/column (prefix_tokens=1);
  * qkv has NO bias for the medium_cls variant (qkv_bias=False);
  * pre-LN blocks, final LayerNorm, token pooling, then the open_clip
    linear projection head (`timm_model.py` head_layers['proj']).

Oracle: timm itself is not installed, so tests/test_trunk_oracles.py
carries an independent torch forward written from the published timm
source (meshgrid-based signed-log coord table, RelPosMlp gather +
class-token pad) consuming the same timm-layout state dict;
shapes/ingestion additionally pinned by tests/test_relpos_swin.py.
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
class RelPosViTSpec:
    """Hashable spec (rides on CLIPConfig as a static jit argument)."""
    name: str
    image_size: int = 224
    patch_size: int = 16
    width: int = 512
    layers: int = 12
    heads: int = 8
    mlp_ratio: float = 4.0
    rel_pos_dim: int = 256          # RelPosMlp hidden width
    qkv_bias: bool = False
    output_dim: int = 512
    proj_bias: bool = False         # open_clip head proj bias
    ln_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.width // self.heads

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def mlp_hidden(self) -> int:
        return int(self.width * self.mlp_ratio)


RELPOS_TRUNKS = {
    "vit_relpos_medium_patch16_cls_224": dict(
        patch_size=16, width=512, layers=12, heads=8, rel_pos_dim=256,
        qkv_bias=False),
}


def match_relpos(name: str, embed_dim: int, image_size: Optional[int] = None,
                 pool: str = "", proj: str = "linear"
                 ) -> Optional[RelPosViTSpec]:
    if name not in RELPOS_TRUNKS:
        if name.startswith("vit_relpos"):
            raise ValueError(
                f"unsupported relpos-ViT trunk {name!r}; implemented: "
                f"{sorted(RELPOS_TRUNKS)}")
        return None
    kw = dict(RELPOS_TRUNKS[name])
    if image_size:
        kw["image_size"] = image_size
    return RelPosViTSpec(name=name, output_dim=embed_dim, **kw)


# ---------------------------------------------------------------------------
# Relative-position machinery (timm gen_relative_log_coords mode='cr' +
# gen_relative_position_index + RelPosMlp.get_bias)
# ---------------------------------------------------------------------------

def rel_log_coords(g: int) -> np.ndarray:
    """[(2g-1)², 2] signed-log relative (Δy, Δx) table."""
    r = np.arange(-(g - 1), g, dtype=np.float32)
    dy, dx = np.meshgrid(r, r, indexing="ij")
    coords = np.stack([dy, dx], axis=-1).reshape(-1, 2)
    return np.sign(coords) * np.log1p(np.abs(coords))


# shared with the swin tower (same relative-position table indexing)
from leaf_tpu.models.swin import rel_pos_index  # noqa: E402,F401


def _rel_pos_bias(p: Params, coords: jnp.ndarray, index: jnp.ndarray,
                  heads: int, dtype) -> jnp.ndarray:
    """RelPosMlp('cr') bias: mlp over the coord table, gathered to
    [heads, N+1, N+1] with a zero class-token row/column."""
    h = jax.nn.relu(coords @ p["fc1_w"].astype(jnp.float32)
                    + p["fc1_b"].astype(jnp.float32))
    table = h @ p["fc2_w"].astype(jnp.float32) \
        + p["fc2_b"].astype(jnp.float32)            # [(2g-1)², heads]
    bias = table[index]                             # [N, N, heads]
    bias = bias.transpose(2, 0, 1)                  # [heads, N, N]
    return jnp.pad(bias, ((0, 0), (1, 0), (1, 0)))


def _attention(p: Params, x: jnp.ndarray, spec: RelPosViTSpec,
               coords: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    B, S, D = x.shape
    H, hd = spec.heads, spec.head_dim
    dt = x.dtype
    qkv = x @ p["qkv_w"].astype(dt)
    if spec.qkv_bias:
        qkv = qkv + p["qkv_b"].astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    logits = logits + _rel_pos_bias(p["rel_pos"], coords, index, H, dt)[None]
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return out @ p["out_w"].astype(dt) + p["out_b"].astype(dt)


def _block(p: Params, x: jnp.ndarray, spec: RelPosViTSpec,
           coords, index) -> jnp.ndarray:
    x = x + _attention(p["attn"],
                       layers.layer_norm(p["ln_1"], x, spec.ln_eps),
                       spec, coords, index)
    x = x + layers.mlp(p["mlp"],
                       layers.layer_norm(p["ln_2"], x, spec.ln_eps),
                       layers.gelu)
    return x


def encode_image_relpos(params: Params, spec: RelPosViTSpec,
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
    x = jnp.concatenate([cls, x], axis=1)   # no absolute pos embed
    g = spec.grid_size
    coords = jnp.asarray(rel_log_coords(g))
    index = jnp.asarray(rel_pos_index(g))

    block = functools.partial(_block, spec=spec, coords=coords, index=index)
    if remat:
        block = jax.checkpoint(block)

    def body(h, layer_p):
        return block(layer_p, h), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layers.layer_norm(params["ln_post"], x, spec.ln_eps)
    pooled = x[:, 0]                         # global_pool='token'
    pooled = pooled @ params["proj"].astype(dtype)
    if "proj_bias" in params:
        pooled = pooled + params["proj_bias"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Init / checkpoint ingestion
# ---------------------------------------------------------------------------

def init_relpos(key, spec: RelPosViTSpec) -> Params:
    L, D, Hn = spec.layers, spec.width, spec.mlp_hidden
    R = spec.rel_pos_dim
    k = jax.random.split(key, 10)
    nrm = lambda kk, *s: 0.02 * jax.random.normal(kk, s, jnp.float32)
    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    ln = lambda: {"scale": jnp.ones((L, D), jnp.float32),
                  "bias": zeros(L, D)}
    attn = {"qkv_w": nrm(k[0], L, D, 3 * D),
            "out_w": nrm(k[1], L, D, D), "out_b": zeros(L, D),
            "rel_pos": {"fc1_w": nrm(k[2], L, 2, R), "fc1_b": zeros(L, R),
                        "fc2_w": nrm(k[3], L, R, spec.heads),
                        "fc2_b": zeros(L, spec.heads)}}
    if spec.qkv_bias:
        attn["qkv_b"] = zeros(L, 3 * D)
    p = {
        "patch_embedding": nrm(k[4], spec.patch_size ** 2 * 3, D),
        "patch_bias": zeros(D),
        "class_embedding": nrm(k[5], D),
        "blocks": {"ln_1": ln(), "attn": attn, "ln_2": ln(),
                   "mlp": {"fc_w": nrm(k[6], L, D, Hn), "fc_b": zeros(L, Hn),
                           "proj_w": nrm(k[7], L, Hn, D),
                           "proj_b": zeros(L, D)}},
        "ln_post": {"scale": jnp.ones((D,), jnp.float32), "bias": zeros(D)},
        "proj": nrm(k[8], D, spec.output_dim),
    }
    if spec.proj_bias:
        p["proj_bias"] = zeros(spec.output_dim)
    return p


def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def timm_relpos_to_params(sd: Mapping[str, Any], spec: RelPosViTSpec,
                          trunk_prefix: str = "visual.trunk.",
                          head_prefix: str = "visual.head.") -> Params:
    """timm VisionTransformerRelPos state dict → native pytree.

    Key layout: `patch_embed.proj`, `cls_token`,
    `blocks.N.{norm1,attn.qkv,attn.rel_pos.mlp.fc1/fc2,attn.proj,
    norm2,mlp.fc1/fc2}`, `norm`; open_clip head `visual.head.proj`."""
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
    attn = {"qkv_w": stack("blocks.{}.attn.qkv.weight", True),
            "out_w": stack("blocks.{}.attn.proj.weight", True),
            "out_b": stack("blocks.{}.attn.proj.bias"),
            "rel_pos": {
                "fc1_w": stack("blocks.{}.attn.rel_pos.mlp.fc1.weight", True),
                "fc1_b": stack("blocks.{}.attn.rel_pos.mlp.fc1.bias"),
                "fc2_w": stack("blocks.{}.attn.rel_pos.mlp.fc2.weight", True),
                "fc2_b": stack("blocks.{}.attn.rel_pos.mlp.fc2.bias")}}
    if spec.qkv_bias:
        attn["qkv_b"] = stack("blocks.{}.attn.qkv.bias")

    out = {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(p * p * 3, -1),
        "patch_bias": g("patch_embed.proj.bias"),
        "class_embedding": g("cls_token").reshape(-1),
        "blocks": {"ln_1": ln("blocks.{}.norm1"), "attn": attn,
                   "ln_2": ln("blocks.{}.norm2"),
                   "mlp": {"fc_w": stack("blocks.{}.mlp.fc1.weight", True),
                           "fc_b": stack("blocks.{}.mlp.fc1.bias"),
                           "proj_w": stack("blocks.{}.mlp.fc2.weight", True),
                           "proj_b": stack("blocks.{}.mlp.fc2.bias")}},
        "ln_post": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "proj": _np(sd[head_prefix + "proj.weight"]).T,
    }
    if head_prefix + "proj.bias" in sd:
        out["proj_bias"] = _np(sd[head_prefix + "proj.bias"])
    return out


from leaf_tpu.models.trunks import register_trunk  # noqa: E402

register_trunk(RelPosViTSpec, init_relpos, encode_image_relpos,
               timm_relpos_to_params, match_relpos)
