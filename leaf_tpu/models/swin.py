"""Swin Transformer trunk (timm `swin_base_patch4_window7_224`).

Native JAX implementation of the trunk behind the reference config
`src/open_clip/model_configs/swin_base_patch4_window7_224.json`
(`timm_model_name: swin_base_patch4_window7_224`, `timm_pool: ''` →
trunk-default avg pooling, `timm_proj: linear`, embed_dim 640).

Architecture (timm `swin_transformer.py` / the published Swin paper):

  * 4×4 conv patchify + LayerNorm;
  * 4 stages (depths 2/2/18/2 for Swin-B), channel dims doubling via
    PatchMerging (concat 2×2 neighbours [x00, x10, x01, x11] → LN →
    bias-less Linear 4C→2C) applied at stage ENTRY for stages 1-3
    (timm's rewritten SwinTransformerStage; ingestion also accepts the
    original end-of-stage key layout and shifts it);
  * blocks alternate plain / shifted (shift = window//2) 7×7 window
    attention with a learned relative-position bias table
    [(2w-1)², heads] and the standard cross-window shift mask;
  * final LayerNorm then global average pool; the open_clip linear
    projection head maps 8·embed → 640.

TPU notes: window partition is pure reshape/transpose (static shapes);
each stage runs one `lax.scan` over stacked block params with the
shift amount/mask selected per block by traced flag — no Python-level
branching per block.  LayerNorm/softmax in fp32.

Oracle: timm itself is not installed, so tests/test_trunk_oracles.py
carries an independent torch forward written from the published Swin
paper/code (original-formulation PatchMerging slices, explicit window
partition, img_mask construction) consuming the same timm-layout
state dict; shapes/ingestion additionally pinned by
tests/test_relpos_swin.py.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers

Params = Dict[str, Any]

_NEG = -1e9  # finite mask fill: safe under `where`/multiply (no nan·0)


@dataclasses.dataclass(frozen=True)
class SwinVisionSpec:
    """Hashable spec (rides on CLIPConfig as a static jit argument)."""
    name: str
    image_size: int = 224
    patch_size: int = 4
    embed_dim: int = 128
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    heads: Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 7
    mlp_ratio: float = 4.0
    output_dim: int = 640
    proj_bias: bool = False
    ln_eps: float = 1e-5

    def stage_dim(self, s: int) -> int:
        return self.embed_dim * (2 ** s)

    def stage_grid(self, s: int) -> int:
        return self.image_size // self.patch_size // (2 ** s)

    def stage_window(self, s: int) -> int:
        # windows never exceed the feature grid (timm clamps and zeroes
        # the shift when grid <= window)
        return min(self.window, self.stage_grid(s))


SWIN_TRUNKS = {
    "swin_base_patch4_window7_224": dict(
        patch_size=4, embed_dim=128, depths=(2, 2, 18, 2),
        heads=(4, 8, 16, 32), window=7),
}


def match_swin(name: str, embed_dim: int, image_size: Optional[int] = None,
               pool: str = "", proj: str = "linear"
               ) -> Optional[SwinVisionSpec]:
    if name not in SWIN_TRUNKS:
        if name.startswith("swin"):
            raise ValueError(
                f"unsupported swin trunk {name!r}; implemented: "
                f"{sorted(SWIN_TRUNKS)}")
        return None
    kw = dict(SWIN_TRUNKS[name])
    if image_size:
        kw["image_size"] = image_size
    return SwinVisionSpec(name=name, output_dim=embed_dim, **kw)


# ---------------------------------------------------------------------------
# Window machinery
# ---------------------------------------------------------------------------

def rel_pos_index(w: int) -> np.ndarray:
    """[w², w²] int32: token pair → row of the (2w-1)² bias table."""
    ys, xs = np.meshgrid(np.arange(w), np.arange(w), indexing="ij")
    pos = np.stack([ys.reshape(-1), xs.reshape(-1)], axis=-1)
    d = pos[:, None, :] - pos[None, :, :] + (w - 1)
    return (d[..., 0] * (2 * w - 1) + d[..., 1]).astype(np.int32)


def shift_attn_mask(grid: int, window: int, shift: int) -> np.ndarray:
    """[nW, w², w²] additive mask for shifted-window attention: tokens
    from different pre-shift regions must not attend to each other
    (the published Swin `img_mask` construction)."""
    img = np.zeros((grid, grid), np.int32)
    cnt = 0
    bounds = (slice(0, -window), slice(-window, -shift), slice(-shift, None))
    for hs in bounds:
        for ws in bounds:
            img[hs, ws] = cnt
            cnt += 1
    win = _partition_np(img, window)               # [nW, w²]
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff == 0, 0.0, _NEG).astype(np.float32)


def _partition_np(img: np.ndarray, w: int) -> np.ndarray:
    g = img.shape[0]
    return (img.reshape(g // w, w, g // w, w)
            .transpose(0, 2, 1, 3).reshape(-1, w * w))


def _window_partition(x: jnp.ndarray, w: int) -> jnp.ndarray:
    """[B, H, W, C] → [B·nW, w², C]."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // w, w, W // w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)


def _window_reverse(x: jnp.ndarray, w: int, B: int, H: int,
                    W: int) -> jnp.ndarray:
    C = x.shape[-1]
    x = x.reshape(B, H // w, W // w, w, w, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _window_attention(p: Params, x: jnp.ndarray, n_heads: int, w: int,
                      index: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """x: [Bw, w², C] windows; mask: [nW, w², w²] additive (zeros when
    unshifted)."""
    Bw, N, C = x.shape
    hd = C // n_heads
    dt = x.dtype
    qkv = x @ p["qkv_w"].astype(dt) + p["qkv_b"].astype(dt)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(Bw, N, n_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    bias = p["bias_table"].astype(jnp.float32)[index]       # [w², w², H]
    logits = logits + bias.transpose(2, 0, 1)[None]
    nW = mask.shape[0]
    logits = (logits.reshape(Bw // nW, nW, n_heads, N, N)
              + mask[None, :, None])
    probs = jax.nn.softmax(logits, axis=-1).astype(dt)
    probs = probs.reshape(Bw, n_heads, N, N)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(Bw, N, C)
    return out @ p["out_w"].astype(dt) + p["out_b"].astype(dt)


def _patch_merge(p: Params, x: jnp.ndarray, ln_eps: float) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/2, W/2, 2C]; concat order [x00, x10, x01,
    x11] (row offset fastest) then LN then bias-less reduction."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 4, 2, 5).reshape(B, H // 2, W // 2, 4 * C)
    x = layers.layer_norm(p["norm"], x, ln_eps)
    return x @ p["reduction"].astype(x.dtype)


def _stage(p: Params, x: jnp.ndarray, spec: SwinVisionSpec,
           s: int) -> jnp.ndarray:
    """One stage: optional entry patch-merge, then scan over blocks."""
    if "downsample" in p:
        x = _patch_merge(p["downsample"], x, spec.ln_eps)
    B, H, W, C = x.shape
    w = spec.stage_window(s)
    shift = 0 if w >= spec.stage_grid(s) else w // 2
    n_heads = spec.heads[s]
    index = jnp.asarray(rel_pos_index(w))
    smask = (jnp.asarray(shift_attn_mask(H, w, shift)) if shift
             else jnp.zeros(((H // w) * (W // w), w * w, w * w), jnp.float32))

    def body(h, xs):
        bp, is_shifted = xs
        sh = jnp.where(is_shifted, shift, 0)
        mask = jnp.where(is_shifted, smask, 0.0)
        y = layers.layer_norm(bp["ln_1"], h, spec.ln_eps)
        y = jnp.roll(y, (-sh, -sh), axis=(1, 2))
        y = _window_partition(y, w)
        y = _window_attention(bp["attn"], y, n_heads, w, index, mask)
        y = _window_reverse(y, w, B, H, W)
        y = jnp.roll(y, (sh, sh), axis=(1, 2))
        h = h + y
        h = h + layers.mlp(bp["mlp"],
                           layers.layer_norm(bp["ln_2"], h, spec.ln_eps),
                           layers.gelu)
        return h, None

    flags = jnp.asarray([(i % 2 == 1) and shift > 0
                         for i in range(spec.depths[s])])
    x, _ = jax.lax.scan(body, x, (p["blocks"], flags))
    return x


def encode_image_swin(params: Params, spec: SwinVisionSpec,
                      images: jnp.ndarray, normalize: bool = False,
                      dtype=jnp.float32, remat: bool = False,
                      **_ignored) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    from leaf_tpu.models.clip import l2_normalize, patchify
    B = images.shape[0]
    g0 = spec.image_size // spec.patch_size
    x = patchify(images.astype(dtype), spec.patch_size)
    x = x @ params["patch_embedding"].astype(dtype) \
        + params["patch_bias"].astype(dtype)
    x = layers.layer_norm(params["patch_norm"], x, spec.ln_eps)
    x = x.reshape(B, g0, g0, spec.embed_dim)
    for s in range(len(spec.depths)):
        stage_fn = _stage
        if remat:
            # spec (a frozen dataclass) and the stage index are both
            # static — omitting spec crashed checkpoint's abstraction
            stage_fn = jax.checkpoint(_stage, static_argnums=(2, 3))
        x = stage_fn(params["stages"][s], x, spec, s)
    x = layers.layer_norm(params["ln_post"], x, spec.ln_eps)
    pooled = x.mean(axis=(1, 2))                    # timm global avg pool
    pooled = pooled @ params["proj"].astype(dtype)
    if "proj_bias" in params:
        pooled = pooled + params["proj_bias"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Init / checkpoint ingestion
# ---------------------------------------------------------------------------

def init_swin(key, spec: SwinVisionSpec) -> Params:
    keys = jax.random.split(key, 4 + len(spec.depths))
    nrm = lambda kk, *s: 0.02 * jax.random.normal(kk, s, jnp.float32)
    zeros = lambda *s: jnp.zeros(s, jnp.float32)

    def stage(kk, s):
        L, C = spec.depths[s], spec.stage_dim(s)
        Hn = int(C * spec.mlp_ratio)
        w = spec.stage_window(s)
        k = jax.random.split(kk, 8)
        ln = lambda: {"scale": jnp.ones((L, C), jnp.float32),
                      "bias": zeros(L, C)}
        st = {"blocks": {
            "ln_1": ln(),
            "attn": {"qkv_w": nrm(k[0], L, C, 3 * C),
                     "qkv_b": zeros(L, 3 * C),
                     "out_w": nrm(k[1], L, C, C), "out_b": zeros(L, C),
                     "bias_table": nrm(k[2], L, (2 * w - 1) ** 2,
                                       spec.heads[s])},
            "ln_2": ln(),
            "mlp": {"fc_w": nrm(k[3], L, C, Hn), "fc_b": zeros(L, Hn),
                    "proj_w": nrm(k[4], L, Hn, C), "proj_b": zeros(L, C)},
        }}
        if s > 0:
            Cin = spec.stage_dim(s - 1)
            st["downsample"] = {
                "norm": {"scale": jnp.ones((4 * Cin,), jnp.float32),
                         "bias": zeros(4 * Cin)},
                "reduction": nrm(k[5], 4 * Cin, 2 * Cin)}
        return st

    D = spec.embed_dim
    p = {
        "patch_embedding": nrm(keys[0], spec.patch_size ** 2 * 3, D),
        "patch_bias": zeros(D),
        "patch_norm": {"scale": jnp.ones((D,), jnp.float32),
                       "bias": zeros(D)},
        "stages": [stage(keys[2 + s], s) for s in range(len(spec.depths))],
        "ln_post": {"scale": jnp.ones((spec.stage_dim(len(spec.depths) - 1),),
                                      jnp.float32),
                    "bias": zeros(spec.stage_dim(len(spec.depths) - 1))},
        "proj": nrm(keys[1], spec.stage_dim(len(spec.depths) - 1),
                    spec.output_dim),
    }
    if spec.proj_bias:
        p["proj_bias"] = zeros(spec.output_dim)
    return p


def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def timm_swin_to_params(sd: Mapping[str, Any], spec: SwinVisionSpec,
                        trunk_prefix: str = "visual.trunk.",
                        head_prefix: str = "visual.head.") -> Params:
    """timm SwinTransformer state dict → native pytree.

    Accepts both key layouts: the rewritten timm stage (downsample at
    `layers.{s}.downsample`, applied at stage entry, s>=1) and the
    original end-of-stage layout (`layers.{s}.downsample` after stage
    s's blocks, s<=2) — the graphs are identical, only the index the
    merge is filed under differs, so old keys shift to s+1."""
    g = lambda kk: _np(sd[trunk_prefix + kk])  # noqa: E731
    has = lambda kk: (trunk_prefix + kk) in sd  # noqa: E731
    old_layout = has("layers.0.downsample.reduction.weight")

    def stage(s):
        L = spec.depths[s]
        pre = f"layers.{s}."

        def stack(fmt, transpose=False):
            per = [g(pre + fmt.format(i)) for i in range(L)]
            if transpose:
                per = [w.T for w in per]
            return np.stack(per)

        ln = lambda fmt: {"scale": stack(fmt + ".weight"),  # noqa: E731
                          "bias": stack(fmt + ".bias")}
        st = {"blocks": {
            "ln_1": ln("blocks.{}.norm1"),
            "attn": {
                "qkv_w": stack("blocks.{}.attn.qkv.weight", True),
                "qkv_b": stack("blocks.{}.attn.qkv.bias"),
                "out_w": stack("blocks.{}.attn.proj.weight", True),
                "out_b": stack("blocks.{}.attn.proj.bias"),
                "bias_table": stack(
                    "blocks.{}.attn.relative_position_bias_table")},
            "ln_2": ln("blocks.{}.norm2"),
            "mlp": {"fc_w": stack("blocks.{}.mlp.fc1.weight", True),
                    "fc_b": stack("blocks.{}.mlp.fc1.bias"),
                    "proj_w": stack("blocks.{}.mlp.fc2.weight", True),
                    "proj_b": stack("blocks.{}.mlp.fc2.bias")}}}
        if s > 0:
            ds = f"layers.{s - 1}." if old_layout else f"layers.{s}."
            st["downsample"] = {
                "norm": {"scale": g(ds + "downsample.norm.weight"),
                         "bias": g(ds + "downsample.norm.bias")},
                "reduction": g(ds + "downsample.reduction.weight").T}
        return st

    conv = g("patch_embed.proj.weight")
    ps = conv.shape[-1]
    out = {
        "patch_embedding": conv.transpose(2, 3, 1, 0).reshape(ps * ps * 3, -1),
        "patch_bias": g("patch_embed.proj.bias"),
        "patch_norm": {"scale": g("patch_embed.norm.weight"),
                       "bias": g("patch_embed.norm.bias")},
        "stages": [stage(s) for s in range(len(spec.depths))],
        "ln_post": {"scale": g("norm.weight"), "bias": g("norm.bias")},
        "proj": _np(sd[head_prefix + "proj.weight"]).T,
    }
    if head_prefix + "proj.bias" in sd:
        out["proj_bias"] = _np(sd[head_prefix + "proj.bias"])
    return out


from leaf_tpu.models.trunks import register_trunk  # noqa: E402

register_trunk(SwinVisionSpec, init_swin, encode_image_swin,
               timm_swin_to_params, match_swin)
