"""MobileCLIP image trunks (timm `vit_base_mci_224`, `fastvit_mci1/2`).

Native JAX implementations of the trunks behind the reference configs
`src/open_clip/model_configs/MobileCLIP-{B,S1,S2}.json`
(`timm_model_name: vit_base_mci_224 / fastvit_mci1 / fastvit_mci2`,
`timm_proj: null` → the trunk classifier head IS the CLIP projection,
`timm_model.py:62-73`; Apple-format checkpoints are first remapped to
the timm layout by the reference's `convert.py:142-181`).

Two families:

  * **MCi-ViT** (MobileCLIP-B): a ViT-B/16 whose patchify is a 3-layer
    conv stem (timm `vision_transformer_hybrid.ConvStem`: channels
    (192, 192, 768), kernel=stride (4, 2, 2), pad 0, BN+GELU each)
    followed by the HybridEmbed 1×1 projection; `no_embed_class` (pos
    embed covers patch tokens only, cls prepended after), token pool,
    trunk head Linear 768→embed.  The transformer body reuses the
    standard leaf_tpu ViT block stack.
  * **FastViT** (MobileCLIP-S1/S2): 4 stages (RepMixer ×3 + attention),
    MobileOne-style structural reparameterization throughout.  THIS
    IMPLEMENTATION IS THE DEPLOY FORM — every multi-branch train-time
    block (MobileOneBlock, RepMixer, RepCPE, ReparamLargeKernelConv)
    is a single conv here, and `timm_fastvit_to_params` performs the
    EXACT branch fusion (conv+BN folding, 1×1→k×k center padding,
    identity-as-conv) at load time.  Reparameterization is exact at
    inference (the branches are linear), and single fused convs are
    what XLA/TPU want; the fusion math is oracle-tested against a
    multi-branch numpy forward in tests/test_mci.py.

Oracles (timm itself is absent from this container): per-block fusion
algebra is numpy-oracle-tested, AND both full forwards are pinned
end-to-end against independent train-form implementations composed
from the published architectures — a branch-by-branch numpy FastVit
(multi-branch MobileOne blocks, RepMixer residuals, layer scales,
SE/act placement) and a torch hybrid-ViT — in tests/test_mci.py.  Key
layout follows timm's train-form naming (`conv_kxk.0.{conv,bn}`,
`conv_scale`, `identity`, `token_mixer.{mixer,norm}`,
`layer_scale.gamma`, ...); deploy-form checkpoints (`reparam_conv`)
are also accepted.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MciViTSpec:
    """vit_base_mci_224 — hybrid ViT-B with the MCi conv stem."""
    name: str
    image_size: int = 224
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    stem_channels: Tuple[int, ...] = (192, 192, 768)
    stem_kernels: Tuple[int, ...] = (4, 2, 2)
    output_dim: int = 512
    ln_eps: float = 1e-6

    @property
    def grid_size(self) -> int:
        s = 1
        for k in self.stem_kernels:
            s *= k
        return self.image_size // s


@dataclasses.dataclass(frozen=True)
class FastVitSpec:
    """fastvit_mci1 / fastvit_mci2 — MobileCLIP S1/S2 image towers."""
    name: str
    image_size: int = 256
    dims: Tuple[int, ...] = (64, 128, 256, 512)
    depths: Tuple[int, ...] = (4, 12, 24, 4)
    mlp_ratio: float = 3.0
    # per stage: "repmixer" | "attention"
    token_mixers: Tuple[str, ...] = ("repmixer", "repmixer", "repmixer",
                                     "attention")
    se_downsamples: Tuple[bool, ...] = (False, False, True, True)
    pos_emb_stages: Tuple[int, ...] = (3,)   # RepCPE at these stage entries
    attn_head_dim: int = 32
    cls_ratio: float = 2.0                   # final conv dim multiplier
    output_dim: int = 512

    @property
    def final_dim(self) -> int:
        return int(self.dims[-1] * self.cls_ratio)


MCI_TRUNKS = {
    "vit_base_mci_224": ("vit", dict()),
    "fastvit_mci1": ("fastvit", dict(
        dims=(64, 128, 256, 512), depths=(4, 12, 24, 4))),
    "fastvit_mci2": ("fastvit", dict(
        dims=(80, 160, 320, 640), depths=(4, 12, 24, 4))),
}


def match_mci(name: str, embed_dim: int, image_size: Optional[int] = None,
              pool: str = "", proj=None):
    if name not in MCI_TRUNKS:
        if name.startswith("fastvit") or "_mci" in name:
            raise ValueError(
                f"unsupported MobileCLIP trunk {name!r}; implemented: "
                f"{sorted(MCI_TRUNKS)}")
        return None
    kind, kw = MCI_TRUNKS[name]
    kw = dict(kw)
    if image_size:
        kw["image_size"] = image_size
    cls = MciViTSpec if kind == "vit" else FastVitSpec
    return cls(name=name, output_dim=embed_dim, **kw)


# ---------------------------------------------------------------------------
# Shared conv helpers (NHWC, HWIO weights)
# ---------------------------------------------------------------------------

def _conv(x, w, b=None, stride=1, groups=1, padding=None):
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if b is not None:
        y = y + b.astype(x.dtype)
    return y


def _se(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Squeeze-excite: avg pool → 1×1 relu → 1×1 sigmoid gate."""
    s = x.mean(axis=(1, 2), keepdims=True)
    s = jax.nn.relu(_conv(s, p["fc1_w"], p["fc1_b"], padding=0))
    s = jax.nn.sigmoid(_conv(s, p["fc2_w"], p["fc2_b"], padding=0))
    return x * s


def _mob(p: Params, x: jnp.ndarray, stride: int, groups: int,
         act: bool = True, padding=None) -> jnp.ndarray:
    """Deploy-form MobileOneBlock: fused conv (+SE) (+GELU)."""
    y = _conv(x, p["w"], p["b"], stride=stride, groups=groups,
              padding=padding)
    if "se" in p:
        y = _se(p["se"], y)
    return layers.gelu(y) if act else y


# ---------------------------------------------------------------------------
# MCi-ViT forward
# ---------------------------------------------------------------------------

def encode_image_mci_vit(params: Params, spec: MciViTSpec,
                         images: jnp.ndarray, normalize: bool = False,
                         dtype=jnp.float32, remat: bool = False,
                         **_ignored) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    from leaf_tpu.models.clip import l2_normalize
    x = images.astype(dtype)
    for i, (k,) in enumerate(zip(spec.stem_kernels)):
        st = params["stem"][i]
        # non-overlapping patch convs: kernel == stride, pad 0
        x = layers.gelu(_conv(x, st["w"], st["b"], stride=k, padding=0))
    x = _conv(x, params["proj_w"], params["proj_b"], padding=0)  # 1×1
    B = x.shape[0]
    x = x.reshape(B, -1, spec.width)
    # no_embed_class: pos embed on patch tokens, cls prepended after
    x = x + params["positional_embedding"].astype(dtype)
    cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                           (B, 1, spec.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = layers.transformer_stack(params["blocks"], x, None, spec.heads,
                                 layers.gelu, spec.ln_eps, remat=remat,
                                 # same rule as clip.py: the Pallas
                                 # custom_vjp under jax.checkpoint is a
                                 # measured net loss
                                 packed=None if remat
                                 else (x.shape[1], False))
    x = layers.layer_norm(params["ln_post"], x, spec.ln_eps)
    pooled = x[:, 0]                                   # timm_pool='token'
    pooled = pooled @ params["proj"].astype(dtype) \
        + params["proj_bias"].astype(dtype)            # trunk head
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# FastViT forward
# ---------------------------------------------------------------------------

def _conv_mlp(p: Params, x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """ConvMlp: fused dw7×7 conv, then 1×1 fc1 → GELU → 1×1 fc2."""
    y = _conv(x, p["conv_w"], p["conv_b"], groups=dim)
    y = layers.gelu(_conv(y, p["fc1_w"], p["fc1_b"], padding=0))
    return _conv(y, p["fc2_w"], p["fc2_b"], padding=0)


def _fastvit_attention(p: Params, x: jnp.ndarray, head_dim: int
                       ) -> jnp.ndarray:
    B, H, W, C = x.shape
    n_heads = C // head_dim
    t = x.reshape(B, H * W, C)
    qkv = t @ p["qkv_w"].astype(x.dtype)
    if "qkv_b" in p:
        qkv = qkv + p["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(z):
        return z.reshape(B, H * W, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) \
        * (head_dim ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, H * W, C)
    out = out @ p["proj_w"].astype(x.dtype) + p["proj_b"].astype(x.dtype)
    return out.reshape(B, H, W, C)


def _fastvit_stage(p: Params, x: jnp.ndarray, spec: FastVitSpec,
                   s: int) -> jnp.ndarray:
    dim = spec.dims[s]
    if "downsample" in p:
        ds = p["downsample"]
        # ReparamLargeKernelConv: fused grouped 7×7 s2 (+SE) + act,
        # then a fused pointwise MobileOneBlock
        x = _mob(ds["lkc"], x, stride=2, groups=spec.dims[s - 1])
        x = _mob(ds["pw"], x, stride=1, groups=1, padding=0)
    if "pos_emb" in p:
        # RepCPE deploy form: identity already folded into the conv
        x = _conv(x, p["pos_emb"]["w"], p["pos_emb"]["b"], groups=dim)

    mixer = spec.token_mixers[s]

    def body(h, bp):
        if mixer == "repmixer":
            # deploy RepMixer: residual + layer scale folded into one
            # dw3×3 conv
            h = _conv(h, bp["mixer_w"], bp["mixer_b"], groups=dim)
            h = h + bp["ls2"].astype(h.dtype) * _conv_mlp(bp["mlp"], h, dim)
        else:
            y = h * bp["norm"]["scale"].astype(h.dtype) \
                + bp["norm"]["bias"].astype(h.dtype)   # BN2d (folded affine)
            h = h + bp["ls1"].astype(h.dtype) \
                * _fastvit_attention(bp["attn"], y, spec.attn_head_dim)
            h = h + bp["ls2"].astype(h.dtype) * _conv_mlp(bp["mlp"], h, dim)
        return h, None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    return x


def encode_image_fastvit(params: Params, spec: FastVitSpec,
                         images: jnp.ndarray, normalize: bool = False,
                         dtype=jnp.float32, remat: bool = False,
                         **_ignored) -> jnp.ndarray:
    """NHWC [B, H, W, 3] → [B, output_dim]."""
    from leaf_tpu.models.clip import l2_normalize
    x = images.astype(dtype)
    d0 = spec.dims[0]
    x = _mob(params["stem"][0], x, stride=2, groups=1)       # 3 → d0, 3×3
    x = _mob(params["stem"][1], x, stride=2, groups=d0)      # dw 3×3
    x = _mob(params["stem"][2], x, stride=1, groups=1, padding=0)  # 1×1
    for s in range(len(spec.depths)):
        stage = functools.partial(_fastvit_stage, spec=spec, s=s)
        if remat:
            stage = jax.checkpoint(stage)
        x = stage(params["stages"][s], x)
    x = _mob(params["final"], x, stride=1, groups=spec.dims[-1])
    pooled = x.mean(axis=(1, 2))
    pooled = pooled @ params["head_w"].astype(dtype) \
        + params["head_b"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _nrm(key, *shape):
    return 0.02 * jax.random.normal(key, shape, jnp.float32)


def _he(key, *shape):
    """Fan-in-scaled conv init for HWIO(-stacked) kernels.  The deploy
    form has no BN to renormalize activations, so a fixed-std init
    vanishes across the ~10 fused convs on the FastViT spine; He
    scaling keeps activations O(1) at depth."""
    k, cin = shape[-4], shape[-2]
    std = (2.0 / (k * k * cin)) ** 0.5
    return std * jax.random.normal(key, shape, jnp.float32)


def _dw_identity(k: int, c: int) -> jnp.ndarray:
    """Depthwise identity kernel in HWIO layout [k, k, 1, c]."""
    return jnp.zeros((k, k, 1, c), jnp.float32).at[k // 2, k // 2, 0].set(1.0)


def _init_se(key, c: int, rd: float = 0.0625) -> Params:
    r = max(1, int(c * rd))
    k1, k2 = jax.random.split(key)
    return {"fc1_w": _nrm(k1, 1, 1, c, r), "fc1_b": jnp.zeros(r),
            "fc2_w": _nrm(k2, 1, 1, r, c), "fc2_b": jnp.zeros(c)}


def _init_mob(key, k: int, cin: int, cout: int, groups: int = 1,
              se: bool = False) -> Params:
    p = {"w": _he(key, k, k, cin // groups, cout), "b": jnp.zeros(cout)}
    if se:
        p["se"] = _init_se(jax.random.fold_in(key, 1), cout)
    return p


def init_mci_vit(key, spec: MciViTSpec) -> Params:
    keys = jax.random.split(key, 8)
    chans = (3,) + spec.stem_channels
    stem = [_init_mob(keys[i], spec.stem_kernels[i], chans[i], chans[i + 1])
            for i in range(len(spec.stem_kernels))]
    D = spec.width
    n_patch = spec.grid_size ** 2
    return {
        "stem": stem,
        "proj_w": _nrm(keys[3], 1, 1, spec.stem_channels[-1], D),
        "proj_b": jnp.zeros(D),
        "class_embedding": _nrm(keys[4], D),
        "positional_embedding": _nrm(keys[5], n_patch, D),
        "blocks": layers.init_block_stack(
            keys[6], spec.layers, D, int(D * spec.mlp_ratio)),
        "ln_post": {"scale": jnp.ones((D,)), "bias": jnp.zeros(D)},
        "proj": _nrm(keys[7], D, spec.output_dim),
        "proj_bias": jnp.zeros(spec.output_dim),
    }


def init_fastvit(key, spec: FastVitSpec) -> Params:
    keys = jax.random.split(key, 8 + len(spec.depths))
    d0 = spec.dims[0]
    stem = [_init_mob(keys[0], 3, 3, d0),
            _init_mob(keys[1], 3, d0, d0, groups=d0),
            _init_mob(keys[2], 1, d0, d0)]

    def stage(kk, s):
        L, C = spec.depths[s], spec.dims[s]
        Hn = int(C * spec.mlp_ratio)
        ks = jax.random.split(kk, 10)
        st: Params = {}
        if s > 0:
            Cin = spec.dims[s - 1]
            st["downsample"] = {
                "lkc": _init_mob(ks[0], 7, Cin, C, groups=Cin,
                                 se=spec.se_downsamples[s]),
                "pw": _init_mob(ks[1], 1, C, C)}
        if s in spec.pos_emb_stages:
            # RepCPE deploy form is identity + conv; init near-identity
            st["pos_emb"] = {"w": _dw_identity(7, C) + _nrm(ks[2], 7, 7, 1, C),
                             "b": jnp.zeros(C)}
        mlp = {"conv_w": _he(ks[3], L, 7, 7, 1, C),
               "conv_b": jnp.zeros((L, C)),
               "fc1_w": _he(ks[4], L, 1, 1, C, Hn),
               "fc1_b": jnp.zeros((L, Hn)),
               "fc2_w": _he(ks[5], L, 1, 1, Hn, C),
               "fc2_b": jnp.zeros((L, C))}
        if spec.token_mixers[s] == "repmixer":
            # fused RepMixer = I + γ(Wm − Wn) with γ=1e-5 → near-identity
            st["blocks"] = {"mixer_w": _dw_identity(3, C)[None]
                            + 1e-3 * _nrm(ks[6], L, 3, 3, 1, C),
                            "mixer_b": jnp.zeros((L, C)),
                            "ls2": 1e-5 * jnp.ones((L, C)), "mlp": mlp}
        else:
            st["blocks"] = {
                "norm": {"scale": jnp.ones((L, C)),
                         "bias": jnp.zeros((L, C))},
                "attn": {"qkv_w": _nrm(ks[7], L, C, 3 * C),
                         "proj_w": _nrm(ks[8], L, C, C),
                         "proj_b": jnp.zeros((L, C))},
                "ls1": 1e-5 * jnp.ones((L, C)),
                "ls2": 1e-5 * jnp.ones((L, C)), "mlp": mlp}
        return st

    fin = spec.final_dim
    return {
        "stem": stem,
        "stages": [stage(keys[4 + s], s) for s in range(len(spec.depths))],
        "final": _init_mob(keys[3], 3, spec.dims[-1], fin,
                           groups=spec.dims[-1], se=True),
        "head_w": _nrm(keys[-1], fin, spec.output_dim),
        "head_b": jnp.zeros(spec.output_dim),
    }


# ---------------------------------------------------------------------------
# Checkpoint ingestion: structural reparameterization
# ---------------------------------------------------------------------------

def _np(v) -> np.ndarray:
    return (v.detach().cpu().float().numpy() if hasattr(v, "detach")
            else np.asarray(v, np.float32))


def fuse_conv_bn(w: np.ndarray, gamma, beta, mean, var,
                 eps: float = 1e-5) -> Tuple[np.ndarray, np.ndarray]:
    """BN-after-conv folding (torch OIHW weight) → (w', b')."""
    s = gamma / np.sqrt(var + eps)
    return w * s[:, None, None, None], beta - mean * s


def _identity_kernel(c_out: int, c_in: int, groups: int,
                     k: int) -> np.ndarray:
    """Identity map as an OIHW conv kernel (requires c_in == c_out)."""
    inp = c_in // groups
    w = np.zeros((c_out, inp, k, k), np.float32)
    for o in range(c_out):
        w[o, o % inp, k // 2, k // 2] = 1.0
    return w


def _pad_1x1_to_kxk(w: np.ndarray, k: int) -> np.ndarray:
    out = np.zeros(w.shape[:2] + (k, k), np.float32)
    out[:, :, k // 2, k // 2] = w[:, :, 0, 0]
    return out


def _hwio(w: np.ndarray) -> np.ndarray:
    return w.transpose(2, 3, 1, 0)


class _SD:
    """Key-probing view over a state dict with a fixed prefix."""

    def __init__(self, sd: Mapping[str, Any], prefix: str):
        self.sd, self.prefix = sd, prefix

    def has(self, k: str) -> bool:
        return self.prefix + k in self.sd

    def get(self, k: str) -> np.ndarray:
        full = self.prefix + k
        if full not in self.sd:
            raise KeyError(
                f"MobileCLIP ingestion: missing key {full!r} "
                "(expected timm train-form or deploy-form layout; "
                "Apple-format checkpoints must first be remapped as in "
                "reference convert.py:142-181)")
        return _np(self.sd[full])

    def sub(self, k: str) -> "_SD":
        return _SD(self.sd, self.prefix + k)


def _fuse_branch(g: _SD, name: str):
    """One conv+BN branch → fused (OIHW, bias); conv may be bias-less."""
    w = g.get(name + ".conv.weight")
    return fuse_conv_bn(w, g.get(name + ".bn.weight"),
                        g.get(name + ".bn.bias"),
                        g.get(name + ".bn.running_mean"),
                        g.get(name + ".bn.running_var"))


def _fuse_mobileone(g: _SD, k: int, groups: int) -> Tuple[np.ndarray,
                                                          np.ndarray]:
    """MobileOneBlock branches → single fused (OIHW, bias).

    Branches: `conv_kxk.{i}` (conv+BN), `conv_scale` (1×1 conv+BN,
    center-padded to k×k), `identity` (bare BN over the skip).  Deploy
    checkpoints carry `reparam_conv` directly."""
    if g.has("reparam_conv.weight"):
        return (g.get("reparam_conv.weight"), g.get("reparam_conv.bias"))
    w_sum = None
    b_sum = None
    i = 0
    while g.has(f"conv_kxk.{i}.conv.weight"):
        w, b = _fuse_branch(g, f"conv_kxk.{i}")
        w_sum = w if w_sum is None else w_sum + w
        b_sum = b if b_sum is None else b_sum + b
        i += 1
    if w_sum is None:
        raise KeyError(
            f"MobileCLIP ingestion: no conv_kxk.0/reparam_conv under "
            f"{g.prefix!r}")
    if g.has("conv_scale.conv.weight"):
        w, b = _fuse_branch(g, "conv_scale")
        w_sum = w_sum + _pad_1x1_to_kxk(w, k)
        b_sum = b_sum + b
    if g.has("identity.weight"):         # bare BN skip branch
        c = w_sum.shape[0]
        wid = _identity_kernel(c, c, groups, k)
        w, b = fuse_conv_bn(wid, g.get("identity.weight"),
                            g.get("identity.bias"),
                            g.get("identity.running_mean"),
                            g.get("identity.running_var"))
        w_sum = w_sum + w
        b_sum = b_sum + b
    return w_sum, b_sum


def _mob_params(g: _SD, k: int, groups: int) -> Params:
    w, b = _fuse_mobileone(g, k, groups)
    p = {"w": _hwio(w), "b": b}
    if g.has("se.fc1.weight"):
        p["se"] = {"fc1_w": _hwio(g.get("se.fc1.weight")),
                   "fc1_b": g.get("se.fc1.bias"),
                   "fc2_w": _hwio(g.get("se.fc2.weight")),
                   "fc2_b": g.get("se.fc2.bias")}
    return p


def _fuse_repmixer(g: _SD, dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """RepMixer → single dw3×3: I + γ·(mixer − norm) (exact: both
    branches are conv+BN, the skip is identity, γ the layer scale)."""
    if g.has("reparam_conv.weight"):
        return g.get("reparam_conv.weight"), g.get("reparam_conv.bias")
    wm, bm = _fuse_mobileone(g.sub("mixer."), 3, dim)
    wn, bn = _fuse_mobileone(g.sub("norm."), 3, dim)
    if g.has("layer_scale.gamma"):
        ls = g.get("layer_scale.gamma").reshape(-1)
    else:
        ls = np.ones(dim, np.float32)
    w = ls[:, None, None, None] * (wm - wn)
    b = ls * (bm - bn)
    w = w + _identity_kernel(dim, dim, dim, 3)
    return w, b


def _fuse_repcpe(g: _SD, dim: int) -> Tuple[np.ndarray, np.ndarray]:
    """RepCPE (dw conv + identity residual) → single conv."""
    if g.has("reparam_conv.weight"):
        return g.get("reparam_conv.weight"), g.get("reparam_conv.bias")
    for cand in ("pe.0", "proj", "pe"):
        if g.has(cand + ".weight"):
            w = g.get(cand + ".weight")
            b = (g.get(cand + ".bias") if g.has(cand + ".bias")
                 else np.zeros(dim, np.float32))
            k = w.shape[-1]
            return w + _identity_kernel(dim, dim, dim, k), b
    raise KeyError(f"MobileCLIP ingestion: no RepCPE conv under {g.prefix!r}")


def _ls(g: _SD, name: str, dim: int) -> np.ndarray:
    if g.has(name + ".gamma"):
        return g.get(name + ".gamma").reshape(-1)
    return np.ones(dim, np.float32)


def timm_fastvit_to_params(sd: Mapping[str, Any], spec: FastVitSpec,
                           trunk_prefix: str = "visual.trunk.",
                           head_prefix: str = "visual.head.") -> Params:
    """timm FastVit state dict (train- or deploy-form) → fused pytree."""
    root = _SD(sd, trunk_prefix)
    d0 = spec.dims[0]
    stem = [_mob_params(root.sub("stem.0."), 3, 1),
            _mob_params(root.sub("stem.1."), 3, d0),
            _mob_params(root.sub("stem.2."), 1, 1)]

    def stage(s):
        L, C = spec.depths[s], spec.dims[s]
        pre = f"stages.{s}."
        st: Params = {}
        if s > 0:
            Cin = spec.dims[s - 1]
            ds = root.sub(pre + "downsample.")
            st["downsample"] = {
                "lkc": _lkc_params(ds.sub("proj.0."), Cin),
                "pw": _mob_params(ds.sub("proj.1."), 1, 1)}
        if s in spec.pos_emb_stages:
            w, b = _fuse_repcpe(root.sub(pre + "pos_emb."), C)
            st["pos_emb"] = {"w": _hwio(w), "b": b}

        def blk(j):
            return root.sub(pre + f"blocks.{j}.")

        def stack(fn):
            ws, bs = zip(*(fn(blk(j)) for j in range(L)))
            return np.stack(ws), np.stack(bs)

        def mlp_params():
            conv = [_fuse_branch(blk(j), "mlp.conv")
                    if blk(j).has("mlp.conv.conv.weight")
                    else (blk(j).get("mlp.conv.weight"),
                          blk(j).get("mlp.conv.bias"))
                    for j in range(L)]
            return {
                "conv_w": np.stack([_hwio(w) for w, _ in conv]),
                "conv_b": np.stack([b for _, b in conv]),
                "fc1_w": np.stack([_hwio(blk(j).get("mlp.fc1.weight"))
                                   for j in range(L)]),
                "fc1_b": np.stack([blk(j).get("mlp.fc1.bias")
                                   for j in range(L)]),
                "fc2_w": np.stack([_hwio(blk(j).get("mlp.fc2.weight"))
                                   for j in range(L)]),
                "fc2_b": np.stack([blk(j).get("mlp.fc2.bias")
                                   for j in range(L)]),
            }

        if spec.token_mixers[s] == "repmixer":
            mw, mb = stack(lambda b: _fuse_repmixer(b.sub("token_mixer."),
                                                    C))
            st["blocks"] = {
                "mixer_w": np.stack([_hwio(w) for w in mw]),
                "mixer_b": mb,
                "ls2": np.stack([_ls(blk(j), "layer_scale", C)
                                 for j in range(L)]),
                "mlp": mlp_params()}
        else:
            norm = [_bn_affine(blk(j), "norm") for j in range(L)]
            attn = {
                "qkv_w": np.stack(
                    [blk(j).get("token_mixer.qkv.weight").T
                     for j in range(L)]),
                "proj_w": np.stack(
                    [blk(j).get("token_mixer.proj.weight").T
                     for j in range(L)]),
                "proj_b": np.stack(
                    [blk(j).get("token_mixer.proj.bias")
                     for j in range(L)]),
            }
            if blk(0).has("token_mixer.qkv.bias"):
                attn["qkv_b"] = np.stack(
                    [blk(j).get("token_mixer.qkv.bias") for j in range(L)])
            st["blocks"] = {
                "norm": {"scale": np.stack([n[0] for n in norm]),
                         "bias": np.stack([n[1] for n in norm])},
                "attn": attn,
                "ls1": np.stack([_ls(blk(j), "layer_scale_1", C)
                                 for j in range(L)]),
                "ls2": np.stack([_ls(blk(j), "layer_scale_2", C)
                                 for j in range(L)]),
                "mlp": mlp_params()}
        return st

    return {
        "stem": stem,
        "stages": [stage(s) for s in range(len(spec.depths))],
        "final": _mob_params(root.sub("final_conv."), 3, spec.dims[-1]),
        "head_w": _np(sd[trunk_prefix + "head.fc.weight"]).T
        if trunk_prefix + "head.fc.weight" in sd
        else _np(sd[trunk_prefix + "head.weight"]).T,
        "head_b": _np(sd[trunk_prefix + "head.fc.bias"])
        if trunk_prefix + "head.fc.bias" in sd
        else _np(sd[trunk_prefix + "head.bias"]),
    }


def _lkc_params(g: _SD, groups: int) -> Params:
    """ReparamLargeKernelConv: large (7×7) + small (3×3) conv+BN
    branches → one fused 7×7 (small branch center-padded)."""
    if g.has("reparam_conv.weight"):
        p = {"w": _hwio(g.get("reparam_conv.weight")),
             "b": g.get("reparam_conv.bias")}
    else:
        w, b = _fuse_branch(g, "large_conv")
        if g.has("small_conv.conv.weight"):
            ws, bs = _fuse_branch(g, "small_conv")
            pad = (w.shape[-1] - ws.shape[-1]) // 2
            w = w + np.pad(ws, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
            b = b + bs
        p = {"w": _hwio(w), "b": b}
    if g.has("se.fc1.weight"):
        p["se"] = {"fc1_w": _hwio(g.get("se.fc1.weight")),
                   "fc1_b": g.get("se.fc1.bias"),
                   "fc2_w": _hwio(g.get("se.fc2.weight")),
                   "fc2_b": g.get("se.fc2.bias")}
    return p


def _bn_affine(g: _SD, name: str, eps: float = 1e-5):
    """Inference BN2d → per-channel (scale, bias)."""
    gam = g.get(name + ".weight")
    bet = g.get(name + ".bias")
    mean = g.get(name + ".running_mean")
    var = g.get(name + ".running_var")
    s = gam / np.sqrt(var + eps)
    return s, bet - mean * s


def timm_mci_vit_to_params(sd: Mapping[str, Any], spec: MciViTSpec,
                           trunk_prefix: str = "visual.trunk.",
                           head_prefix: str = "visual.head.") -> Params:
    """timm hybrid-ViT (ConvStem backbone) state dict → pytree.

    Key layout: `patch_embed.backbone.{i}.{conv,bn}`, `patch_embed.proj`
    (1×1), `cls_token`, `pos_embed` (patch tokens only —
    no_embed_class), `blocks.*` (standard timm ViT), `norm`, `head`."""
    root = _SD(sd, trunk_prefix)
    stem = []
    for i in range(len(spec.stem_kernels)):
        g = root.sub(f"patch_embed.backbone.{i}.")
        if g.has("bn.running_mean"):
            w, b = _fuse_branch(root, f"patch_embed.backbone.{i}")
        else:
            w = g.get("conv.weight")
            b = (g.get("conv.bias") if g.has("conv.bias")
                 else np.zeros(w.shape[0], np.float32))
        stem.append({"w": _hwio(w), "b": b})
    from leaf_tpu.models.timm_vision import timm_vit_blocks_to_stack
    blocks = timm_vit_blocks_to_stack(sd, trunk_prefix, spec.layers)
    return {
        "stem": stem,
        "proj_w": _hwio(root.get("patch_embed.proj.weight")),
        "proj_b": root.get("patch_embed.proj.bias"),
        "class_embedding": root.get("cls_token").reshape(-1),
        "positional_embedding": root.get("pos_embed").reshape(-1, spec.width),
        "blocks": blocks,
        "ln_post": {"scale": root.get("norm.weight"),
                    "bias": root.get("norm.bias")},
        "proj": root.get("head.weight").T,
        "proj_bias": root.get("head.bias"),
    }


def init_mci(key, spec) -> Params:
    if isinstance(spec, MciViTSpec):
        return init_mci_vit(key, spec)
    return init_fastvit(key, spec)


def encode_mci(params: Params, spec, images, normalize: bool = False,
               dtype=jnp.float32, **kw):
    if isinstance(spec, MciViTSpec):
        return encode_image_mci_vit(params, spec, images,
                                    normalize=normalize, dtype=dtype, **kw)
    return encode_image_fastvit(params, spec, images, normalize=normalize,
                                dtype=dtype, **kw)


def mci_from_timm(sd, spec, trunk_prefix: str = "visual.trunk.",
                  head_prefix: str = "visual.head.") -> Params:
    if isinstance(spec, MciViTSpec):
        return timm_mci_vit_to_params(sd, spec, trunk_prefix, head_prefix)
    return timm_fastvit_to_params(sd, spec, trunk_prefix, head_prefix)


from leaf_tpu.models.trunks import register_trunk  # noqa: E402

register_trunk(MciViTSpec, init_mci, encode_mci, mci_from_timm, match_mci)
register_trunk(FastVitSpec, init_mci, encode_mci, mci_from_timm)
