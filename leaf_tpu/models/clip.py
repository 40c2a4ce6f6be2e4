"""Pure-functional CLIP model (text + vision towers) for TPU.

TPU-first re-design of the reference model core
(`/root/reference/src/open_clip/model.py:220-315`,
`src/open_clip/transformer.py:434-809`):

  * parameters are a plain pytree (dict) — no module system; frozen vs
    trainable towers are just two pytrees through the same apply fn
    (avoids the reference's full-model deepcopy,
    `train_AT_text_only.py:439-465`);
  * residual blocks are stacked on a leading layer axis and run with
    `lax.scan` (compiles once, remat-friendly);
  * patch embedding is a reshape + single MXU matmul instead of a
    conv (identical math to the stride-p conv at
    `transformer.py:470`, but trivially fused by XLA);
  * images are NHWC (TPU-native layout);
  * everything is jit/vmap/pjit-compatible: static shapes, no Python
    control flow on traced values.

Numerical parity with the reference/HF CLIP is pinned by
`tests/test_model_parity.py`.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import layers
from leaf_tpu.models.config import CLIPConfig, TextConfig, VisionConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Masks & pooling
# ---------------------------------------------------------------------------

@functools.lru_cache()
def causal_mask(seq_len: int) -> np.ndarray:
    """Additive causal mask [S, S]; -inf above the diagonal
    (reference `transformer.py:759-765` build_causal_mask).  Returned as
    a host constant (numpy) so it is safe to cache across jit traces."""
    return np.triu(np.full((seq_len, seq_len), -np.inf, np.float32), k=1)


@functools.lru_cache()
def packed_block_mask(seq_len: int, groups: int, causal: bool) -> np.ndarray:
    """Additive mask [G·S, G·S] for G sequences packed along the length
    axis: (causal) attention within each S-block, -inf across blocks.

    Sequence packing is the TPU answer to CLIP's short (≈16-token
    bucketed) candidate sequences: attention on [B, 16, D] lowers to
    16×16 MXU tiles that run at ~2% utilisation; packing 8 sequences
    into one 128-token row with this block-diagonal mask is *exactly*
    the same computation (softmax rows never cross blocks; LN and
    matmuls are per-token) on MXU-shaped 128×128 tiles — measured ~15×
    faster attention core on v5e.
    """
    within = np.tril(np.ones((seq_len, seq_len), bool)) if causal \
        else np.ones((seq_len, seq_len), bool)
    allowed = np.kron(np.eye(groups, dtype=bool), within)
    return np.where(allowed, 0.0, -np.inf).astype(np.float32)


def _pack_groups(batch: int, seq_len: int, target: int = 128) -> int:
    """Largest G dividing `batch` with G·S ≤ target."""
    g = max(1, target // seq_len)
    while g > 1 and batch % g:
        g -= 1
    return g


def text_pool(x: jnp.ndarray, tokens: jnp.ndarray, pool_type: str) -> jnp.ndarray:
    """Pool token features [B, S, D] → [B, D].

    'argmax' takes the EOT position — EOT has the highest token id in
    every sequence (reference `transformer.py:653-665`).
    """
    if pool_type == "argmax":
        eot = jnp.argmax(tokens, axis=-1)
        return jnp.take_along_axis(x, eot[:, None, None], axis=1)[:, 0]
    if pool_type == "first":
        return x[:, 0]
    if pool_type == "last":
        return x[:, -1]
    raise ValueError(f"unsupported pool_type {pool_type!r}")


def _act(quick_gelu: bool):
    return layers.quick_gelu if quick_gelu else layers.gelu


# ---------------------------------------------------------------------------
# Initialisation
# ---------------------------------------------------------------------------

def init_text_tower(key, cfg: TextConfig, quick_gelu: bool = False) -> Params:
    k = jax.random.split(key, 4)
    mlp_width = int(cfg.width * cfg.mlp_ratio)
    p = {
        "token_embedding": 0.02 * jax.random.normal(
            k[0], (cfg.vocab_size, cfg.width), jnp.float32),
        "positional_embedding": 0.01 * jax.random.normal(
            k[1], (cfg.context_length, cfg.width), jnp.float32),
        "blocks": layers.init_block_stack(k[2], cfg.layers, cfg.width, mlp_width),
        "ln_final": layers.init_layer_norm(cfg.width),
        "text_projection": (cfg.width ** -0.5) * jax.random.normal(
            k[3], (cfg.width, cfg.output_dim), jnp.float32),
    }
    if cfg.proj_bias:
        p["text_projection_bias"] = jnp.zeros((cfg.output_dim,), jnp.float32)
    return p


def init_attn_pool(key, width: int, mlp_ratio: float = 4.0) -> Params:
    """MAP attention-pooling head (timm `AttentionPoolLatent`, the
    SigLIP vision pooler): a learned probe token cross-attends over all
    patch tokens, then an LN+MLP residual refines the pooled vector."""
    k = jax.random.split(key, 6)
    scale = width ** -0.5
    mlp_width = int(width * mlp_ratio)
    return {
        "probe": scale * jax.random.normal(k[0], (1, width), jnp.float32),
        "q_w": scale * jax.random.normal(k[1], (width, width), jnp.float32),
        "q_b": jnp.zeros((width,), jnp.float32),
        "kv_w": scale * jax.random.normal(k[2], (width, 2 * width),
                                          jnp.float32),
        "kv_b": jnp.zeros((2 * width,), jnp.float32),
        "proj_w": scale * jax.random.normal(k[3], (width, width),
                                            jnp.float32),
        "proj_b": jnp.zeros((width,), jnp.float32),
        "ln": layers.init_layer_norm(width),
        "mlp": {
            "fc_w": scale * jax.random.normal(k[4], (width, mlp_width),
                                              jnp.float32),
            "fc_b": jnp.zeros((mlp_width,), jnp.float32),
            "proj_w": scale * jax.random.normal(k[5], (mlp_width, width),
                                                jnp.float32),
            "proj_b": jnp.zeros((width,), jnp.float32),
        },
    }


def attn_pool(p: Params, x: jnp.ndarray, n_heads: int,
              ln_eps: float = 1e-6) -> jnp.ndarray:
    """MAP head forward: tokens [B, S, D] → pooled [B, D] (timm
    `AttentionPoolLatent.forward` with latent_len=1, pool='token')."""
    B, S, D = x.shape
    hd = D // n_heads
    dtype = x.dtype
    q = (p["probe"].astype(dtype) @ p["q_w"].astype(dtype)
         + p["q_b"].astype(dtype))                       # [1, D]
    q = jnp.broadcast_to(q, (B, 1, D)).reshape(B, 1, n_heads, hd)
    kv = x @ p["kv_w"].astype(dtype) + p["kv_b"].astype(dtype)
    k, v = jnp.split(kv, 2, axis=-1)
    k = k.reshape(B, S, n_heads, hd)
    v = v.reshape(B, S, n_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, 1, D)
    out = out @ p["proj_w"].astype(dtype) + p["proj_b"].astype(dtype)
    h = layers.layer_norm(p["ln"], out, ln_eps)
    out = out + layers.mlp(p["mlp"], h, layers.gelu)
    return out[:, 0]


def init_vision_tower(key, cfg: VisionConfig, quick_gelu: bool = False) -> Params:
    k = jax.random.split(key, 6)
    mlp_width = int(cfg.width * cfg.mlp_ratio)
    scale = cfg.width ** -0.5
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    p = {
        # [p*p*3, width]: pixels flattened (ph, pw, c) — see patchify()
        "patch_embedding": scale * jax.random.normal(
            k[0], (patch_dim, cfg.width), jnp.float32),
        "positional_embedding": scale * jax.random.normal(
            k[2], (cfg.num_tokens, cfg.width), jnp.float32),
        "blocks": layers.init_block_stack(k[3], cfg.layers, cfg.width, mlp_width),
        "ln_post": layers.init_layer_norm(cfg.width),
        "proj": scale * jax.random.normal(k[4], (cfg.width, cfg.output_dim), jnp.float32),
    }
    if cfg.cls_token:
        p["class_embedding"] = scale * jax.random.normal(
            k[1], (cfg.width,), jnp.float32)
    if cfg.attn_pool:
        # timm AttentionPoolLatent inherits the trunk's mlp_ratio
        # (SO400M: 3.7362 -> hidden 4304, not 4608)
        p["attn_pool"] = init_attn_pool(k[5], cfg.width, cfg.mlp_ratio)
    if cfg.ln_pre:
        p["ln_pre"] = layers.init_layer_norm(cfg.width)
    if cfg.patch_bias:
        p["patch_bias"] = jnp.zeros((cfg.width,), jnp.float32)
    return p


def init_clip(key, cfg: CLIPConfig) -> Params:
    kt, kv = jax.random.split(key)
    if cfg.resnet is not None:
        from leaf_tpu.models.resnet import ResNetVisionConfig, init_resnet
        rcfg = ResNetVisionConfig(
            layers=cfg.resnet.layers, width=cfg.resnet.width,
            image_size=cfg.resnet.image_size, heads=cfg.resnet.heads,
            output_dim=cfg.resnet.output_dim)
        visual = init_resnet(kv, rcfg)
    elif cfg.convnext is not None:
        from leaf_tpu.models.convnext import init_convnext
        visual = init_convnext(kv, cfg.convnext)
    elif cfg.trunk is not None:
        from leaf_tpu.models import trunks
        visual = trunks.init(kv, cfg.trunk)
    else:
        visual = init_vision_tower(kv, cfg.vision, cfg.quick_gelu)
    p = {
        "text": init_text_tower(kt, cfg.text, cfg.quick_gelu),
        "visual": visual,
        "logit_scale": jnp.asarray(cfg.init_logit_scale, jnp.float32),
    }
    if cfg.init_logit_bias is not None:
        p["logit_bias"] = jnp.asarray(cfg.init_logit_bias, jnp.float32)
    return p


def encode_image_model(params: Params, cfg: CLIPConfig, images: jnp.ndarray,
                       normalize: bool = False, dtype=jnp.float32,
                       remat: bool = False, dropout_key=None) -> jnp.ndarray:
    """Vision dispatch over the full-model config: ViT or ModifiedResNet
    (`params` is the FULL model pytree)."""
    if cfg.resnet is not None:
        from leaf_tpu.models.resnet import (
            ResNetVisionConfig,
            encode_image_resnet,
        )
        rcfg = ResNetVisionConfig(
            layers=cfg.resnet.layers, width=cfg.resnet.width,
            image_size=cfg.resnet.image_size, heads=cfg.resnet.heads,
            output_dim=cfg.resnet.output_dim)
        return encode_image_resnet(params["visual"], rcfg, images,
                                   normalize=normalize, dtype=dtype)
    if cfg.convnext is not None:
        from leaf_tpu.models.convnext import encode_image_convnext
        return encode_image_convnext(params["visual"], cfg.convnext, images,
                                     normalize=normalize, dtype=dtype)
    if cfg.trunk is not None:
        from leaf_tpu.models import trunks
        return trunks.encode(params["visual"], cfg.trunk, images,
                             normalize=normalize, dtype=dtype, remat=remat)
    return encode_image(params["visual"], cfg.vision, images,
                        cfg.quick_gelu, normalize, dtype, remat,
                        dropout_key=dropout_key)


# ---------------------------------------------------------------------------
# Text tower
# ---------------------------------------------------------------------------

def embed_tokens(params: Params, tokens: jnp.ndarray,
                 dtype=jnp.float32) -> jnp.ndarray:
    """Token-id lookup [B, S] → [B, S, D] (exposed for PEZ-style
    embedding-space optimisation, reference
    `src/pez/open_clip_pez/model.py:204-246`)."""
    return params["token_embedding"].astype(dtype)[tokens]


def encode_text_embedding(params: Params, cfg: TextConfig, embeds: jnp.ndarray,
                          tokens: jnp.ndarray, quick_gelu: bool = False,
                          normalize: bool = False,
                          remat: bool = False,
                          use_kernels: Optional[bool] = None) -> jnp.ndarray:
    """Text forward from *embeddings* [B, S, D] (tokens only drive the
    EOT argmax pool).  `encode_text` = this ∘ embed_tokens; splitting the
    two is what enables prompt inversion (PEZ) and keeps one compiled
    graph for both paths."""
    dtype = embeds.dtype
    x = embeds + params["positional_embedding"][:embeds.shape[1]].astype(dtype)
    S = embeds.shape[1]
    mask = None if cfg.no_causal_mask else causal_mask(S)
    if remat and use_kernels is None:
        # same rule as encode_image: under jax.checkpoint the Pallas
        # custom_vjp is a net loss (kernel forward recompute + XLA
        # attention recompute for the gradient) — measured slower
        use_kernels = False
    x = layers.transformer_stack(
        params["blocks"], x, mask, cfg.heads, _act(quick_gelu), cfg.ln_eps,
        remat=remat, packed=(S, not cfg.no_causal_mask),
        use_kernels=use_kernels)
    return _text_tail(params, cfg, x, tokens, normalize, dtype)


def _text_tail(params: Params, cfg: TextConfig, x: jnp.ndarray,
               tokens: jnp.ndarray, normalize: bool, dtype) -> jnp.ndarray:
    """Shared ln_final → pool → projection(+bias) → normalize tail of
    the packed and unpacked text paths (asserted numerically equal)."""
    x = layers.layer_norm(params["ln_final"], x, cfg.ln_eps)
    if x.ndim == 3 and x.shape[0] != tokens.shape[0]:
        x = x.reshape(tokens.shape[0], tokens.shape[1], x.shape[-1])
    pooled = text_pool(x, tokens, cfg.pool_type)
    pooled = pooled @ params["text_projection"].astype(dtype)
    if "text_projection_bias" in params:
        pooled = pooled + params["text_projection_bias"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


def encode_text(params: Params, cfg: TextConfig, tokens: jnp.ndarray,
                quick_gelu: bool = False, normalize: bool = False,
                dtype=jnp.float32, remat: bool = False,
                pack: bool = True,
                use_kernels: Optional[bool] = None) -> jnp.ndarray:
    """Token ids [B, S] → text features [B, output_dim]
    (reference `model.py:269-284`).

    Short sequences are transparently packed G-per-row with a
    block-diagonal mask (see `packed_block_mask`) — numerically
    identical, far better MXU shapes for the bucketed candidate
    batches.  `use_kernels` overrides the Pallas auto-enable (see
    `layers.attention`); pass `enabled(n_devices=1)` inside shard_map."""
    B, S = tokens.shape
    G = _pack_groups(B, S) if (pack and S < 128) else 1
    if G <= 1:
        embeds = embed_tokens(params, tokens, dtype)
        return encode_text_embedding(params, cfg, embeds, tokens,
                                     quick_gelu=quick_gelu,
                                     normalize=normalize, remat=remat,
                                     use_kernels=use_kernels)
    x = embed_tokens(params, tokens, dtype)
    x = x + params["positional_embedding"][:S].astype(dtype)
    x = x.reshape(B // G, G * S, x.shape[-1])
    mask = packed_block_mask(S, G, causal=not cfg.no_causal_mask)
    if remat and use_kernels is None:
        use_kernels = False   # see encode_text_embedding
    x = layers.transformer_stack(
        params["blocks"], x, mask, cfg.heads, _act(quick_gelu), cfg.ln_eps,
        remat=remat, packed=(S, not cfg.no_causal_mask),
        use_kernels=use_kernels)
    return _text_tail(params, cfg, x, tokens, normalize, dtype)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def patchify(images: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """NHWC images [B, H, W, 3] → patches [B, gh*gw, p*p*3].

    Equivalent to the reference's stride-p conv (`transformer.py:470`)
    followed by flatten; pixel order within a patch is (ph, pw, c),
    matching the conv-weight transpose in interop.py.  Non-divisible
    sizes crop the right/bottom edge — stride-p conv floor semantics
    (e.g. the SigLIP SO400M-384 trunk: 384 px / patch 14 → 27×27 grid,
    last 6 px unused, exactly like torch Conv2d).
    """
    B, H, W, C = images.shape
    p = patch_size
    gh, gw = H // p, W // p
    if H != gh * p or W != gw * p:
        images = images[:, :gh * p, :gw * p]
    x = images.reshape(B, gh, p, gw, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, p, p, C]
    return x.reshape(B, gh * gw, p * p * C)


def patch_dropout(x: jnp.ndarray, rate: float, key,
                  cls_token: bool = True) -> jnp.ndarray:
    """Training-time patch dropout (reference `transformer.py:50-87`):
    keep the class token (when the tower has one) + a per-sample random
    subset of ceil((1-rate)·N) patch tokens.  Identity when rate == 0."""
    if rate <= 0:
        return x
    B, S, D = x.shape
    lead = 1 if cls_token else 0
    num_patches = S - lead
    num_keep = max(1, int(num_patches * (1 - rate)))
    scores = jax.random.uniform(key, (B, num_patches))
    keep = jnp.argsort(scores, axis=-1)[:, :num_keep] + lead
    patches = jnp.take_along_axis(x, keep[:, :, None], axis=1)
    if not cls_token:
        return patches
    return jnp.concatenate([x[:, :1], patches], axis=1)


def encode_image(params: Params, cfg: VisionConfig, images: jnp.ndarray,
                 quick_gelu: bool = False, normalize: bool = False,
                 dtype=jnp.float32, remat: bool = False,
                 patch_dropout_rate: Optional[float] = None,
                 dropout_key=None) -> jnp.ndarray:
    """NHWC images [B, H, W, 3] → image features [B, output_dim]
    (reference `transformer.py:559-612` VisionTransformer.forward)."""
    x = patchify(images.astype(dtype), cfg.patch_size)
    x = x @ params["patch_embedding"].astype(dtype)
    if "patch_bias" in params:          # timm ViT patch embed has bias
        x = x + params["patch_bias"].astype(dtype)
    if "class_embedding" in params:     # absent in SigLIP towers
        cls = jnp.broadcast_to(params["class_embedding"].astype(dtype),
                               (x.shape[0], 1, cfg.width))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["positional_embedding"].astype(dtype)
    rate = cfg.patch_dropout if patch_dropout_rate is None \
        else patch_dropout_rate
    if rate > 0 and dropout_key is not None:
        x = patch_dropout(x, rate, dropout_key,
                          cls_token="class_embedding" in params)
    if "ln_pre" in params:              # absent in timm ViT towers
        x = layers.layer_norm(params["ln_pre"], x, cfg.ln_eps)
    # under remat (FARE's differentiated encodes) the Pallas path is a
    # net loss: the checkpoint recompute runs the kernel forward AND the
    # custom_vjp recomputes attention again in XLA for the gradient —
    # measured slower than plain XLA.  Forward-only/eval encodes take
    # the kernel (222 → 193 ms at ViT-L bs=128).
    x = layers.transformer_stack(
        params["blocks"], x, None, cfg.heads, _act(quick_gelu), cfg.ln_eps,
        remat=remat, packed=None if remat else (x.shape[1], False))

    def pool(t):
        if "attn_pool" in params:       # SigLIP MAP head
            return attn_pool(params["attn_pool"], t, cfg.heads, cfg.ln_eps)
        if cfg.pool_type == "tok":
            return t[:, 0]
        if cfg.pool_type == "avg":
            return t.mean(axis=1)
        if cfg.pool_type == "avg_patch":  # timm global_pool='avg' /
            return t[:, 1:].mean(axis=1)  # open_clip pool_type 'avg'
        raise ValueError(f"unsupported pool_type {cfg.pool_type!r}")

    if cfg.final_ln_after_pool and "attn_pool" not in params:
        # CLIPA ordering (`transformer.py:637-639`): pool the raw
        # tokens, then ln_post on the pooled vector
        pooled = layers.layer_norm(params["ln_post"], pool(x), cfg.ln_eps)
    else:
        x = layers.layer_norm(params["ln_post"], x, cfg.ln_eps)
        pooled = pool(x)
    if "head_mlp" in params:            # timm proj='mlp' head
        h = params["head_mlp"]
        pooled = pooled @ h["fc_w"].astype(dtype) + h["fc_b"].astype(dtype)
        pooled = layers.gelu(pooled)
        pooled = pooled @ h["proj_w"].astype(dtype)
        if "proj_b" in h:
            pooled = pooled + h["proj_b"].astype(dtype)
    elif "proj" in params:
        pooled = pooled @ params["proj"].astype(dtype)
        if "proj_bias" in params:
            pooled = pooled + params["proj_bias"].astype(dtype)
    if normalize:
        pooled = l2_normalize(pooled)
    return pooled


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Matches torch F.normalize: x / max(||x||, eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def forward(params: Params, cfg: CLIPConfig,
            images: Optional[jnp.ndarray] = None,
            tokens: Optional[jnp.ndarray] = None,
            dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Joint forward returning the reference's output dict
    (`model.py:295-315`)."""
    out = {"logit_scale": jnp.exp(params["logit_scale"])}
    if images is not None:
        out["image_features"] = encode_image_model(
            params, cfg, images, normalize=True, dtype=dtype)
    if tokens is not None:
        out["text_features"] = encode_text(
            params["text"], cfg.text, tokens, cfg.quick_gelu,
            normalize=True, dtype=dtype)
    if "logit_bias" in params:
        out["logit_bias"] = params["logit_bias"]
    return out


def get_logits(params: Params, cfg: CLIPConfig, images: jnp.ndarray,
               tokens: jnp.ndarray, dtype=jnp.float32):
    """(image_logits, text_logits) as in reference `model.py:286-293`."""
    out = forward(params, cfg, images, tokens, dtype)
    image_logits = out["logit_scale"] * out["image_features"] @ out["text_features"].T
    if "logit_bias" in out:
        image_logits = image_logits + out["logit_bias"]
    return image_logits, image_logits.T


def count_params(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
