"""Pure-functional transformer building blocks for TPU.

TPU-first re-design of the reference transformer
(`/root/reference/src/open_clip/transformer.py`): instead of per-layer
torch modules, each tower keeps its L residual blocks as a single
*stacked* pytree (leading axis = layer) and runs them with
`jax.lax.scan`.  This compiles once regardless of depth, keeps every
matmul MXU-shaped, and makes rematerialisation a one-liner.

Numerics match the reference:
  * LayerNorm is computed in float32 and cast back
    (`transformer.py:15-30`, LayerNormFp32 semantics).
  * Attention softmax is accumulated in float32.
  * QuickGELU is `x * sigmoid(1.702 x)` (`transformer.py:33-36`).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initialisers (match the reference's text-tower init, transformer.py:731-752)
# ---------------------------------------------------------------------------

def _normal(key, shape, std, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype=dtype)


def init_layer_norm(width: int) -> Params:
    return {"scale": jnp.ones((width,), jnp.float32),
            "bias": jnp.zeros((width,), jnp.float32)}


def init_block_stack(key, layers: int, width: int, mlp_width: int) -> Params:
    """Initialise a stack of residual attention blocks, stacked on axis 0."""
    proj_std = (width ** -0.5) * ((2 * layers) ** -0.5)
    attn_std = width ** -0.5
    fc_std = (2 * width) ** -0.5
    k = jax.random.split(key, 4)
    ones = lambda *s: jnp.ones(s, jnp.float32)
    zeros = lambda *s: jnp.zeros(s, jnp.float32)
    return {
        "ln_1": {"scale": ones(layers, width), "bias": zeros(layers, width)},
        "attn": {
            # qkv weight stored [L, width, 3*width]: y = x @ w + b
            "qkv_w": _normal(k[0], (layers, width, 3 * width), attn_std),
            "qkv_b": zeros(layers, 3 * width),
            "out_w": _normal(k[1], (layers, width, width), proj_std),
            "out_b": zeros(layers, width),
        },
        "ln_2": {"scale": ones(layers, width), "bias": zeros(layers, width)},
        "mlp": {
            "fc_w": _normal(k[2], (layers, width, mlp_width), fc_std),
            "fc_b": zeros(layers, mlp_width),
            "proj_w": _normal(k[3], (layers, mlp_width, width), proj_std),
            "proj_b": zeros(layers, width),
        },
    }


# ---------------------------------------------------------------------------
# Forward ops
# ---------------------------------------------------------------------------

def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with fp32 accumulation, cast back to input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.GELU default is the exact (erf) formulation
    return jax.nn.gelu(x, approximate=False)


def attention(p: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray],
              n_heads: int, packed=None,
              use_kernels: Optional[bool] = None) -> jnp.ndarray:
    """Multi-head self-attention.

    x: [B, S, D]; mask: additive [S, S] (or None), applied in fp32.
    Matches torch nn.MultiheadAttention used at `transformer.py:225,250-252`.

    `packed=(group_len, causal)` declares that `mask` IS the standard
    block-diagonal (or plain causal, group_len == S) pattern — i.e.
    `clip.packed_block_mask(group_len, S // group_len, causal)` (or the
    plain causal/None mask).  INVARIANT: when `packed` is set, the
    kernel path derives the mask from `packed` and ignores the `mask`
    argument entirely; passing any *other* additive mask together with
    `packed` silently computes wrong attention on the kernel path while
    matching XLA elsewhere.  Never combine `packed` with a custom mask.
    When the Pallas packed-attention kernel is enabled (single-device
    TPU or inside shard_map, see `leaf_tpu/ops/packed_attention.py`),
    attention runs fused in VMEM with no head transposes and no HBM
    logits — same numerics.

    `use_kernels`: None = auto (`packed_attention.enabled()`, which
    refuses on multi-device processes because GSPMD cannot partition a
    pallas_call); True/False overrides — callers running inside
    `shard_map` pass `enabled(n_devices=1)` since each shard is local.
    """
    if packed is not None:
        from leaf_tpu.ops.packed_attention import (
            enabled, packed_attention, packed_attention_supported)
        kern_ok = enabled() if use_kernels is None else use_kernels
        # measured: without the full block fusion, the standalone kernel
        # beats XLA when rows need no padding, or when rows are long
        # enough that XLA's HBM logits dominate (vision's 257 tokens:
        # kernel 196 ms vs XLA 222).  Row-padded *short* rows (77-token
        # text) were slower than XLA; the fused block in residual_block
        # wins in every case.
        if kern_ok and (x.shape[1] % 128 == 0 or x.shape[1] >= 192) \
                and packed_attention_supported(x.shape[-1], x.dtype,
                                               x.shape[1]):
            group_len, causal = packed
            qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
            out = packed_attention(
                qkv, n_heads, group_len, causal,
                jax.default_backend() != "tpu")
            return out @ p["out_w"].astype(x.dtype) \
                + p["out_b"].astype(x.dtype)
    B, S, D = x.shape
    head_dim = D // n_heads
    qkv = x @ p["qkv_w"].astype(x.dtype) + p["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, n_heads, head_dim).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scale = head_dim ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        m = mask.astype(jnp.float32)
        if m.ndim == 3:          # per-sample additive mask [B, S, S]
            m = m[:, None]
        logits = logits + m
    probs = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return out @ p["out_w"].astype(x.dtype) + p["out_b"].astype(x.dtype)


def mlp(p: Params, x: jnp.ndarray, act) -> jnp.ndarray:
    # weights may be weight-only-int8 (an `fc_w_scale` next to `fc_w`,
    # models/quantize.py — the reference's bnb c_fc/c_proj swap)
    if "fc_w_scale" in p:
        from leaf_tpu.models.quantize import mlp_weight
        h = x @ mlp_weight(p, "fc_w", x.dtype) + p["fc_b"].astype(x.dtype)
        h = act(h)
        return h @ mlp_weight(p, "proj_w", x.dtype) \
            + p["proj_b"].astype(x.dtype)
    h = x @ p["fc_w"].astype(x.dtype) + p["fc_b"].astype(x.dtype)
    h = act(h)
    return h @ p["proj_w"].astype(x.dtype) + p["proj_b"].astype(x.dtype)


def residual_block(p: Params, x: jnp.ndarray, mask, n_heads: int, act,
                   ln_eps: float, packed=None,
                   use_kernels: Optional[bool] = None) -> jnp.ndarray:
    """Pre-LN residual attention block (`transformer.py:254-265`)."""
    fused = False
    if packed is not None:
        from leaf_tpu.ops.packed_attention import (
            enabled, fused_attention_block, fused_block_supported)
        kern_ok = enabled() if use_kernels is None else use_kernels
        if kern_ok and fused_block_supported(x.shape[-1], x.dtype,
                                             x.shape[1]):
            x = fused_attention_block(
                {"ln_1": p["ln_1"], "attn": p["attn"]}, x, n_heads,
                packed[0], packed[1], ln_eps,
                jax.default_backend() != "tpu")
            fused = True
    if not fused:
        x = x + attention(p["attn"], layer_norm(p["ln_1"], x, ln_eps), mask,
                          n_heads, packed=packed, use_kernels=use_kernels)
    x = x + mlp(p["mlp"], layer_norm(p["ln_2"], x, ln_eps), act)
    return x


def transformer_stack(p: Params, x: jnp.ndarray, mask, n_heads: int, act,
                      ln_eps: float, remat: bool = False,
                      packed=None,
                      use_kernels: Optional[bool] = None) -> jnp.ndarray:
    """Run L stacked residual blocks via lax.scan (layer axis = 0)."""
    block = functools.partial(residual_block, mask=mask, n_heads=n_heads,
                              act=act, ln_eps=ln_eps, packed=packed,
                              use_kernels=use_kernels)
    if remat:
        block = jax.checkpoint(block)

    def body(h, layer_p):
        return block(layer_p, h), None

    x, _ = jax.lax.scan(body, x, p)
    return x
