"""Weight-only int8 quantization of transformer MLP linears.

TPU-native equivalent of the reference's bitsandbytes linear swap
(`open_clip_train/main.py:251-260` + `open_clip/utils.py:65-78`,
`replace_linear(model, bnb.nn..., include_modules=['c_fc', 'c_proj'])`):
the two MLP matmul weights of every transformer block — exactly the
reference's `c_fc`/`c_proj` set — are stored as int8 with per-output-
channel symmetric scales and dequantized inside the jitted forward.

Design notes (TPU):
  * This is *weight-only* quantization: activations stay bf16/fp32, so
    accuracy loss is tiny (max-abs symmetric per-channel) and nothing
    about the attack/eval numerics changes beyond the rounding.
  * The win is HBM: int8 halves the resident MLP weight bytes vs bf16
    (4x vs fp32) — MLPs are ~2/3 of ViT parameters — which is what lets
    ViT-bigG-class towers fit serving footprints on 16 GB chips.  It is
    NOT a FLOPs win: measured on v5e, XLA's int8 dot runs at ≈ the bf16
    rate for these shapes, so compute-bound steps do not speed up
    (docs/ROUND3.md measurement log).
  * `layers.mlp` consumes the quantized form transparently: a weight is
    quantized iff its `<name>_scale` sits next to it in the pytree, so
    every tower built on `init_block_stack` (CLIP text+vision, CoCa,
    SigLIP) supports it with no per-model code.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

Params = Dict[str, Any]

# MLP weight names inside a block stack — the reference's
# include_modules=['c_fc', 'c_proj'] equivalents (layers.py init)
_MLP_WEIGHTS = ("fc_w", "proj_w")


def quantize_weight(w: jnp.ndarray):
    """max-abs symmetric per-output-channel int8.

    w: [..., in, out] (stacked block weights keep leading axes).
    Returns (int8 weights, float32 scales broadcastable to w).
    """
    amax = jnp.max(jnp.abs(w), axis=-2, keepdims=True)  # per out column
    scale = jnp.where(amax > 0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_weight(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.float32) -> jnp.ndarray:
    return q.astype(dtype) * scale.astype(dtype)


def quantize_mlp_params(params: Params) -> Params:
    """Return a copy of a model params pytree with every block-stack
    MLP weight (`blocks/*/mlp/{fc_w,proj_w}`) replaced by int8 +
    `<name>_scale`.  Non-MLP weights are untouched (the reference swaps
    only c_fc/c_proj likewise)."""
    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k == "mlp" and isinstance(v, dict):
                q = dict(v)
                for name in _MLP_WEIGHTS:
                    if name in q and q[name].ndim >= 2 \
                            and name + "_scale" not in q:
                        q[name], q[name + "_scale"] = quantize_weight(q[name])
                out[k] = q
            else:
                out[k] = walk(v)
        return out

    return walk(params)


def mlp_weight(p: Params, name: str, dtype) -> jnp.ndarray:
    """The (dequantized) MLP weight — the single consumption point used
    by `layers.mlp`."""
    w = p[name]
    scale = p.get(name + "_scale")
    if scale is not None:
        return dequantize_weight(w, scale, dtype)
    return w.astype(dtype)


def quantized_nbytes(params: Params) -> int:
    """Total bytes of the pytree (diagnostic for the serving CLI)."""
    import jax
    return sum(x.size * x.dtype.itemsize
               for x in jax.tree.leaves(params))
