"""Pallas TPU kernel: block-diagonal ("packed") multi-head attention.

The LEAF attack scores ~6400 short (≈16-token) candidate sequences per
dispatch.  `leaf_tpu/models/clip.py` packs G of them into one 128-token
row with a block-diagonal causal mask, which fixes the MXU shapes of
the *matmuls* — but XLA's attention on those packed rows still
materialises fp32 logits `[R, H, 128, 128]` in HBM and relayouts
q/k/v to head-major `[R, H, L, d]`, which costs ~half of the packed
encoder's wall time (measured v5e: 176 ms → 86 ms with attention
ablated; GEMMs alone run at ~180 TF/s).

This kernel removes all of that:

  * input is the fused qkv GEMM output in **token-major** layout
    `[R, L, 3D]` — no head transpose ever touches HBM;
  * one grid program per row computes every head's `[L, L]` logits,
    softmax, and PV product entirely in VMEM (fp32 accumulation,
    identical numerics to `layers.attention`);
  * the block-diagonal+causal mask is derived from iota in-register —
    no `[L, L]` mask tensor in HBM;
  * output is written back token-major `[R, L, D]`, feeding the out
    projection GEMM directly.

Measured on the bench config (800 rows × 128 tokens × 12 heads, ViT-L
text): packed encode 176 ms → 140 ms (+25%).

The backward pass recomputes attention with plain XLA ops
(`custom_vjp`): scoring dispatches are forward-only, and the train
step's packed batch is tiny (16 rows), so bwd is never hot.

GSPMD caveat: a `pallas_call` is an opaque custom call — XLA cannot
partition it over a device mesh.  `enabled()` therefore auto-activates
the kernel only on a single-device TPU process.  Multi-chip runs get
the kernels through `shard_map`: the fused LEAF phases
(`train/fused.py`) and the contrastive loss bodies run per-shard under
`shard_map` over the `data` axis and pass
`use_kernels=enabled(n_devices=1)` down the encode path, so every
shard — being local to one device — runs the kernel exactly as a
single chip would.

No reference counterpart: the reference (LIONS-EPFL/LEAF) has no native
code at all and scores candidates in dynamically-shaped torch batches
(`utils_attacks.py:297-393`).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def enabled(n_devices: Optional[int] = None) -> bool:
    """Should the packed-attention kernel be used for this trace?

    LEAF_TPU_PACKED_ATTN=1 forces it on (interpret mode off-TPU),
    =0 forces it off; unset → auto: TPU backend, single device.
    """
    flag = os.environ.get("LEAF_TPU_PACKED_ATTN", "").strip()
    if flag == "0":
        return False
    if flag == "1":
        return True
    if jax.default_backend() != "tpu":
        return False
    n = len(jax.devices()) if n_devices is None else n_devices
    return n == 1


def packed_attention_supported(width: int, dtype,
                               seq_len: int) -> bool:
    """VMEM gate for the standalone kernel: one grid program holds the
    double-buffered qkv-in `[1, L_pad, 3D]` and out `[1, L_pad, D]`
    blocks plus an fp32 `[L_pad, L_pad]` logits/probs temporary.  fp32
    ViT-L vision shapes (D=1024, L_pad=384) exceed the 16 MB scoped
    budget (measured: compile-time VMEM OOM at 16.61 MB) — such shapes
    must take the XLA path."""
    itemsize = jnp.dtype(dtype).itemsize
    l_pad = _round_up(seq_len, _LANE)
    blocks = itemsize * l_pad * 4 * width * 2     # in+out, double-buffered
    scratch = 4 * l_pad * l_pad * 2               # fp32 logits + probs
    return blocks + scratch < 13 * 1024 * 1024


def _kernel(qkv_ref, o_ref, *, n_heads: int, head_dim: int, group_len: int,
            seq_len: int, sm_scale: float, causal: bool):
    qkv = qkv_ref[0]
    L = qkv.shape[0]
    D = n_heads * head_dim
    ids = jax.lax.iota(jnp.int32, L)
    valid = ids.reshape(1, L) < seq_len
    mask = valid & (ids.reshape(L, 1) // group_len == ids.reshape(1, L) // group_len)
    if causal:
        mask = mask & (ids.reshape(1, L) <= ids.reshape(L, 1))
    for h in range(n_heads):
        q = qkv[:, h * head_dim:(h + 1) * head_dim]
        k = qkv[:, D + h * head_dim:D + (h + 1) * head_dim]
        v = qkv[:, 2 * D + h * head_dim:2 * D + (h + 1) * head_dim]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where(mask, s, _NEG)
        p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _reference(qkv: jnp.ndarray, n_heads: int, group_len: int,
               causal: bool) -> jnp.ndarray:
    """Token-major XLA attention with the same block-diagonal semantics
    (numerics of `layers.attention`); used for the backward recompute
    and as the parity oracle in tests."""
    R, L, threeD = qkv.shape
    D = threeD // 3
    hd = D // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(R, L, n_heads, hd)
    k = k.reshape(R, L, n_heads, hd)
    v = v.reshape(R, L, n_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * (hd ** -0.5)
    ids = jnp.arange(L)
    mask = ids[:, None] // group_len == ids[None, :] // group_len
    if causal:
        mask = mask & (ids[None, :] <= ids[:, None])
    s = jnp.where(mask, s, _NEG)
    p = jax.nn.softmax(s, axis=-1).astype(qkv.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                   preferred_element_type=jnp.float32)
    return o.astype(qkv.dtype).reshape(R, L, D)


def _forward(qkv, n_heads: int, group_len: int, causal: bool,
             interpret: bool):
    R, L, threeD = qkv.shape
    D = threeD // 3
    L_pad = _round_up(L, _LANE)
    padded = qkv if L_pad == L else jnp.pad(qkv, ((0, 0), (0, L_pad - L),
                                                  (0, 0)))
    kern = functools.partial(
        _kernel, n_heads=n_heads, head_dim=D // n_heads,
        group_len=group_len, seq_len=L, sm_scale=(D // n_heads) ** -0.5,
        causal=causal)
    out = pl.pallas_call(
        kern,
        grid=(R,),
        in_specs=[pl.BlockSpec((1, L_pad, threeD), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, L_pad, D), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L_pad, D), qkv.dtype),
        interpret=interpret,
    )(padded)
    return out if L_pad == L else out[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def packed_attention(qkv: jnp.ndarray, n_heads: int, group_len: int,
                     causal: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused block-diagonal MHA.  qkv `[R, L, 3D]` token-major (the fused
    qkv projection's output, bias already added) → `[R, L, D]`.

    Rows hold `L // group_len` independent sequences of `group_len`
    tokens each; attention never crosses a `group_len` boundary.
    `group_len == L` is ordinary (causal) attention.  `interpret=True`
    runs the Pallas interpreter (CPU-testable).
    """
    return _forward(qkv, n_heads, group_len, causal, interpret)


def _fwd(qkv, n_heads, group_len, causal, interpret):
    return packed_attention(qkv, n_heads, group_len, causal, interpret), qkv


def _bwd(n_heads, group_len, causal, interpret, qkv, g):
    _, vjp = jax.vjp(
        lambda t: _reference(t, n_heads, group_len, causal), qkv)
    return vjp(g)


packed_attention.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# Fused attention block: ln_1 → qkv → attention → out proj → +residual
# ---------------------------------------------------------------------------
#
# One step further than `packed_attention`: the whole pre-LN attention
# sub-block runs in a single kernel with the qkv/out weights resident in
# VMEM across grid steps, so the activations make exactly one
# HBM round trip per block.  Measured on the bench config: encode
# 140 ms (packed_attention) → 114 ms.  Fusing the MLP in as well was
# measured *slower* (116-122 ms) — XLA's GEMM+GELU fusion already runs
# at chip peak — so the MLP stays outside.

def _block_kernel(x_ref, l1s_ref, l1b_ref, qkvw_ref, qkvb_ref, outw_ref,
                  outb_ref, o_ref, *, n_heads: int, head_dim: int,
                  group_len: int, seq_len: int, sm_scale: float,
                  causal: bool, rows: int, ln_eps: float):
    L = x_ref.shape[1]
    D = n_heads * head_dim
    x = x_ref[:].reshape(rows * L, D)
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + ln_eps)
         * l1s_ref[:].astype(jnp.float32)
         + l1b_ref[:].astype(jnp.float32)).astype(x.dtype)
    qkv = jax.lax.dot_general(h, qkvw_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    qkv = (qkv + qkvb_ref[:].astype(jnp.float32)).astype(x.dtype)
    ids = jax.lax.iota(jnp.int32, L)
    valid = ids.reshape(1, L) < seq_len
    mask = valid & (ids.reshape(L, 1) // group_len
                    == ids.reshape(1, L) // group_len)
    if causal:
        mask = mask & (ids.reshape(1, L) <= ids.reshape(L, 1))
    outs = []
    for r in range(rows):
        row = []
        for hh in range(n_heads):
            q = qkv[r * L:(r + 1) * L, hh * head_dim:(hh + 1) * head_dim]
            k = qkv[r * L:(r + 1) * L,
                    D + hh * head_dim:D + (hh + 1) * head_dim]
            v = qkv[r * L:(r + 1) * L,
                    2 * D + hh * head_dim:2 * D + (hh + 1) * head_dim]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            s = jnp.where(mask, s, _NEG)
            p = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            row.append(jax.lax.dot_general(
                p, v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(x.dtype))
        outs.append(jnp.concatenate(row, axis=-1))
    attn = jnp.concatenate(outs, axis=0)
    o = jax.lax.dot_general(attn, outw_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    x = x + (o + outb_ref[:].astype(jnp.float32)).astype(x.dtype)
    o_ref[:] = x.reshape(rows, L, D)


def _block_reference(p, x, n_heads: int, group_len: int, causal: bool,
                     ln_eps: float) -> jnp.ndarray:
    """XLA recompute of the fused block (same numerics as
    `layers.residual_block`'s attention half); backward + test oracle."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    h = ((x32 - mu) * jax.lax.rsqrt(var + ln_eps)
         * p["ln_1"]["scale"].astype(jnp.float32)
         + p["ln_1"]["bias"].astype(jnp.float32)).astype(x.dtype)
    a = p["attn"]
    qkv = h @ a["qkv_w"].astype(x.dtype) + a["qkv_b"].astype(x.dtype)
    o = _reference(qkv, n_heads, group_len, causal)
    return x + (o @ a["out_w"].astype(x.dtype) + a["out_b"].astype(x.dtype))


def _pick_rows(R: int, L: int, D: int, itemsize: int) -> Optional[int]:
    """Largest rows-per-program in {8,4,2,1} dividing R with a
    comfortable VMEM footprint (weights + double-buffered blocks);
    None when even rows=1 would blow the budget (the caller must use
    the unfused path instead of launching an over-VMEM kernel)."""
    weights = itemsize * (D * 3 * D + D * D)
    for rows in (8, 4, 2, 1):
        if R % rows:
            continue
        acts = itemsize * rows * L * (2 * D + 3 * D) * 2   # in/out dbl-buf + qkv
        if weights + acts < 13 * 1024 * 1024:
            return rows
    return None


def _block_forward(p, x, n_heads, group_len, causal, ln_eps, interpret):
    R, L, D = x.shape
    L_pad = _round_up(L, _LANE)
    xp = x if L_pad == L else jnp.pad(x, ((0, 0), (0, L_pad - L), (0, 0)))
    rows = _pick_rows(R, L_pad, D, jnp.dtype(x.dtype).itemsize)
    if rows is None:
        raise ValueError(
            f"fused block kernel over VMEM budget (D={D}, L_pad={L_pad}, "
            f"{x.dtype}); gate with fused_block_supported(D, dtype, L)")
    kern = functools.partial(
        _block_kernel, n_heads=n_heads, head_dim=D // n_heads,
        group_len=group_len, seq_len=L, sm_scale=(D // n_heads) ** -0.5,
        causal=causal, rows=rows, ln_eps=ln_eps)

    def full(*s):
        return pl.BlockSpec(s, lambda r: (0,) * len(s),
                            memory_space=pltpu.VMEM)

    w = lambda t: t.astype(x.dtype)
    a = p["attn"]
    out = pl.pallas_call(
        kern,
        grid=(R // rows,),
        in_specs=[
            pl.BlockSpec((rows, L_pad, D), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            full(D), full(D), full(D, 3 * D), full(3 * D),
            full(D, D), full(D),
        ],
        out_specs=pl.BlockSpec((rows, L_pad, D), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L_pad, D), x.dtype),
        interpret=interpret,
    )(xp, p["ln_1"]["scale"].astype(jnp.float32),
      p["ln_1"]["bias"].astype(jnp.float32), w(a["qkv_w"]),
      w(a["qkv_b"]), w(a["out_w"]), w(a["out_b"]))
    return out if L_pad == L else out[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def fused_attention_block(p, x: jnp.ndarray, n_heads: int, group_len: int,
                          causal: bool = True, ln_eps: float = 1e-5,
                          interpret: bool = False) -> jnp.ndarray:
    """`x + out_proj(packed_attention(qkv_proj(ln_1(x))))` in one kernel.

    p: a residual block's `{ln_1: {scale, bias}, attn: {qkv_w, qkv_b,
    out_w, out_b}}` pytree (fp32 leaves fine — cast to x.dtype like the
    XLA path).  x `[R, L, D]` token-major packed rows.

    Falls back to `packed_attention` + XLA GEMMs when the weights would
    not fit VMEM (wide towers): callers should use
    `fused_block_supported(D, dtype)` to decide.
    """
    return _block_forward(p, x, n_heads, group_len, causal, ln_eps,
                          interpret)


def fused_block_supported(width: int, dtype,
                          seq_len: Optional[int] = None) -> bool:
    """Weights (3D² + D²) AND the rows=1 activation blocks must fit the
    VMEM budget — a weights-only gate admitted fp32 ViT-B vision
    shapes whose kernel footprint exceeded it."""
    itemsize = jnp.dtype(dtype).itemsize
    if itemsize * 4 * width * width >= 10 * 1024 * 1024:
        return False
    if seq_len is not None:
        return _pick_rows(1, _round_up(seq_len, _LANE), width,
                          itemsize) is not None
    return True


def _block_fwd(p, x, n_heads, group_len, causal, ln_eps, interpret):
    out = fused_attention_block(p, x, n_heads, group_len, causal, ln_eps,
                                interpret)
    return out, (p, x)


def _block_bwd(n_heads, group_len, causal, ln_eps, interpret, res, g):
    p, x = res
    _, vjp = jax.vjp(
        lambda p_, x_: _block_reference(p_, x_, n_heads, group_len, causal,
                                        ln_eps), p, x)
    return vjp(g)


fused_attention_block.defvjp(_block_fwd, _block_bwd)
