"""Pallas TPU flash attention (fused QK^T → softmax → V).

The vision towers attend over 257 tokens (ViT-L/14 at 224px) for 24-48
layers; materialising the [B, h, S, S] logits in fp32 costs ~0.5 GB of
HBM round trips per layer at batch 128.  This kernel keeps the running
softmax in VMEM (the standard flash/online-softmax recurrence), writing
only the [S, d] output per (batch, head).

Scope: forward kernel with an online-softmax over KV blocks; optional
additive causal masking for the text tower.  The backward pass is a
standard XLA recompute (custom_vjp) — memory-efficient forward, known-
correct gradient.  Sequence lengths are padded to the 128-lane tile and
masked with -inf so padded keys never contribute.

Parity vs the reference einsum attention: tests/test_flash_attention.py
(interpret mode on CPU + the same path on TPU).

Status note (v5e, B=32 H=16 S=257 d=64, bf16): the kernel is correct on
hardware (bf16-level diff vs XLA) but XLA's fused attention is ~1.5×
faster at these CLIP-sized shapes — the [S, S] tile already fits VMEM
and XLA avoids the HBM round trip on its own.  The kernel therefore
stays opt-in (`mha_with_flash`); it becomes the building block for
longer-sequence models where the flash recurrence pays off.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_NEG_INF = -1e30


def _cdiv(a, b):
    return -(-a // b)


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, kv_blocks: int,
                 sm_scale: float, causal: bool, seq_len: int,
                 block_kv: int):
    """One (batch·head, q-block) program: online softmax over KV blocks.

    q_ref [1, Bq, d]; k_ref/v_ref [1, S_pad, d]; o_ref [1, Bq, d].
    """
    q = q_ref[0].astype(jnp.float32) * sm_scale
    Bq, d = q.shape
    q_start = pl.program_id(1) * Bq

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_kv, block_kv), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [Bq, block_kv]

        # mask padded keys (and causal keys) with -inf
        key_ids = (jax.lax.broadcasted_iota(jnp.int32, (Bq, block_kv), 1)
                   + i * block_kv)
        mask = key_ids < seq_len
        if causal:
            q_ids = (jax.lax.broadcasted_iota(jnp.int32, (Bq, block_kv), 0)
                     + q_start)
            mask = mask & (key_ids <= q_ids)
        s = jnp.where(mask, s, _NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((Bq, d), jnp.float32)
    m0 = jnp.full((Bq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((Bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, kv_blocks, body, (acc0, m0, l0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _flash_forward(q, k, v, sm_scale: float, causal: bool,
                   block_q: int, block_kv: int, interpret: bool):
    """q/k/v [B, H, S, d] → out [B, H, S, d]."""
    B, H, S, d = q.shape
    S_pad = max(block_q, block_kv, _cdiv(S, _LANE) * _LANE)

    def pad(x):
        if x.shape[2] == S_pad:
            return x
        cfg = [(0, 0)] * 4
        cfg[2] = (0, S_pad - S)
        return jnp.pad(x, cfg)

    qp, kp, vp = pad(q), pad(k), pad(v)
    qp = qp.reshape(B * H, S_pad, d)
    kp = kp.reshape(B * H, S_pad, d)
    vp = vp.reshape(B * H, S_pad, d)

    kernel = functools.partial(
        _attn_kernel, kv_blocks=S_pad // block_kv, sm_scale=sm_scale,
        causal=causal, seq_len=S, block_kv=block_kv)

    out = pl.pallas_call(
        kernel,
        grid=(B * H, S_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, S_pad, d), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out.reshape(B, H, S_pad, d)[:, :, :S]


def _reference_attention(q, k, v, sm_scale, causal):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * sm_scale
    if causal:
        S = q.shape[2]
        mask = np.triu(np.full((S, S), -np.inf, np.float32), 1)
        logits = logits + mask
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def flash_attention(q, k, v, sm_scale: Optional[float] = None,
                    causal: bool = False, block_q: int = 128,
                    block_kv: int = 128, interpret: bool = False):
    """Fused attention; q/k/v [B, H, S, d] → [B, H, S, d].

    Forward runs the Pallas kernel; backward recomputes attention with
    standard XLA ops (no [S, S] tensor is ever saved between fwd and
    bwd).  `interpret=True` runs the kernel in the Pallas interpreter
    (CPU-testable).
    """
    scale = (q.shape[-1] ** -0.5) if sm_scale is None else sm_scale
    return _flash_forward(q, k, v, scale, causal, block_q, block_kv,
                          interpret)


def _fwd(q, k, v, sm_scale, causal, block_q, block_kv, interpret):
    out = flash_attention(q, k, v, sm_scale, causal, block_q, block_kv,
                          interpret)
    return out, (q, k, v)


def _bwd(sm_scale, causal, block_q, block_kv, interpret, res, g):
    q, k, v = res
    scale = (q.shape[-1] ** -0.5) if sm_scale is None else sm_scale
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _reference_attention(q_, k_, v_, scale, causal),
        q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)


def mha_with_flash(qkv: jnp.ndarray, n_heads: int,
                   causal: bool = False, interpret: bool = False):
    """[B, S, 3D] fused-qkv convenience wrapper → [B, S, D]."""
    B, S, threeD = qkv.shape
    D = threeD // 3
    head_dim = D // n_heads
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, S, n_heads, head_dim).transpose(0, 2, 1, 3)

    out = flash_attention(heads(q), heads(k), heads(v), causal=causal,
                          interpret=interpret)
    return out.transpose(0, 2, 1, 3).reshape(B, S, D)
