"""Pallas flash-attention parity (interpreter mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.ops.flash_attention import (
    _reference_attention,
    flash_attention,
    mha_with_flash,
)


def make_qkv(B, H, S, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((B, H, S, d))
                             .astype(np.float32)) for _ in range(3))


@pytest.mark.parametrize("S", [64, 128, 257])
def test_forward_parity(S):
    q, k, v = make_qkv(2, 3, S, 64)
    out = flash_attention(q, k, v, interpret=True)
    ref = _reference_attention(q, k, v, 64 ** -0.5, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_forward_parity_causal():
    q, k, v = make_qkv(2, 2, 77, 64, seed=1)
    out = flash_attention(q, k, v, causal=True, interpret=True)
    ref = _reference_attention(q, k, v, 64 ** -0.5, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_gradient_matches_reference():
    q, k, v = make_qkv(1, 2, 64, 64, seed=2)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, None, False, 128, 128, True).sum()

    def loss_ref(q, k, v):
        return _reference_attention(q, k, v, 64 ** -0.5, False).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_mha_wrapper_matches_layers_attention():
    from leaf_tpu.models import layers
    rng = np.random.default_rng(3)
    B, S, D, H = 2, 50, 128, 4
    x = jnp.asarray(rng.standard_normal((B, S, D)).astype(np.float32))
    p = {
        "qkv_w": jnp.asarray(rng.standard_normal((D, 3 * D)).astype(np.float32) * 0.05),
        "qkv_b": jnp.zeros((3 * D,)),
        "out_w": jnp.eye(D),
        "out_b": jnp.zeros((D,)),
    }
    ref = layers.attention(p, x, None, H)
    qkv = x @ p["qkv_w"] + p["qkv_b"]
    ours = mha_with_flash(qkv, H, interpret=True)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
