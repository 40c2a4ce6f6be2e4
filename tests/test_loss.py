"""Distributed-loss tests on the 8-device virtual CPU mesh.

The key invariant (which the reference could never test, its CI being
world_size=1): sharded local-loss / ring-loss values must equal the
single-device global computation.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leaf_tpu.models.loss import (
    clip_loss,
    coca_loss,
    distill_clip_loss,
    siglip_loss,
)
from leaf_tpu.parallel import create_mesh


@pytest.fixture(scope="module")
def feats():
    rng = np.random.default_rng(0)
    B, D = 16, 8
    img = rng.standard_normal((B, D)).astype(np.float32)
    txt = rng.standard_normal((B, D)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.asarray(img), jnp.asarray(txt)


def shard_call(fn, *arrays):
    mesh = create_mesh()
    sharded = jax.shard_map(fn, mesh=mesh,
                            in_specs=P("data"), out_specs=P())
    return sharded(*arrays)


def test_clip_loss_local_matches_global(feats):
    img, txt = feats
    scale = 10.0
    ref = clip_loss(img, txt, scale)

    local = shard_call(
        functools.partial(clip_loss, logit_scale=scale, axis_name="data",
                          local_loss=True), img, txt)
    np.testing.assert_allclose(np.asarray(local), np.asarray(ref), rtol=1e-5)

    nonlocal_ = shard_call(
        functools.partial(clip_loss, logit_scale=scale, axis_name="data",
                          local_loss=False), img, txt)
    np.testing.assert_allclose(np.asarray(nonlocal_), np.asarray(ref),
                               rtol=1e-5)


def test_clip_loss_grads_match(feats):
    img, txt = feats
    scale = 10.0
    g_ref = jax.grad(lambda a, b: clip_loss(a, b, scale))(img, txt)

    def sharded_loss(a, b):
        fn = functools.partial(clip_loss, logit_scale=scale,
                               axis_name="data", local_loss=True)
        mesh = create_mesh()
        return jax.shard_map(fn, mesh=mesh, in_specs=P("data"),
                             out_specs=P())(a, b)

    g_shard = jax.grad(sharded_loss)(img, txt)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-6)


def test_siglip_ring_matches_global(feats):
    img, txt = feats
    scale, bias = 10.0, -2.0
    ref = siglip_loss(img, txt, scale, bias)  # single device: full batch

    # pmean over shards of (local sum / local B) == global sum / global B
    ring = shard_call(
        functools.partial(siglip_loss, logit_scale=scale, logit_bias=bias,
                          axis_name="data"), img, txt)
    np.testing.assert_allclose(np.asarray(ring), np.asarray(ref), rtol=1e-5)


def test_coca_loss_caption_masking():
    rng = np.random.default_rng(1)
    B, S, V = 4, 6, 11
    logits = jnp.asarray(rng.standard_normal((B, S, V)).astype(np.float32))
    labels = jnp.asarray(rng.integers(1, V, size=(B, S)))
    labels = labels.at[:, -2:].set(0)  # pad
    img = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    txt = jnp.asarray(rng.standard_normal((B, 8)).astype(np.float32))
    c, cap = coca_loss(img, txt, logits, labels, 10.0)
    assert np.isfinite(float(c)) and np.isfinite(float(cap))
    # fully-padded labels → zero caption loss contribution change
    cap_all_pad = coca_loss(img, txt, logits, jnp.zeros_like(labels), 10.0)[1]
    np.testing.assert_allclose(float(cap_all_pad), 0.0, atol=1e-6)


def test_distill_clip_loss_runs(feats):
    img, txt = feats
    c, d = distill_clip_loss(img, txt, 10.0, img, txt, 10.0)
    assert np.isfinite(float(c)) and np.isfinite(float(d))
    # distilling from identical teacher logits == softmax entropy ≥ 0
    assert float(d) >= 0
