"""CoCa smoke tests on a tiny config (fast CI; parity vs the reference
torch implementation lives in test_reference_parity.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import coca as lcoca
from leaf_tpu.models.coca import CoCaConfig, MultimodalConfig
from leaf_tpu.models.config import TextConfig, VisionConfig
from leaf_tpu.models.loss import coca_loss


@pytest.fixture(scope="module")
def tiny_coca():
    cfg = CoCaConfig(
        name="coca-tiny", embed_dim=64,
        text=TextConfig(context_length=12, vocab_size=1000, width=64,
                        heads=2, layers=2, output_dim=64),
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, head_width=32, output_dim=64),
        multimodal=MultimodalConfig(context_length=12, width=64, heads=2,
                                    layers=2, vocab_size=1000),
        n_queries=8, attn_pooler_heads=2)
    params = lcoca.init_coca(jax.random.PRNGKey(0), cfg)
    return cfg, params


def make_batch(cfg, rng):
    B = 2
    S = cfg.text.context_length
    tokens = rng.integers(1, cfg.multimodal.vocab_size - 1, size=(B, S))
    tokens[:, 0] = 998
    tokens[:, 6] = 999
    tokens[:, 7:] = 0
    images = rng.standard_normal(
        (B, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    return jnp.asarray(images), jnp.asarray(tokens)


def test_coca_forward_shapes(tiny_coca):
    cfg, params = tiny_coca
    images, tokens = make_batch(cfg, np.random.default_rng(0))
    out = jax.jit(lambda p, im, t: lcoca.forward(p, cfg, im, t))(
        params, images, tokens)
    B, S = tokens.shape
    assert out["image_features"].shape == (B, cfg.embed_dim)
    assert out["text_features"].shape == (B, cfg.embed_dim)
    assert out["logits"].shape == (B, S - 1, cfg.multimodal.vocab_size)
    assert out["labels"].shape == (B, S - 1)
    # contrastive latents are normalised
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out["image_features"]), axis=-1), 1.0,
        rtol=1e-5)


def test_coca_loss_integration(tiny_coca):
    cfg, params = tiny_coca
    images, tokens = make_batch(cfg, np.random.default_rng(1))
    out = jax.jit(lambda p, im, t: lcoca.forward(p, cfg, im, t))(
        params, images, tokens)
    c, cap = coca_loss(out["image_features"], out["text_features"],
                       out["logits"], out["labels"],
                       out["logit_scale"])
    assert np.isfinite(float(c)) and np.isfinite(float(cap))
    # gradients flow to every tower
    def loss_fn(p):
        o = lcoca.forward(p, cfg, images, tokens)
        c, cap = coca_loss(o["image_features"], o["text_features"],
                           o["logits"], o["labels"], o["logit_scale"])
        return c + cap
    grads = jax.jit(jax.grad(loss_fn))(params)
    for tower in ("text", "visual", "text_decoder"):
        gmax = max(float(jnp.abs(g).max())
                   for g in jax.tree.leaves(grads[tower]))
        assert gmax > 0, tower


def test_coca_generate(tiny_coca):
    cfg, params = tiny_coca
    images, _ = make_batch(cfg, np.random.default_rng(2))
    out = jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=6, sot_token_id=998,
        eos_token_id=999))(images, jax.random.PRNGKey(0))
    out = np.asarray(out)
    assert out.shape == (2, cfg.multimodal.context_length)
    assert (out[:, 0] == 998).all()
    # generation is deterministic for top_k=1
    out2 = np.asarray(jax.jit(lambda im, k: lcoca.generate(
        params, cfg, im, k, seq_len=6, sot_token_id=998,
        eos_token_id=999))(images, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(out, out2)


def test_coca_registry():
    cfg = lcoca.get_coca_config("coca_ViT-B-32")
    assert cfg.embed_dim == 512
    assert cfg.text.context_length == 76
    with pytest.raises(KeyError):
        lcoca.get_coca_config("coca_nonexistent")
