"""HF (Flax) text-tower adapter tests — mirrors the reference's
`tests/test_hf_model.py` (pooler variants construct + forward)."""
import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from leaf_tpu.models.hf_text import POOLERS, HFTextTower  # noqa: E402


@pytest.fixture(scope="module")
def roberta_config():
    return transformers.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64,
        max_position_embeddings=40)


@pytest.mark.parametrize("pooler", list(POOLERS))
def test_pooler_variants_forward(roberta_config, pooler):
    tower = HFTextTower(roberta_config, output_dim=16, pooler_type=pooler)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 99, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0
    out = tower(tower.params, ids, mask)
    assert out.shape == (2, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_mlp_proj_and_normalize(roberta_config):
    tower = HFTextTower(roberta_config, output_dim=16, proj_type="mlp")
    ids = np.ones((2, 8), np.int32) * 5
    out = tower(tower.params, ids, normalize=True)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                               1.0, rtol=1e-5)


def test_mean_pooler_respects_mask(roberta_config):
    tower = HFTextTower(roberta_config, output_dim=16)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 99, size=(1, 10)).astype(np.int32)
    mask_full = np.ones((1, 10), np.int32)
    mask_half = mask_full.copy()
    mask_half[0, 5:] = 0
    a = np.asarray(tower(tower.params, ids, mask_full))
    b = np.asarray(tower(tower.params, ids, mask_half))
    assert np.abs(a - b).max() > 1e-6  # masked tokens change the mean


def test_custom_text_clip_bundle(roberta_config):
    from leaf_tpu.models.config import VisionConfig
    from leaf_tpu.models.hf_text import create_custom_text_clip
    tower = HFTextTower(roberta_config, output_dim=16)
    vcfg = VisionConfig(image_size=32, patch_size=16, width=32, layers=1,
                        head_width=16, output_dim=16)
    params, enc_img, enc_txt = create_custom_text_clip(vcfg, tower, 16)
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.standard_normal((2, 32, 32, 3))
                         .astype(np.float32))
    ids = rng.integers(3, 99, size=(2, 8)).astype(np.int32)
    fi = enc_img(params, images, normalize=True)
    ft = enc_txt(params, ids, normalize=True)
    assert fi.shape == ft.shape == (2, 16)
