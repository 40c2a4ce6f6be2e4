"""Golden-output regression tests (reference `tests/test_inference.py`
+ `tests/util_test.py`: deterministic random batches per model config,
expected encode_image/encode_text outputs stored as golden files,
fresh runs compared against them).

Golden files live in `tests/assets/golden/<model>.npz`.  A missing
golden is generated and committed (the reference's `util_test.py`
generation mode); set `LEAF_GOLDEN_REGEN=1` to regenerate after an
*intentional* numeric change — any unintentional drift in init or
forward math fails here first.

Big models are excluded for CI memory exactly as upstream
(`test_inference.py:20-31`).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "assets", "golden")

# CI-sized sweep: one per tower family that shares forward math with
# its larger siblings (ViT, ResNet, SigLIP/MAP-pool, ConvNeXt, and —
# since r4 — every timm-trunk family: EVA, ViTamin, swin, relpos ViT,
# FastViT, hybrid MCi-ViT)
MODELS = ["ViT-tiny-test", "RN50", "ViT-B-32", "ViT-B-16-SigLIP",
          "convnext_base", "eva-tiny-test", "vitamin-tiny-test",
          "swin-tiny-test", "relpos-tiny-test", "fastvit-tiny-test",
          "mci-vit-tiny-test"]


def _batches(cfg):
    rng = np.random.default_rng(42)
    img = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    toks = rng.integers(1, min(cfg.text.vocab_size, 49405),
                        size=(2, cfg.text.context_length)).astype(np.int32)
    toks[:, 0] = cfg.text.vocab_size - 2 if cfg.text.vocab_size < 49408 \
        else 49406
    toks[:, -1] = cfg.text.vocab_size - 1 if cfg.text.vocab_size < 49408 \
        else 49407
    return img, toks


@pytest.mark.parametrize("name", MODELS)
def test_golden_outputs(name):
    cfg = get_model_config(name)
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    img, toks = _batches(cfg)
    image_features = np.asarray(
        lclip.encode_image_model(params, cfg, jnp.asarray(img),
                                 normalize=True), np.float32)
    text_features = np.asarray(
        lclip.encode_text(params["text"], cfg.text, jnp.asarray(toks),
                          normalize=True), np.float32)

    path = os.path.join(GOLDEN_DIR, name.replace("/", "-") + ".npz")
    if os.environ.get("LEAF_GOLDEN_REGEN") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, image_features=image_features,
                 text_features=text_features)
        return  # just generated — nothing to compare against
    g = np.load(path)
    np.testing.assert_allclose(image_features, g["image_features"],
                               atol=2e-4, rtol=2e-3, err_msg=name)
    np.testing.assert_allclose(text_features, g["text_features"],
                               atol=2e-4, rtol=2e-3, err_msg=name)
