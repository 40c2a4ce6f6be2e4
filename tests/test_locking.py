"""LiT-style tower locking (train/locking.py) — reference
`transformer.py:541-571` vision groups / `hf_model.py:171-186` text
layers, expressed as optimizer update masks."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.train.locking import apply_locking, lock_multipliers


def _args(**kw):
    ns = argparse.Namespace(
        lock_image=False, lock_image_unlocked_groups=0,
        lock_text=False, lock_text_unlocked_layers=0,
        lock_text_freeze_layer_norm=True)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def _step(params, args):
    """One optimizer step with all-ones grads; returns |delta| pytree."""
    tx = apply_locking(optax.sgd(0.1), params, args)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    new = optax.apply_updates(params, updates)
    return jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))),
                        params, new)


@pytest.fixture(scope="module")
def params():
    cfg = get_model_config("ViT-tiny-test")   # 2-layer towers
    return lclip.init_clip(jax.random.PRNGKey(0), cfg)


def test_full_image_lock(params):
    d = _step(params, _args(lock_image=True))
    assert all(v == 0.0 for v in jax.tree.leaves(d["visual"]))
    assert all(v > 0.0 for v in jax.tree.leaves(d["text"]))
    assert d["logit_scale"] > 0.0


def test_unlocked_groups_one_trains_proj_only(params):
    d = _step(params, _args(lock_image=True, lock_image_unlocked_groups=1))
    assert d["visual"]["proj"] > 0.0
    rest = dict(d["visual"])
    rest.pop("proj")
    assert all(v == 0.0 for v in jax.tree.leaves(rest))


def test_unlocked_groups_two_adds_last_block(params):
    d = _step(params, _args(lock_image=True, lock_image_unlocked_groups=2))
    assert d["visual"]["proj"] > 0.0
    assert d["visual"]["ln_post"]["scale"] > 0.0
    # stacked leaves: layer 0 frozen, layer 1 (last) trains
    tx = apply_locking(optax.sgd(0.1), params,
                       _args(lock_image=True, lock_image_unlocked_groups=2))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    qkv = np.asarray(updates["visual"]["blocks"]["attn"]["qkv_w"])
    assert np.all(qkv[0] == 0.0) and np.all(qkv[1] != 0.0)
    assert d["visual"]["patch_embedding"] == 0.0
    assert d["visual"]["ln_pre"]["scale"] == 0.0


def test_all_groups_unlocked_trains_everything(params):
    # 2 layers → L+2 = 4 groups
    d = _step(params, _args(lock_image=True, lock_image_unlocked_groups=4))
    assert all(v > 0.0 for v in jax.tree.leaves(d["visual"]))


def test_text_lock_full(params):
    d = _step(params, _args(lock_text=True))
    assert all(v == 0.0 for v in jax.tree.leaves(d["text"]))
    assert all(v > 0.0 for v in jax.tree.leaves(d["visual"]))


def test_text_unlocked_last_layer(params):
    args = _args(lock_text=True, lock_text_unlocked_layers=1)
    d = _step(params, args)
    assert d["text"]["token_embedding"] == 0.0
    assert d["text"]["ln_final"]["scale"] > 0.0
    assert d["text"]["text_projection"] > 0.0
    tx = apply_locking(optax.sgd(0.1), params, args)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    fc = np.asarray(updates["text"]["blocks"]["mlp"]["fc_w"])
    assert np.all(fc[0] == 0.0) and np.all(fc[1] != 0.0)


def test_text_lock_layer_norms_stay_trainable(params):
    d = _step(params, _args(lock_text=True,
                            lock_text_freeze_layer_norm=False))
    tx = apply_locking(optax.sgd(0.1), params,
                       _args(lock_text=True,
                             lock_text_freeze_layer_norm=False))
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    ln1 = np.asarray(updates["text"]["blocks"]["ln_1"]["scale"])
    assert np.all(ln1 != 0.0)           # frozen layers' LN still trains
    assert d["text"]["token_embedding"] == 0.0
    assert d["text"]["ln_final"]["scale"] > 0.0


def test_non_vit_partial_lock_rejected():
    cfg = get_model_config("RN50")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError, match="ViT"):
        lock_multipliers(params, lock_image=True,
                         lock_image_unlocked_groups=1)
    # full lock works for any tower
    mult = lock_multipliers(params, lock_image=True)
    assert all(bool(jnp.all(m == 0.0))
               for m in jax.tree.leaves(mult["visual"]))


def test_contrastive_driver_lock_image_e2e(tmp_path):
    from leaf_tpu.train.contrastive_driver import main

    out = main(["--model", "ViT-tiny-test", "--dataset-type", "synthetic",
                "--train-num-samples", "16", "--batch-size", "8",
                "--epochs", "1", "--warmup", "1", "--lr", "1e-2",
                "--logs", str(tmp_path), "--name", "lock",
                "--lock-image"])
    cfg = get_model_config("ViT-tiny-test")
    init = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    final = out["state"].text_params
    for a, b in zip(jax.tree.leaves(init["visual"]),
                    jax.tree.leaves(final["visual"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # text moved
    moved = any(float(jnp.max(jnp.abs(a - b))) > 0
                for a, b in zip(jax.tree.leaves(init["text"]),
                                jax.tree.leaves(final["text"])))
    assert moved
