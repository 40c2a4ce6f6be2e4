"""Tests: conversion CLI round-trips, PEZ inversion, CLIPScore,
profiler, contrastive trainer."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from leaf_tpu.convert import params_to_openclip, verify_parity
from leaf_tpu.evals.clipscore import (
    clip_score,
    compute_clipscores,
    is_black_image,
)
from leaf_tpu.evals.pez import nn_project, optimize_prompt
from leaf_tpu.models import clip as lclip, interop
from leaf_tpu.models.config import get_model_config
from leaf_tpu.tokenizer import get_tokenizer
from leaf_tpu.train.contrastive import (
    evaluate_contrastive,
    get_clip_metrics,
    make_contrastive_train_step,
)
from leaf_tpu.train.optim import make_optimizer
from leaf_tpu.train.schedules import cosine_lr
from leaf_tpu.train.step import TrainState


@pytest.fixture(scope="module")
def tiny():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    return cfg, params


def test_openclip_roundtrip(tiny):
    cfg, params = tiny
    sd = params_to_openclip(params, cfg)
    back = interop.openclip_to_params(sd, cfg)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_verify_parity_passes_both_formats(tiny):
    cfg, params = tiny
    verify_parity(params, cfg, params_to_openclip(params, cfg), "openclip")
    verify_parity(params, cfg, interop.params_to_hf(params, cfg), "hf")


def test_pez_nn_project(tiny):
    cfg, params = tiny
    table = params["text"]["token_embedding"]
    # querying rows of the table must return those rows
    ids = jnp.asarray([[5, 17, 300]])
    proj, idx = nn_project(table[ids], table)
    assert idx.tolist() == [[5, 17, 300]]
    np.testing.assert_allclose(np.asarray(proj), np.asarray(table[ids]))


def test_pez_optimize_prompt_improves_sim(tiny):
    cfg, params = tiny
    tok = get_tokenizer()
    # target = embedding of a real caption
    target = lclip.encode_text(params["text"], cfg.text,
                               jnp.asarray(tok(["a photo of a cat"])),
                               cfg.quick_gelu)
    out = optimize_prompt(params["text"], cfg, target, prompt_len=4,
                          iters=10, lr=0.3, seed=0)
    assert len(out["ids"]) == 4
    assert out["sim"] >= out["per_step_sims"][0] - 1e-6
    decoded = tok.decode(out["ids"])
    assert isinstance(decoded, str) and decoded


def test_clipscore(tiny):
    a = np.asarray([[1.0, 0.0], [0.0, 1.0]])
    assert clip_score(a, a).tolist() == [100.0, 100.0]
    b = np.asarray([[-1.0, 0.0], [0.0, 1.0]])
    assert clip_score(a, b).tolist() == [0.0, 100.0]  # clamped at 0
    assert is_black_image(np.zeros((8, 8, 3)))
    assert not is_black_image(np.full((8, 8, 3), 0.5))


def test_compute_clipscores_filters_black(tiny):
    cfg, params = tiny
    tok = get_tokenizer()
    rng = np.random.default_rng(0)
    gen = rng.uniform(0, 1, size=(3, 64, 64, 3)).astype(np.float32)
    gen[1] = 0.0  # NSFW-blanked
    out = compute_clipscores(params, cfg, tok,
                             ["a cat", "a dog", "a bird"], gen,
                             real_images=gen.copy())
    assert out["n"] == 2 and out["n_black_filtered"] == 1
    assert "clipscore_gen_caption" in out
    assert out["clipscore_gen_real"] == pytest.approx(100.0, abs=1e-3)


def test_profiler(tiny):
    from leaf_tpu.utils.profiler import profile_model
    row = profile_model("ViT-tiny-test")
    assert row["mparams"] > 3  # token embedding dominates
    assert row["gflops_text"] > 0
    assert row["gflops_image"] > 0


def test_get_clip_metrics_perfect():
    f = np.eye(4, 8, dtype=np.float32)
    m = get_clip_metrics(f, f, 100.0)
    assert m["image_to_text_R@1"] == 1.0
    assert m["text_to_image_mean_rank"] == 1.0


def test_contrastive_train_step_and_eval(tiny):
    cfg, params = tiny
    tok = get_tokenizer()
    tx = make_optimizer(cosine_lr(1e-4, 1, 10), weight_decay=1e-4)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step = make_contrastive_train_step(cfg, tx)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (4, 64, 64, 3))
                         .astype(np.float32))
    tokens = jnp.asarray(tok(["a cat", "a dog", "a car", "a bird"]))
    state, metrics = step(state, images, tokens)
    l0 = float(metrics["loss"])
    assert np.isfinite(l0)
    state, metrics = step(state, images, tokens)
    assert float(metrics["logit_scale"]) <= 100.0 + 1e-3

    loader = [(np.asarray(images), ["a cat", "a dog", "a car", "a bird"])]
    m = evaluate_contrastive(state.text_params, cfg, loader, tok)
    assert "clip_val_loss" in m and m["num_samples"] == 4


def test_contrastive_train_step_sharded(tiny):
    cfg, params = tiny
    from leaf_tpu.parallel import create_mesh
    tok = get_tokenizer()
    mesh = create_mesh()
    tx = make_optimizer(cosine_lr(1e-4, 1, 10), weight_decay=1e-4)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step_sharded = make_contrastive_train_step(cfg, tx, mesh=mesh)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(-1, 1, (8, 64, 64, 3))
                         .astype(np.float32))
    texts = [f"sentence {i}" for i in range(8)]
    tokens = jnp.asarray(tok(texts))
    state2, metrics = step_sharded(state, images, tokens)
    # sharded local-loss step must equal the single-device step
    state_ref = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    step_ref = make_contrastive_train_step(cfg, tx)
    _, metrics_ref = step_ref(state_ref, images, tokens)
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics_ref["loss"]), rtol=1e-4)


def test_accum_contrastive_feature_cache(tiny):
    """k microbatches with the feature-cache trick ≈ one full-batch
    step (identical loss and near-identical update)."""
    from leaf_tpu.train.contrastive import (
        make_accum_contrastive_train_step,
    )
    from leaf_tpu.tokenizer import get_tokenizer
    cfg, params = tiny
    tok = get_tokenizer()
    tx = make_optimizer(cosine_lr(1e-4, 1, 10), weight_decay=0.0)
    rng = np.random.default_rng(0)
    images = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    texts = [f"caption number {i}" for i in range(8)]
    tokens = np.asarray(tok(texts))

    state_a = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    full_step = make_contrastive_train_step(cfg, tx)
    _, m_full = full_step(state_a, jnp.asarray(images), jnp.asarray(tokens))

    state_b = TrainState.create(jax.tree.map(jnp.copy, params), tx)
    accum_step = make_accum_contrastive_train_step(cfg, tx, accum_freq=2)
    state_b2, m_accum = accum_step(state_b,
                                   jnp.asarray(images.reshape(2, 4, 64, 64, 3)),
                                   jnp.asarray(tokens.reshape(2, 4, -1)))
    # the feature-cache trick reproduces the full-batch loss
    np.testing.assert_allclose(float(m_accum["loss"]),
                               float(m_full["loss"]), rtol=1e-4)
    # ... and the SUMMED chunk grads give the exact full-batch update
    # (accum_freq=k must behave like a k-times-larger batch; the
    # reference sums per-chunk backwards without dividing)
    state_a2, _ = full_step(
        TrainState.create(jax.tree.map(jnp.copy, params), tx),
        jnp.asarray(images), jnp.asarray(tokens))
    flat_a = jax.tree.leaves(state_a2.text_params)
    flat_b = jax.tree.leaves(state_b2.text_params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_export_roundtrip(tiny, tmp_path):
    """AOT export → deserialize → identical outputs without model code."""
    from leaf_tpu.models.export import export_model, load_exported
    cfg, params = tiny
    text_path, image_path = export_model(params, cfg, str(tmp_path),
                                         batch_size=2)
    assert os.path.getsize(text_path) > 1000
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 999, size=(2, cfg.text.context_length))
    tokens[:, 0] = 998
    tokens[:, 5] = 999
    tokens = tokens.astype(np.int32)
    exported = load_exported(text_path)
    out = np.asarray(exported.call(jnp.asarray(tokens)))
    from leaf_tpu.models import clip as lclip
    ref = np.asarray(jax.jit(lambda t: lclip.encode_text(
        params["text"], cfg.text, t))(jnp.asarray(tokens)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_patch_dropout():
    from leaf_tpu.models.clip import patch_dropout
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 17, 8)).astype(np.float32))
    out = patch_dropout(x, 0.5, jax.random.PRNGKey(0))
    assert out.shape == (2, 9, 8)  # cls + ceil? int(16*0.5)=8 patches
    # cls token always kept
    np.testing.assert_array_equal(np.asarray(out[:, 0]), np.asarray(x[:, 0]))
    # rate 0 → identity
    np.testing.assert_array_equal(np.asarray(patch_dropout(x, 0.0, None)),
                                  np.asarray(x))
    # every kept row comes from the original patches
    orig = set(map(tuple, np.asarray(x[0]).round(5)))
    for row in np.asarray(out[0]).round(5):
        assert tuple(row) in orig


def test_attack_captions_batched(tiny):
    from leaf_tpu.attacks.engine import CandidateScorer
    from leaf_tpu.evals.text_to_image import attack_captions
    from leaf_tpu.tokenizer import get_tokenizer
    cfg, params = tiny
    scorer = CandidateScorer(cfg, bucket=128)
    tok = get_tokenizer()
    caps = ["a cat on a mat", "a dog in a park"]
    advs = attack_captions(scorer, params["text"], tok, caps, rho=3, k=1)
    assert len(advs) == 2 and all(isinstance(a, str) for a in advs)
    from tests.test_edits import lev
    assert all(lev(c, a) <= 1 for c, a in zip(caps, advs))


def test_save_hf_pretrained_roundtrip(tiny, tmp_path):
    """Release path: our params → HF directory → CLIPModel.from_pretrained
    → identical text features."""
    transformers = pytest.importorskip("transformers")
    import torch
    from leaf_tpu.convert import save_hf_pretrained
    from leaf_tpu.models import clip as lclip
    cfg, params = tiny
    out_dir = save_hf_pretrained(params, cfg, str(tmp_path / "hf"))
    hf = transformers.CLIPModel.from_pretrained(out_dir).eval()

    rng = np.random.default_rng(0)
    tokens = rng.integers(1, cfg.text.vocab_size - 2,
                          size=(2, cfg.text.context_length))
    tokens[:, 0] = 49406
    tokens[:, 10] = 49407
    tokens[:, 11:] = 0
    with torch.no_grad():
        ref = hf.get_text_features(torch.from_numpy(tokens)).numpy()
    ours = np.asarray(jax.jit(lambda p, t: lclip.encode_text(
        p["text"], cfg.text, t, cfg.quick_gelu))(
            params, jnp.asarray(tokens)))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_results_ledger_fresh_and_stream(tmp_path):
    """Eval artifact ledgers must not preload a previous run's rows and
    must append incrementally (not rewrite the file per row)."""
    import csv
    from leaf_tpu.utils.results import ResultsLedger
    p = str(tmp_path / "l.csv")
    old = ResultsLedger(p, columns=["a"])
    old.append({"a": "stale"})
    led = ResultsLedger(p, columns=["a"], fresh=True, stream=True)
    led.append({"a": "1"})
    led.append({"a": "2"})
    rows = list(csv.DictReader(open(p)))
    assert [r["a"] for r in rows] == ["1", "2"]   # stale row gone
    # default (training) mode still preloads for resume truncation
    led2 = ResultsLedger(p, columns=["a"])
    assert [r["a"] for r in led2.rows] == ["1", "2"]


def test_textcls_unknown_dataset_raises_cleanly():
    import pytest as _pytest
    from leaf_tpu.data.textcls import get_text_classification_dataset
    with _pytest.raises(KeyError, match="known:"):
        get_text_classification_dataset("not_a_dataset")
