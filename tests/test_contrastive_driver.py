"""Contrastive pretraining driver smoke tests.

Mirrors the reference's `tests/test_training_simple.py`: run the full
vanilla trainer `main` on synthetic data (1 epoch, tiny model) for the
flag variants the reference exercises — plain, --siglip, --local-loss,
--accum-freq 2 — plus the distillation path, and verify resume.
"""
import os

import jax
import numpy as np
import pytest

from leaf_tpu.train.contrastive_driver import main

BASE = [
    "--model", "ViT-tiny-test", "--dataset-type", "synthetic",
    "--train-num-samples", "16", "--batch-size", "8",
    "--epochs", "1", "--lr", "1e-4", "--warmup", "2",
    "--zeroshot-frequency", "0", "--log-every-n-steps", "1",
]


def run(tmp_path, extra, name):
    return main(BASE + ["--logs", str(tmp_path), "--name", name] + extra)


def test_contrastive_plain(tmp_path):
    out = run(tmp_path, [], "plain")
    assert int(out["state"].step) == 2
    assert os.path.exists(os.path.join(out["out_dir"], "results.csv"))
    assert os.path.isdir(os.path.join(out["out_dir"], "checkpoints",
                                      "epoch_1"))
    loss = out["results"][-1]["train_loss"]
    assert np.isfinite(float(loss))


def test_distill_resolution_mismatch_errors(tmp_path):
    with pytest.raises(ValueError, match="resolution"):
        run(tmp_path, ["--force-image-size", "96",
                       "--distill-model", "ViT-tiny-test"], "dres")


def test_contrastive_siglip(tmp_path):
    out = run(tmp_path, ["--siglip"], "siglip")
    assert int(out["state"].step) == 2
    assert np.isfinite(float(out["results"][-1]["train_loss"]))


def test_contrastive_local_loss(tmp_path):
    out = run(tmp_path, ["--local-loss"], "localloss")
    assert np.isfinite(float(out["results"][-1]["train_loss"]))


def test_contrastive_accum(tmp_path):
    out = run(tmp_path, ["--accum-freq", "2"], "accum")
    # 16 samples / batch 8 = 2 loader batches = 1 accumulated step
    assert int(out["state"].step) == 1
    assert np.isfinite(float(out["results"][-1]["train_loss"]))


def test_contrastive_distill(tmp_path):
    out = run(tmp_path, ["--distill-model", "ViT-tiny-test"], "distill")
    assert int(out["state"].step) == 2
    assert np.isfinite(float(out["results"][-1]["train_loss"]))


def test_contrastive_patch_dropout(tmp_path):
    out = run(tmp_path, ["--force-patch-dropout", "0.5"], "patchdrop")
    assert out["cfg"].vision.patch_dropout == 0.5
    assert np.isfinite(float(out["results"][-1]["train_loss"]))


def test_contrastive_resume(tmp_path):
    run(tmp_path, [], "resume")
    out = main(BASE + ["--logs", str(tmp_path), "--name", "resume",
                       "--resume", "latest", "--epochs", "2"])
    assert int(out["state"].step) == 4
    epochs = [int(r["epoch"]) for r in out["results"]]
    assert epochs == sorted(set(epochs)), "resume must not duplicate rows"


def test_contrastive_coca(tmp_path):
    """CoCa trains through the vanilla driver (contrastive + caption
    CE under shard_map) — the loss path the reference reaches via
    main.py with a coca_* model."""
    out = main(["--model", "coca-tiny-test", "--dataset-type", "synthetic",
                "--train-num-samples", "16", "--batch-size", "8",
                "--epochs", "1", "--lr", "1e-4", "--warmup", "2",
                "--zeroshot-frequency", "0", "--log-every-n-steps", "1",
                "--logs", str(tmp_path), "--name", "coca"])
    assert int(out["state"].step) == 2
    assert np.isfinite(float(out["results"][-1]["train_loss"]))
    assert "cls_emb" in out["state"].text_params["text"]


def test_contrastive_with_forced_kernels(tmp_path, monkeypatch):
    """Pallas kernels forced on (interpret mode) under the 8-device CPU
    mesh: the shard_map'd loss must trace a pallas_call without tripping
    the varying-mesh-axes check (regression: the contrastive driver
    failed on single-chip TPU where the kernels auto-enable)."""
    monkeypatch.setenv("LEAF_TPU_PACKED_ATTN", "1")
    out = run(tmp_path, [], "kernels")
    assert int(out["state"].step) == 2
    assert np.isfinite(float(out["results"][-1]["train_loss"]))
