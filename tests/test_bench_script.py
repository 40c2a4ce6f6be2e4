"""bench.py end-to-end smoke (tiny model, CPU mesh).

The driver runs `python bench.py` on the real chip at the end of every
round — a broken bench loses the measurement, so the script itself is
exercised here: mesh default path, BENCH_MESH=0 plain path, and the
tar-fed mode (BENCH_TARS) with its anchor-cache warm cycle.
"""
import importlib.util
import io
import json
import os
import sys
import tarfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(monkeypatch, capsys, **env):
    for k in ("BENCH_BATCH", "BENCH_RHO", "BENCH_MODEL", "BENCH_STEPS",
              "BENCH_MESH", "BENCH_TARS"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("BENCH_MODEL", "ViT-tiny-test")
    monkeypatch.setenv("BENCH_BATCH", "8")
    monkeypatch.setenv("BENCH_RHO", "4")
    monkeypatch.setenv("BENCH_STEPS", "2")
    for k, v in env.items():
        monkeypatch.setenv(k, v)
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_bench_mesh_default(monkeypatch, capsys):
    r = _run_bench(monkeypatch, capsys)
    assert r["metric"] == "leaf_train_samples_per_sec"
    assert r["value"] > 0 and r["candidates_per_sec"] > 0
    # default = mesh over all (8 CPU) devices with per-chip reporting
    assert r["mesh_devices"] == 8
    # both fields are independently rounded to 2 decimals
    assert r["per_chip_samples_per_sec"] == pytest.approx(r["value"] / 8,
                                                          rel=0.01)


def test_bench_plain_path(monkeypatch, capsys):
    r = _run_bench(monkeypatch, capsys, BENCH_MESH="0")
    assert "mesh_devices" not in r and r["value"] > 0


def test_bench_tar_mode(monkeypatch, capsys, tmp_path):
    from PIL import Image
    rng = np.random.default_rng(0)
    with tarfile.open(tmp_path / "s-0000.tar", "w") as tf:
        for i in range(32):
            img = Image.fromarray(
                rng.integers(0, 255, (16, 16, 3)).astype(np.uint8))
            buf = io.BytesIO()
            img.save(buf, format="JPEG")
            data = buf.getvalue()
            info = tarfile.TarInfo(f"{i:05d}.jpg")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
            txt = f"a tiny caption number {i}".encode()
            info = tarfile.TarInfo(f"{i:05d}.txt")
            info.size = len(txt)
            tf.addfile(info, io.BytesIO(txt))
    r = _run_bench(monkeypatch, capsys,
                   BENCH_TARS=str(tmp_path / "s-0000.tar"))
    assert r["value"] > 0
