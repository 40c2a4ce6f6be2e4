"""leaf_tpu.serve batch feature-extraction CLI."""
import os

import numpy as np
import pytest
from PIL import Image

from leaf_tpu import serve


@pytest.fixture()
def inputs(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "imgs").mkdir()
    for i in range(5):
        Image.fromarray(rng.integers(0, 255, (64, 64, 3))
                        .astype(np.uint8)).save(
            tmp_path / "imgs" / f"{i}.png")
    txt = tmp_path / "texts.txt"
    txt.write_text("a photo of a cat\na stock market rally\n"
                   "the match ended\n")
    return tmp_path


def test_serve_text_and_images(inputs):
    out_path = inputs / "feats.npz"
    serve.main(["--model", "ViT-tiny-test", "--texts",
                str(inputs / "texts.txt"), "--images",
                str(inputs / "imgs"), "--output", str(out_path),
                "--batch-size", "4", "--precision", "fp32"])
    z = np.load(out_path, allow_pickle=False)
    assert z["text_features"].shape == (3, 64)
    assert z["image_features"].shape == (5, 64)
    assert z["scores"].shape == (5, 3)
    # normalized by default
    np.testing.assert_allclose(
        np.linalg.norm(z["text_features"], axis=-1), 1.0, rtol=1e-5)
    # padded final batch must not leak into results: re-run with a
    # batch size that divides evenly and compare
    out2 = inputs / "feats2.npz"
    serve.main(["--model", "ViT-tiny-test", "--texts",
                str(inputs / "texts.txt"), "--output", str(out2),
                "--batch-size", "3", "--precision", "fp32"])
    z2 = np.load(out2)
    np.testing.assert_allclose(z2["text_features"], z["text_features"],
                               atol=1e-6)


def test_serve_export(inputs):
    out_path = inputs / "f.npz"
    exp = inputs / "aot"
    serve.main(["--model", "ViT-tiny-test", "--texts",
                str(inputs / "texts.txt"), "--output", str(out_path),
                "--batch-size", "4", "--precision", "fp32",
                "--export", str(exp)])
    files = os.listdir(exp)
    assert any(f.endswith(".text.stablehlo") for f in files)
    assert any(f.endswith(".image.stablehlo") for f in files)
