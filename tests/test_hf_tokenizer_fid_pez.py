"""HFTokenizer/SigLip wiring, FID, and the PEZ driver."""
import json
import os

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def local_hf_tokenizer(tmp_path_factory):
    """A real HF tokenizer saved locally (no network): word-level Bert
    vocab over a handful of tokens."""
    d = tmp_path_factory.mktemp("hftok")
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of",
             "cat", "dog", "the"]
    vf = d / "vocab.txt"
    vf.write_text("\n".join(vocab))
    tok = transformers.BertTokenizerFast(vocab_file=str(vf),
                                         do_lower_case=True)
    out = d / "saved"
    tok.save_pretrained(str(out))
    return str(out)


def test_hf_tokenizer_shapes_and_sep(local_hf_tokenizer):
    from leaf_tpu.tokenizer.hf import HFTokenizer
    t = HFTokenizer(local_hf_tokenizer, context_length=16)
    ids = t(["a photo of a cat", "the dog"])
    assert ids.shape == (2, 16) and ids.dtype == np.int32
    sep_id = t.tokenizer.sep_token_id
    assert (ids == sep_id).any()
    t2 = HFTokenizer(local_hf_tokenizer, context_length=16,
                     strip_sep_token=True)
    ids2 = t2(["a photo of a cat"])
    assert not (ids2 == sep_id).any()
    # round-trip decode drops specials
    assert "cat" in t.decode(ids[0])


def test_hf_tokenizer_clean_fns():
    from leaf_tpu.tokenizer.hf import canonicalize_text, get_clean_fn
    assert canonicalize_text("Hello, World_!") == "hello world"
    assert get_clean_fn("lower")("  A  Photo ") == "a photo"
    assert get_clean_fn("whitespace")("A   Photo") == "A Photo"
    with pytest.raises(ValueError):
        get_clean_fn("nope")


def test_get_tokenizer_selects_hf(local_hf_tokenizer):
    import dataclasses

    from leaf_tpu.models.config import get_model_config, register_model
    from leaf_tpu.models.factory import get_tokenizer
    from leaf_tpu.tokenizer.hf import HFTokenizer

    base = get_model_config("ViT-tiny-test")
    cfg = dataclasses.replace(
        base, name="ViT-tiny-hftok-test",
        text=dataclasses.replace(base.text,
                                 hf_tokenizer_name=local_hf_tokenizer))
    register_model(cfg)
    get_tokenizer.cache_clear()
    tok = get_tokenizer("ViT-tiny-hftok-test")
    assert isinstance(tok, HFTokenizer)
    # plain registry names keep the byte-BPE SimpleTokenizer
    from leaf_tpu.tokenizer.bpe import CLIPTokenizer
    assert isinstance(get_tokenizer("ViT-tiny-test"), CLIPTokenizer)
    get_tokenizer.cache_clear()


def test_frechet_distance_closed_form():
    from leaf_tpu.evals.fid import feature_statistics, frechet_distance
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4000, 8))
    mu1, s1 = feature_statistics(x)
    assert frechet_distance(mu1, s1, mu1, s1) == pytest.approx(0.0, abs=1e-4)
    # identical covariance, shifted mean: d² == |Δμ|²
    shift = np.full(8, 2.0)
    mu2, s2 = feature_statistics(x + shift)
    d = frechet_distance(mu1, s1, mu2, s2)
    assert d == pytest.approx(float(shift @ shift), rel=1e-3)


def test_compute_fid_with_clip_features():
    from leaf_tpu.evals.fid import compute_fid, make_clip_feature_fn
    from leaf_tpu.models import create_model
    model = create_model("ViT-tiny-test")
    fn = make_clip_feature_fn(model.params, model.cfg, batch_size=8)
    rng = np.random.default_rng(1)
    real = rng.uniform(0, 1, (12, 64, 64, 3)).astype(np.float32)
    same = compute_fid(real, real.copy(), fn)
    diff = compute_fid(real,
                       rng.uniform(0, 1, (12, 64, 64, 3)).astype(np.float32)
                       * 0.2, fn)
    assert same == pytest.approx(0.0, abs=1e-2)
    assert diff > same


def test_pez_driver_config_merge(tmp_path):
    from leaf_tpu.evals.pez_driver import main
    caps = tmp_path / "caps.txt"
    caps.write_text("a photo of a cat\n")
    cfgf = tmp_path / "cfg.json"
    cfgf.write_text(json.dumps({"iter": 3, "lr": 0.3}))
    out = main(["--config", str(cfgf), "--model", "ViT-tiny-test",
                "--captions", str(caps), "--n-samples", "1",
                "--output", str(tmp_path / "res")])
    assert out["config"]["iter"] == 3       # json applied
    assert out["config"]["lr"] == 0.3
    assert len(out["results"]) == 1
    assert os.path.exists(os.path.join(
        tmp_path, "res", "results-1smpls-3iters-ViT-tiny-test.json"))
    # CLI overrides json
    out2 = main(["--config", str(cfgf), "--iter", "2",
                 "--model", "ViT-tiny-test", "--captions", str(caps),
                 "--n-samples", "1", "--output", str(tmp_path / "res2")])
    assert out2["config"]["iter"] == 2


def test_pez_driver_image_target(tmp_path):
    """run.py mode: one prompt optimized against target image(s)
    (reference optim_utils.get_target_feature, :94-101)."""
    from PIL import Image
    import numpy as np
    from leaf_tpu.evals.pez_driver import main
    rng = np.random.default_rng(0)
    paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.png"
        Image.fromarray(rng.integers(0, 255, (70, 90, 3)).astype(
            np.uint8)).save(p)
        paths.append(str(p))
    out = main(["--model", "ViT-tiny-test", "--images", *paths,
                "--iter", "3", "--prompt-len", "4",
                "--output", str(tmp_path / "res")])
    res = out["results"][0]
    assert res["images"] == paths
    assert res["prompt_len"] == 4
    assert isinstance(res["reconstructed"], str) and res["reconstructed"]
    assert -1.0 <= res["cosine_sim"] <= 1.0
    assert os.path.exists(os.path.join(
        tmp_path, "res", "results-2smpls-3iters-ViT-tiny-test.json"))


def test_pez_driver_requires_target(tmp_path):
    import pytest
    from leaf_tpu.evals.pez_driver import main
    with pytest.raises(SystemExit):
        main(["--model", "ViT-tiny-test",
              "--output", str(tmp_path / "res")])


def test_pez_metrics(tmp_path):
    from leaf_tpu.evals.pez_metrics import evaluate_results, main

    payload = {
        "config": {},
        "results": [
            {"original": "a photo of a cat",
             "reconstructed": "photo cat a a",
             "cosine_sim": 0.9,
             "ids_orig": [49406, 320, 1125, 539, 320, 2368, 49407, 0, 0],
             "ids_rec": [1125, 2368, 320, 320]},
            {"original": "dog on grass",
             "reconstructed": "cat in house",
             "cosine_sim": 0.5,
             "ids_orig": [49406, 7, 8, 9, 49407, 0],
             "ids_rec": [1, 2, 3]},
        ],
    }
    m = evaluate_results(payload)
    assert m["n"] == 2
    assert m["mean_cosine_sim"] == pytest.approx(0.7)
    # row 1: 4 rec words, refs present: photo yes, cat yes, a yes, of no,
    # a counted again -> 4/... word acc = (sum over refs in rec)/len(rec)
    # row 1: refs [a,photo,of,a,cat] -> in rec: a,photo,a,cat = 4; len(rec)=4
    # row 2: 0/3 -> total 4/7
    assert m["word_accuracy"] == pytest.approx(4 / 7)
    # token acc: row1 ref=[320,1125,539,320,2368], in rec: 320,1125,320,2368
    # -> 4, len(rec)=4; row2 0/3 -> 4/7
    assert m["token_accuracy"] == pytest.approx(4 / 7)
    assert "bleu" in m and m["bleu"] >= 0.0

    # CLI over a directory of results files
    import json as _json
    d = tmp_path / "inv"
    d.mkdir()
    (d / "results-2smpls-3iters-m.json").write_text(_json.dumps(payload))
    out = main([str(d)])
    assert "results-2smpls-3iters-m.json" in out


def test_pez_driver_records_ids(tmp_path):
    from leaf_tpu.evals.pez_driver import main
    caps = tmp_path / "caps.txt"
    caps.write_text("a photo of a cat\n")
    out = main(["--model", "ViT-tiny-test", "--iter", "2",
                "--captions", str(caps), "--n-samples", "1",
                "--output", str(tmp_path / "res")])
    r = out["results"][0]
    assert len(r["ids_rec"]) == r["prompt_len"]
    assert r["ids_orig"][0] > 0
