"""Eval-suite tests on a tiny random model (offline, synthetic data)."""
import os

import jax
import numpy as np
import pytest

from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.data.textcls import TextClassificationData
from leaf_tpu.evals.retrieval import (
    eval_retrieval,
    evaluate_scores,
    pre_caption,
)
from leaf_tpu.evals.textfare import eval_textfare
from leaf_tpu.evals.zero_shot import run_imagenet_eval, zero_shot_eval
from leaf_tpu.evals.zero_shot_text import (
    class_anchor_features,
    eval_zero_shot_text,
)
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import get_model_config
from leaf_tpu.models.zero_shot import (
    build_zero_shot_classifier,
    imagenet_classnames,
    openai_imagenet_templates,
)
from leaf_tpu.tokenizer import get_tokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = get_model_config("ViT-tiny-test")
    params = lclip.init_clip(jax.random.PRNGKey(0), cfg)
    clean_params = lclip.init_clip(jax.random.PRNGKey(1), cfg)
    scorer = CandidateScorer(cfg, bucket=128)
    tok = get_tokenizer()
    return cfg, params, clean_params, scorer, tok


def test_zero_shot_metadata():
    assert len(imagenet_classnames()) == 1000
    templates = openai_imagenet_templates()
    assert len(templates) == 80
    assert templates[0].format("cat").count("cat") == 1


def test_build_zero_shot_classifier(setup):
    cfg, params, _, scorer, tok = setup
    classifier = build_zero_shot_classifier(
        lambda t: scorer.encode_text(params["text"], t), tok,
        ["cat", "dog", "bird"], ["a photo of a {}.", "an image of a {}."],
        num_classes_per_batch=2)
    assert classifier.shape == (cfg.embed_dim, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(classifier), axis=0),
                               1.0, rtol=1e-5)


def test_eval_textfare_all_attacks(setup, tmp_path):
    cfg, params, clean_params, scorer, tok = setup
    samples = [{"text": "stocks rally on strong earnings"},
               {"text": "the match ended in a draw"}]
    for attack in ("leaf", "charmer", "bruteforce"):
        out = eval_textfare(scorer, params["text"], clean_params["text"], tok,
                            samples, attack_name=attack, rho=4, k=1,
                            out_csv=str(tmp_path / f"tf_{attack}.csv"))
        assert out["n"] == 2
        # attack must not reduce drift from the clean reference
        assert out["textfare_adv"] >= 0
        assert os.path.exists(tmp_path / f"tf_{attack}.csv")


def test_eval_zero_shot_text(setup, tmp_path):
    cfg, params, _, scorer, tok = setup
    samples = [{"text": "stocks rally on earnings", "label": 2},
               {"text": "the team won the cup", "label": 1}]
    d = TextClassificationData.from_samples("agnews", samples)
    feats = class_anchor_features(scorer, params, tok, d,
                                  label_encoder="text")
    out = eval_zero_shot_text(scorer, params, tok, d, feats, rho=4, k=1,
                              out_csv=str(tmp_path / "zst.csv"))
    assert out["n"] == 2
    assert 0 <= out["acc_adv"] <= out["acc"] <= 1 or out["acc_adv"] <= 1


def test_eval_zero_shot_text_order_invariant(setup, tmp_path):
    """Length-sorted chunk composition is decision-safe: per-sentence
    results are identical whatever order the dataset arrives in (and
    whatever chunk each sentence lands in), and the CSV reports rows in
    ORIGINAL dataset order."""
    import csv

    cfg, params, _, scorer, tok = setup
    texts = ["tax cut", "the team won the cup after extra time",
             "stocks rally", "a very long report about the quarterly "
             "earnings of the company and its many subsidiaries",
             "rain", "election results are in and counting continues"]
    samples = [{"text": t, "label": i % 3} for i, t in enumerate(texts)]

    def run(order, name):
        d = TextClassificationData.from_samples(
            "agnews", [samples[i] for i in order])
        feats = class_anchor_features(scorer, params, tok, d,
                                      label_encoder="text")
        out = eval_zero_shot_text(scorer, params, tok, d, feats, rho=3,
                                  k=1, out_csv=str(tmp_path / name),
                                  chunk_size=2)
        with open(tmp_path / name) as f:
            rows = list(csv.DictReader(f))
        return out, rows

    fwd_order = list(range(len(samples)))
    rev_order = fwd_order[::-1]
    out_f, rows_f = run(fwd_order, "fwd.csv")
    out_r, rows_r = run(rev_order, "rev.csv")

    # rows come back in the input's dataset order…
    assert [r["sentence"] for r in rows_f] == texts
    assert [r["sentence"] for r in rows_r] == texts[::-1]
    # …and each sentence's decision is independent of chunk composition
    by_sentence_f = {r["sentence"]: r for r in rows_f}
    by_sentence_r = {r["sentence"]: r for r in rows_r}
    assert by_sentence_f == by_sentence_r
    assert out_f == out_r


def test_evaluate_scores_perfect_retrieval():
    # identity scores: image i ↔ texts [2i, 2i+1]
    n_img = 4
    img2txt = {i: [2 * i, 2 * i + 1] for i in range(n_img)}
    txt2img = {t: t // 2 for t in range(2 * n_img)}
    scores = np.full((n_img, 2 * n_img), -1.0)
    for i, ts in img2txt.items():
        for t in ts:
            scores[i, t] = 1.0
    out = evaluate_scores(scores, img2txt, txt2img)
    assert out["TextPrec@1"] == 1.0 and out["TextPrec@5"] == 1.0
    assert out["ImagePrec@1"] == 1.0 and out["ImagePrec@5"] == 1.0


def test_pre_caption():
    assert pre_caption("A Big  CAT!! (on a mat).") == "a big cat on a mat"
    long = " ".join(["word"] * 60)
    assert len(pre_caption(long, max_words=50).split()) == 50


def test_eval_retrieval_end_to_end(setup, tmp_path):
    cfg, params, _, scorer, tok = setup
    captions = ["a cat on a mat", "a dog in the park",
                "a red car on the road", "a bird on a branch"]
    # image embeds = caption embeds (perfect clean retrieval)
    from leaf_tpu.evals.retrieval import embed_texts
    image_embeds = embed_texts(scorer, params["text"], tok, captions)
    img2txt = {i: [i] for i in range(4)}
    txt2img = {i: i for i in range(4)}
    out = eval_retrieval(scorer, params, tok, image_embeds, captions,
                         img2txt, txt2img, target=0, rho=3, k=1,
                         out_csv=str(tmp_path / "ret.csv"))
    assert out["clean"]["TextPrec@1"] == 1.0
    assert len(out["adv_captions"]) == 4
    assert all(isinstance(c, str) for c in out["adv_captions"])


def test_run_imagenet_eval_tiny(setup):
    cfg, params, _, scorer, tok = setup
    classifier = build_zero_shot_classifier(
        lambda t: scorer.encode_text(params["text"], t), tok,
        ["cat", "dog"], ["a photo of a {}."])
    rng = np.random.default_rng(0)
    batches = [(rng.uniform(0, 1, size=(2, 64, 64, 3)).astype(np.float32),
                np.asarray([0, 1]))]
    top1, top5, top1_adv = run_imagenet_eval(
        params, cfg, classifier, batches, jax.random.PRNGKey(0),
        n_steps=2)
    assert 0 <= top1 <= 1 and 0 <= top1_adv <= 1
    assert top5 == 1.0  # 2 classes → top5 always correct


def test_run_text_classification_batched(setup):
    from leaf_tpu.evals.zero_shot import run_text_classification
    cfg, params, _, scorer, tok = setup
    samples = [{"text": "stocks rally on earnings", "label": 2},
               {"text": "the team won the cup", "label": 1},
               {"text": "new chip unveiled today", "label": 3}]
    d = TextClassificationData.from_samples("agnews", samples)
    anchors = class_anchor_features(scorer, params, tok, d,
                                    label_encoder="text")
    acc, acc_adv = run_text_classification(
        scorer, params, tok, anchors, d, n_charmer=4, k=1, attack_batch=2)
    assert 0.0 <= acc <= 1.0 and 0.0 <= acc_adv <= 1.0


def test_textfare_cli(tmp_path):
    """Standalone TextFARE CLI (reference eval_textfare.py __main__)."""
    from leaf_tpu.evals.textfare import main
    out = main(["--model", "ViT-tiny-test", "--dataset", "synthetic",
                "--n_test", "2", "--rho", "4", "--attack_name", "leaf",
                "--output-dir", str(tmp_path)])
    assert out["n"] == 2 and out["textfare_adv"] >= out["textfare_clean"]
    assert any(f.suffix == ".csv" for f in tmp_path.iterdir())


def test_zero_shot_text_cli(tmp_path):
    """Standalone zero-shot text CLI (reference eval_zero_shot_text.py)."""
    from leaf_tpu.evals.zero_shot_text import main
    out = main(["--model", "ViT-tiny-test", "--dataset", "synthetic",
                "--n_test", "2", "--rho", "4", "--label-encoder", "text",
                "--output-dir", str(tmp_path)])
    assert out["n"] == 2 and 0.0 <= out["acc_adv"] <= 1.0


def test_clipscore_cli(tmp_path):
    """Standalone CLIPScore/FID CLI (reference compute_clipscores.py)."""
    import json
    from PIL import Image
    from leaf_tpu.evals.clipscore import main
    rng = np.random.default_rng(0)
    for d in ("gen", "real"):
        (tmp_path / d).mkdir()
        for i in range(3):
            Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                         dtype=np.uint8)).save(
                tmp_path / d / f"{i}.png")
    caps = tmp_path / "caps.json"
    caps.write_text(json.dumps(["a cat", "a dog", "a car"]))
    out = main(["--model", "ViT-tiny-test", "--allow-random-weights",
                "--gen-dir",
                str(tmp_path / "gen"), "--real-dir", str(tmp_path / "real"),
                "--captions", str(caps),
                "--output", str(tmp_path / "r.json")])
    assert out["n"] == 3 and "fid_clip" in out
    assert (tmp_path / "r.json").exists()


def test_text_to_image_cli_attack_stage(tmp_path):
    """T2I CLI stage 1 (reference eval_text_to_image.py without SD
    weights): attacked captions JSON+CSV."""
    import json
    from leaf_tpu.evals.text_to_image import main
    caps = tmp_path / "caps.json"
    caps.write_text(json.dumps(["a cat on a mat"]))
    adv = main(["--model", "ViT-tiny-test", "--captions", str(caps),
                "--rho", "4", "--k", "1",
                "--output-dir", str(tmp_path / "out")])
    assert len(adv) == 1 and adv[0] != "a cat on a mat"
    assert (tmp_path / "out" / "captions_adv.json").exists()
    assert (tmp_path / "out" / "captions_adv.csv").exists()


def test_flickr_captions_txt_annotations(tmp_path):
    """Kaggle flickr-style captions.txt parses into the Karpathy
    structure (reference datasets/flickr.py split-on-'.jpg,')."""
    from leaf_tpu.data.coco import load_retrieval_annotations

    (tmp_path / "captions.txt").write_text(
        "image,caption\n"
        "a.jpg,A dog runs, quickly, on grass\n"
        "a.jpg,Another view of the dog\n"
        "b.jpg,A cat sits\n")
    ann = load_retrieval_annotations(str(tmp_path / "captions.txt"))
    assert ann == [
        {"image": "a.jpg", "caption": ["A dog runs, quickly, on grass",
                                       "Another view of the dog"]},
        {"image": "b.jpg", "caption": ["A cat sits"]},
    ]


def test_imagenet_robust_square_requires_linf(tmp_path):
    """--square searches the Linf ball; combining it with l1/l2 would
    count out-of-threat-model perturbations as robustness failures."""
    import os

    from PIL import Image

    from leaf_tpu.evals.imagenet_robust import main

    d = tmp_path / "val" / "n01440764"
    d.mkdir(parents=True)
    Image.new("RGB", (8, 8)).save(d / "x.jpg")
    with pytest.raises(ValueError, match="linf"):
        main(["--model", "ViT-tiny-test",
              "--imagenet-root", str(tmp_path / "val"),
              "--n-samples", "1", "--batch-size", "1",
              "--attack-iters", "1", "--norm", "l1", "--eps", "75",
              "--square", "--output", str(tmp_path / "out")])
