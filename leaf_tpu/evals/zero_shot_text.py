"""Standalone zero-shot adversarial text-classification eval.

Re-expression of `/root/reference/eval_zero_shot_text.py`: classify
sentences against image-anchored (or text-anchored) class embeddings,
attack each with the Charmer classification attack, report clean and
adversarial accuracy + streaming CSV.  (Quirk preserved: this
standalone eval scores *without* the caption template, unlike the
in-training eval — `eval_zero_shot_text.py:118`.)
"""
from __future__ import annotations

import logging
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.attacks.text import (
    attack_text_charmer_classification_batched,
)
from leaf_tpu.data.textcls import TextClassificationData
from leaf_tpu.models import clip as lclip
from leaf_tpu.utils.results import ResultsLedger

LOG = logging.getLogger(__name__)


def class_anchor_features(scorer: CandidateScorer, params, tokenizer,
                          textcls: TextClassificationData,
                          label_encoder: str = "image", preprocess=None,
                          cfg=None):
    """Normalised per-class anchors from images (default) or captions."""
    if label_encoder == "text":
        return scorer.encode_text(params["text"], tokenizer(textcls.captions),
                                  normalize=True)
    from leaf_tpu.attacks.image import _normalize_images
    images = jnp.asarray(textcls.anchor_images(preprocess))
    return lclip.encode_image_model(params, cfg, _normalize_images(images, cfg),
                                    normalize=True)


def eval_zero_shot_text(
    scorer: CandidateScorer,
    params,
    tokenizer,
    textcls: TextClassificationData,
    label_features,
    rho: int = 20,
    k: int = 1,
    n_test: Optional[int] = None,
    out_csv: Optional[str] = None,
    chunk_size: int = 16,
) -> Dict[str, float]:
    ledger = ResultsLedger(out_csv, fresh=True, stream=True, columns=[
        "sentence", "original_label", "predicted_label", "adv_sentence",
        "adv_label"]) if out_csv else None

    samples = textcls.samples if n_test is None else textcls.samples[:n_test]
    # batched charmer (decision-identical to the per-sentence reference
    # loop — pinned by
    # test_charmer_classification_batched_matches_sequential) shares
    # device batches across sentences: ~2.7× the sequential eval
    # wall-clock on chip (tools/profile_charmer.py)
    # length-sorted chunk composition: every device buffer in a chunk is
    # padded/bucketed to the CHUNK max (probe grid P = max slot count,
    # context bucket = max EOT, `CandidateScorer.score_*` /
    # `_pad_rows`), so grouping similar-length sentences keeps both
    # small on real mixed-length datasets (AG-News sentences span ~3× in
    # length) — the eval-side analogue of the trainer's
    # `--bucket-by-length`.  Decision-safe: the per-sentence search never
    # reads other rows (padding rows are masked; context bucketing is
    # feature-invariant per `can_bucket`), so results are identical to
    # dataset-order chunks — pinned by
    # test_eval_zero_shot_text_order_invariant — and rows are reported
    # and ledgered in ORIGINAL dataset order.
    order = sorted(range(len(samples)), key=lambda i: len(samples[i]["text"]))
    rows: Dict[int, Dict] = {}
    for c0 in range(0, len(order), chunk_size):
        idx = order[c0:c0 + chunk_size]
        sentences = [samples[i]["text"] for i in idx]
        labels = [samples[i]["label"] for i in idx]
        adv_sentences = attack_text_charmer_classification_batched(
            scorer, params["text"], tokenizer, sentences, label_features,
            labels, n=rho, k=k, vocab=textcls.vocab)
        feats = scorer.encode_text(
            params["text"], tokenizer(sentences + adv_sentences),
            normalize=True)
        probs = np.asarray(feats.astype(jnp.float32)
                           @ jnp.asarray(label_features).T.astype(jnp.float32))
        preds = probs.argmax(-1).reshape(2, len(idx))
        for j, i in enumerate(idx):
            rows[i] = {"sentence": sentences[j],
                       "original_label": labels[j],
                       "predicted_label": int(preds[0, j]),
                       "adv_sentence": adv_sentences[j],
                       "adv_label": int(preds[1, j])}
    acc = acc_adv = 0
    n = len(samples)
    for i in range(n):
        acc += int(rows[i]["predicted_label"] == rows[i]["original_label"])
        acc_adv += int(rows[i]["adv_label"] == rows[i]["original_label"])
        if ledger is not None:
            ledger.append(rows[i])
    if n == 0:
        return {"acc": 0.0, "acc_adv": 0.0, "n": 0}
    return {"acc": acc / n, "acc_adv": acc_adv / n, "n": n}


def main(argv=None) -> Dict[str, float]:
    """CLI (reference `eval_zero_shot_text.py:61-133`): zero-shot text
    classification vs class anchors (image anchors by default, caption
    anchors with --label-encoder text), with the batched Charmer
    margin-loss attack; clean+adv accuracy CSV."""
    import argparse
    import logging
    import os

    p = argparse.ArgumentParser("leaf_tpu zero-shot text eval")
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--dataset", default="agnews",
                   help="textcls registry name | 'synthetic'")
    p.add_argument("--label-encoder", default="image",
                   choices=["image", "text"])
    p.add_argument("--rho", type=int, default=20)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--n_test", type=int, default=100)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--output-dir", default="results_zeroshot_text")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from leaf_tpu.models.factory import (
        create_model_and_transforms,
        get_tokenizer,
    )
    from leaf_tpu.models.pretrained import resolve_pretrained

    pretrained = (resolve_pretrained(args.model, args.pretrained)
                  if args.pretrained else None)
    model, _, _ = create_model_and_transforms(
        args.model, pretrained, precision=args.precision)
    # anchor images must reach class_anchor_features UN-normalized —
    # it normalizes internally via _normalize_images, and the factory's
    # transform already normalizes (a double (x-m)/s corrupted the
    # image-anchored class embeddings)
    from leaf_tpu.models.preprocess import image_transform
    preprocess = image_transform(model.cfg.vision.image_size,
                                 do_normalize=False)
    tokenizer = get_tokenizer(args.model)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    scorer = CandidateScorer(model.cfg, dtype=dtype)

    if args.dataset == "synthetic":
        from leaf_tpu.evals.textfare import _load_eval_samples
        samples, _ = _load_eval_samples("synthetic", args.n_test)
        textcls = TextClassificationData.from_samples("agnews", samples)
    else:
        from leaf_tpu.data.textcls import get_text_classification_dataset
        if args.n_test is not None and args.n_test <= 0:
            p.error("--n_test must be positive")
        textcls = get_text_classification_dataset(
            args.dataset, n_samples=args.n_test or 1000)

    label_features = class_anchor_features(
        scorer, model.params, tokenizer, textcls,
        label_encoder=args.label_encoder, preprocess=preprocess,
        cfg=model.cfg)
    os.makedirs(args.output_dir, exist_ok=True)
    out_csv = os.path.join(
        args.output_dir,
        f"{args.model.split('/')[-1]}_{textcls.short_name}"
        f"_k{args.k}_rho_{args.rho}_{args.label_encoder}.csv")
    out = eval_zero_shot_text(scorer, model.params, tokenizer, textcls,
                              label_features, rho=args.rho, k=args.k,
                              n_test=args.n_test, out_csv=out_csv)
    print(out)
    return out


if __name__ == "__main__":
    main()
