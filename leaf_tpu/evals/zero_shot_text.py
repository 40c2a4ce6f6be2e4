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
from leaf_tpu.attacks.text import attack_text_charmer_classification
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
    return lclip.encode_image_model(params, cfg, _normalize_images(images),
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
) -> Dict[str, float]:
    ledger = ResultsLedger(out_csv, columns=[
        "sentence", "original_label", "predicted_label", "adv_sentence",
        "adv_label"]) if out_csv else None

    acc = acc_adv = n = 0
    for i, d in enumerate(textcls.samples):
        if n_test is not None and i >= n_test:
            break
        sentence, label = d["text"], d["label"]
        adv_sentence, _ = attack_text_charmer_classification(
            scorer, params["text"], tokenizer, sentence, label_features,
            label, n=rho, k=k, vocab=textcls.vocab)
        feats = scorer.encode_text(
            params["text"], tokenizer([sentence, adv_sentence]),
            normalize=True)
        probs = np.asarray(feats.astype(jnp.float32)
                           @ jnp.asarray(label_features).T.astype(jnp.float32))
        preds = probs.argmax(-1)
        acc += int(preds[0] == label)
        acc_adv += int(preds[1] == label)
        n += 1
        if ledger is not None:
            ledger.append({"sentence": sentence, "original_label": label,
                           "predicted_label": int(preds[0]),
                           "adv_sentence": adv_sentence,
                           "adv_label": int(preds[1])})
    if n == 0:
        return {"acc": 0.0, "acc_adv": 0.0, "n": 0}
    return {"acc": acc / n, "acc_adv": acc_adv / n, "n": n}
