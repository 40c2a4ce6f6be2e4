"""TextFARE evaluation: embedding drift under character attack.

Re-expression of `/root/reference/eval_textfare.py`: for each sentence,
attack the *eval model* (anchored on its own clean features), then
measure the squared-L2 drift of clean and adversarial embeddings from a
*clean reference model* (the original non-robust CLIP).  Streaming CSV
with columns sentence/adv_sentence/textfare_clean/textfare_adv.
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

from leaf_tpu.attacks import edits
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.attacks.text import (
    attack_text_bruteforce,
    attack_text_charmer_inference,
    attack_text_leaf,
)
from leaf_tpu.utils.results import ResultsLedger

LOG = logging.getLogger(__name__)


def eval_textfare(
    scorer: CandidateScorer,
    eval_text_params,
    clean_text_params,
    tokenizer,
    samples: Sequence[Dict],
    attack_name: str = "leaf",
    rho: int = 50,
    k: int = 1,
    vocab: Optional[Sequence[int]] = None,
    constraint=None,
    n_test: Optional[int] = None,
    out_csv: Optional[str] = None,
    seed: int = 0,
) -> Dict[str, float]:
    """Returns mean clean/adv TextFARE losses; optionally streams CSV."""
    vocab = vocab or edits.DEFAULT_VOCAB
    ledger = ResultsLedger(out_csv, columns=[
        "sentence", "adv_sentence", "textfare_clean", "textfare_adv",
    ]) if out_csv else None
    rng = np.random.default_rng(seed)

    clean_losses: List[float] = []
    adv_losses: List[float] = []
    for i, d in enumerate(samples):
        if n_test is not None and i >= n_test:
            break
        sentence = d["text"] if isinstance(d, dict) else d
        tokens = tokenizer([sentence])
        ref_feats = np.asarray(
            scorer.encode_text(clean_text_params, tokens))[0]
        own_feats = scorer.encode_text(eval_text_params, tokens)[0]

        if attack_name == "leaf":
            _, adv = attack_text_leaf(
                scorer, eval_text_params, tokenizer, [sentence],
                own_feats[None], objective="l2", n=rho, k=k, vocab=vocab,
                constraint=constraint, rng=rng)
            adv_sentence = adv[0]
        elif attack_name == "charmer":
            adv_sentence, _ = attack_text_charmer_inference(
                scorer, eval_text_params, tokenizer, sentence, own_feats,
                objective="l2", n=rho, k=k, vocab=vocab,
                constraint=constraint)
        elif attack_name == "bruteforce":
            adv_sentence, _ = attack_text_bruteforce(
                scorer, eval_text_params, tokenizer, sentence, own_feats,
                objective="l2", vocab=vocab, constraint=constraint)
        else:
            raise ValueError(f"unknown attack {attack_name!r}")

        adv_feats = np.asarray(scorer.encode_text(
            eval_text_params, tokenizer([adv_sentence])))[0]
        own_np = np.asarray(own_feats)
        loss_clean = float(np.square(ref_feats - own_np).sum())
        loss_adv = float(np.square(ref_feats - adv_feats).sum())
        clean_losses.append(loss_clean)
        adv_losses.append(loss_adv)
        if ledger is not None:
            ledger.append({"sentence": sentence, "adv_sentence": adv_sentence,
                           "textfare_clean": loss_clean,
                           "textfare_adv": loss_adv})
        LOG.debug("%s clean=%.4f adv=%.4f", attack_name, loss_clean, loss_adv)

    return {
        "textfare_clean": float(np.mean(clean_losses)) if clean_losses else 0.0,
        "textfare_adv": float(np.mean(adv_losses)) if adv_losses else 0.0,
        "n": len(clean_losses),
    }
