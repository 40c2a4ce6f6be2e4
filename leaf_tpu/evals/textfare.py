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
    attack_text_charmer_batched,
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
    attack_batch: int = 32,
) -> Dict[str, float]:
    """Returns mean clean/adv TextFARE losses; optionally streams CSV.

    Sentences are attacked `attack_batch` at a time — the leaf attack
    is batch-parallel by design; charmer uses the batched variant
    (identical per-sentence search); bruteforce remains per-sentence
    (its candidate count is exhaustive and length-dependent)."""
    vocab = vocab or edits.DEFAULT_VOCAB
    ledger = ResultsLedger(out_csv, columns=[
        "sentence", "adv_sentence", "textfare_clean", "textfare_adv",
    ]) if out_csv else None
    rng = np.random.default_rng(seed)

    all_samples = samples[:n_test] if n_test is not None else samples
    texts = [d["text"] if isinstance(d, dict) else d for d in all_samples]

    clean_losses: List[float] = []
    adv_losses: List[float] = []
    for start in range(0, len(texts), attack_batch):
        chunk = texts[start:start + attack_batch]
        tokens = tokenizer(chunk)
        ref_feats = np.asarray(scorer.encode_text(clean_text_params, tokens))
        own_feats = scorer.encode_text(eval_text_params, tokens)

        if attack_name == "leaf":
            _, adv_chunk = attack_text_leaf(
                scorer, eval_text_params, tokenizer, chunk, own_feats,
                objective="l2", n=rho, k=k, vocab=vocab,
                constraint=constraint, rng=rng)
        elif attack_name == "charmer":
            adv_chunk = attack_text_charmer_batched(
                scorer, eval_text_params, tokenizer, chunk, own_feats,
                objective="l2", n=rho, k=k, vocab=vocab,
                constraint=constraint)
        elif attack_name == "bruteforce":
            adv_chunk = []
            for sentence, anchor in zip(chunk, np.asarray(own_feats)):
                adv_s, _ = attack_text_bruteforce(
                    scorer, eval_text_params, tokenizer, sentence, anchor,
                    objective="l2", vocab=vocab, constraint=constraint)
                adv_chunk.append(adv_s)
        else:
            raise ValueError(f"unknown attack {attack_name!r}")

        adv_feats = np.asarray(scorer.encode_text(
            eval_text_params, tokenizer(adv_chunk)))
        own_np = np.asarray(own_feats)
        for j, sentence in enumerate(chunk):
            loss_clean = float(np.square(ref_feats[j] - own_np[j]).sum())
            loss_adv = float(np.square(ref_feats[j] - adv_feats[j]).sum())
            clean_losses.append(loss_clean)
            adv_losses.append(loss_adv)
            if ledger is not None:
                ledger.append({"sentence": sentence,
                               "adv_sentence": adv_chunk[j],
                               "textfare_clean": loss_clean,
                               "textfare_adv": loss_adv})

    return {
        "textfare_clean": float(np.mean(clean_losses)) if clean_losses else 0.0,
        "textfare_adv": float(np.mean(adv_losses)) if adv_losses else 0.0,
        "n": len(clean_losses),
    }
