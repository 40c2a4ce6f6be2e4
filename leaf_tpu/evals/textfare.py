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
    ledger = ResultsLedger(out_csv, fresh=True, stream=True, columns=[
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


def _load_eval_samples(dataset: str, n_test: Optional[int]):
    """'synthetic', a JSON file of [{'text':...},...], or a HF textcls
    registry name (reference datasets: ag_news/sst2/imdb/yelp)."""
    import json
    import os
    if dataset == "synthetic":
        rng = np.random.default_rng(0)
        words = ("stocks rally market team won cup government policy "
                 "tech chip ancient fossil film review great terrible").split()
        return [{"text": " ".join(rng.choice(words, size=8)), "label": 0}
                for _ in range(n_test or 16)], None
    if os.path.exists(dataset):
        with open(dataset) as f:
            data = json.load(f)
        return [{"text": d} if isinstance(d, str) else d
                for d in data], None
    from leaf_tpu.data.textcls import get_text_classification_dataset
    data = get_text_classification_dataset(dataset, n_samples=n_test or 1000)
    # the reference attacks with the dataset's train-split character
    # vocabulary V (eval_textfare.py data['V']), not the generic ASCII set
    return data.samples, data.vocab


def main(argv=None) -> Dict[str, float]:
    """CLI (reference `eval_textfare.py:61-150`): attack the eval
    model per sentence, measure clean/adv embedding drift from a clean
    reference model, stream CSV."""
    import argparse
    import os

    import jax.numpy as jnp

    p = argparse.ArgumentParser("leaf_tpu TextFARE eval")
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--pretrained", default=None,
                   help="eval checkpoint (file/dir/registry tag)")
    p.add_argument("--clean-pretrained", default=None,
                   help="clean reference checkpoint; default = the "
                        "eval model's init (fresh weights if none)")
    p.add_argument("--dataset", default="agnews",
                   help="textcls name | JSON file | 'synthetic'")
    p.add_argument("--attack_name", default="leaf",
                   choices=["leaf", "charmer", "bruteforce"])
    p.add_argument("--rho", type=int, default=50)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--n_test", type=int, default=100)
    p.add_argument("--constrain", action="store_true")
    p.add_argument("--attack-batch", type=int, default=32)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--output-dir", default="results_textfare")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from leaf_tpu.models.factory import create_model, get_tokenizer
    from leaf_tpu.models.pretrained import resolve_pretrained

    pretrained = (resolve_pretrained(args.model, args.pretrained)
                  if args.pretrained else None)
    clean_pre = (resolve_pretrained(args.model, args.clean_pretrained)
                 if args.clean_pretrained else None)
    model = create_model(args.model, pretrained, precision=args.precision)
    clean = create_model(args.model, clean_pre, precision=args.precision)
    tokenizer = get_tokenizer(args.model)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    scorer = CandidateScorer(model.cfg, dtype=dtype)
    constraint = None
    if args.constrain:
        from leaf_tpu.attacks.constraint import WordConstraint
        constraint = WordConstraint(tokenizer)

    samples, ds_vocab = _load_eval_samples(args.dataset, args.n_test)
    os.makedirs(args.output_dir, exist_ok=True)
    tag = args.model.split("/")[-1]
    out_csv = os.path.join(
        args.output_dir,
        f"{tag}_{os.path.basename(args.dataset)}_{args.attack_name}"
        f"_k{args.k}_rho_{args.rho}"
        + ("_constrained" if args.constrain else "") + ".csv")
    out = eval_textfare(
        scorer, model.params["text"], clean.params["text"], tokenizer,
        samples, attack_name=args.attack_name, rho=args.rho, k=args.k,
        vocab=ds_vocab, constraint=constraint, n_test=args.n_test,
        out_csv=out_csv, seed=args.seed, attack_batch=args.attack_batch)
    LOG.info("textfare %s: %s → %s", args.attack_name, out, out_csv)
    print(out)
    return out


if __name__ == "__main__":
    main()
