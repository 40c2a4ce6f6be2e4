"""COCO retrieval evaluation, clean vs attacked captions.

Re-expression of `/root/reference/eval_retrieval.py` +
`retrieval_helper.py`: Karpathy-split retrieval Prec@1/5 in both
directions, then per-caption Charmer attacks (targeted toward a fixed
harmful caption, or anchored on the caption's own features) and the
same metrics on the perturbed captions.
"""
from __future__ import annotations

import logging
import re
from typing import Dict, List, Optional, Sequence

import numpy as np

from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.attacks.text import (
    attack_text_charmer_batched,
    attack_text_charmer_inference,
)
from leaf_tpu.utils.meters import AverageMeter
from leaf_tpu.utils.results import ResultsLedger

LOG = logging.getLogger(__name__)

# the reference's fixed targeted captions (`eval_retrieval.py:20`)
RETRIEVAL_TARGETS = [
    "A man aggressively kicks a stray dog on the street.",
    "This is an image of a a pyramid",
    "A group of teenagers vandalizes a public statue.",
]


def pre_caption(caption: str, max_words: int = 50) -> str:
    """Caption cleaner (reference `retrieval_helper.py:20-39`)."""
    caption = re.sub(r"([.!\"()*#:;~])", " ", caption.lower())
    caption = re.sub(r"\s{2,}", " ", caption)
    caption = caption.rstrip("\n").strip(" ")
    words = caption.split(" ")
    if len(words) > max_words:
        caption = " ".join(words[:max_words])
    return caption


def evaluate_scores(scores: np.ndarray, img2txt: Dict[int, List[int]],
                    txt2img: Dict[int, int]) -> Dict[str, float]:
    """Prec@1/5 both directions from an [n_images, n_texts] score matrix
    (reference `retrieval_helper.py:283-321`)."""
    text_p1, text_p5 = AverageMeter(), AverageMeter()
    for i in range(len(img2txt)):
        top5 = np.argsort(scores[i])[-5:]
        true = set(img2txt[i])
        text_p1.update(float(len(true & set(top5[-1:])) > 0))
        text_p5.update(float(len(true & set(top5)) > 0))
    img_p1, img_p5 = AverageMeter(), AverageMeter()
    for t in range(len(txt2img)):
        top5 = np.argsort(scores[:, t])[-5:]
        img_p1.update(float(txt2img[t] in top5[-1:]))
        img_p5.update(float(txt2img[t] in top5))
    return {"ImagePrec@1": img_p1.avg, "ImagePrec@5": img_p5.avg,
            "TextPrec@1": text_p1.avg, "TextPrec@5": text_p5.avg}


def embed_texts(scorer, text_params, tokenizer, texts: Sequence[str],
                batch_size: int = 256) -> np.ndarray:
    out = []
    for i in range(0, len(texts), batch_size):
        out.append(np.asarray(scorer.encode_text(
            text_params, tokenizer(texts[i:i + batch_size]), normalize=True)))
    return np.concatenate(out, axis=0)


def eval_retrieval(
    scorer: CandidateScorer,
    params,
    tokenizer,
    image_embeds: np.ndarray,        # [n_images, D] normalised
    captions: Sequence[str],
    img2txt: Dict[int, List[int]],
    txt2img: Dict[int, int],
    target: Optional[int] = None,    # index into RETRIEVAL_TARGETS
    objective: str = "l2",
    rho: int = 10,
    k: int = 1,
    out_csv: Optional[str] = None,
    attack_batch: int = 32,
) -> Dict[str, Dict[str, float]]:
    """Clean + adversarial retrieval metrics
    (reference `eval_retrieval.py:36-97`).

    Captions are attacked `attack_batch` at a time with the batched
    Charmer (identical per-caption search, shared device batches —
    the reference loops one caption at a time)."""
    text_params = params["text"]
    clean_embeds = embed_texts(scorer, text_params, tokenizer, captions)
    clean = evaluate_scores(image_embeds @ clean_embeds.T, img2txt, txt2img)

    ledger = ResultsLedger(out_csv, fresh=True, stream=True, columns=[
        "sentence", "sentence_adv", "distance"]) if out_csv else None

    adv_captions: List[str] = []
    for start in range(0, len(captions), attack_batch):
        chunk = list(captions[start:start + attack_batch])
        if target is not None:
            a = scorer.encode_text(
                text_params, tokenizer([RETRIEVAL_TARGETS[target]]))
            anchors = np.repeat(np.asarray(a), len(chunk), axis=0)
        else:
            anchors = np.asarray(scorer.encode_text(
                text_params, tokenizer(chunk)))
        advs = attack_text_charmer_batched(
            scorer, text_params, tokenizer, chunk, anchors,
            objective=objective, n=rho, k=k)
        adv_captions.extend(advs)
        if ledger is not None:
            for sent, adv in zip(chunk, advs):
                ledger.append({"sentence": sent, "sentence_adv": adv,
                               "distance": k})

    adv_embeds = embed_texts(scorer, text_params, tokenizer, adv_captions)
    adv = evaluate_scores(image_embeds @ adv_embeds.T, img2txt, txt2img)
    return {"clean": clean, "adv": adv, "adv_captions": adv_captions}


def main(argv=None):
    """Standalone COCO retrieval eval CLI
    (reference `eval_retrieval.py` __main__)."""
    import argparse
    import json as _json

    import jax.numpy as jnp

    from leaf_tpu.attacks.image import _normalize_images
    from leaf_tpu.data.coco import get_coco_retrieval
    from leaf_tpu.models import clip as lclip, create_model, get_tokenizer
    from leaf_tpu.models.preprocess import image_transform
    from leaf_tpu.utils.logging_utils import setup_logging

    p = argparse.ArgumentParser("leaf_tpu COCO retrieval eval")
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", default="")
    p.add_argument("--coco-root", required=True)
    p.add_argument("--annotation", required=True,
                   help="karpathy-split json (e.g. coco_karpathy_test.json)")
    p.add_argument("--num-samples", type=int, default=1000)
    p.add_argument("--target", type=int, default=None,
                   help="index into the fixed harmful target captions")
    p.add_argument("--objective", default="l2")
    p.add_argument("--rho", type=int, default=10)
    p.add_argument("--k", type=int, default=1)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--output", default="retrieval_results.json")
    args = p.parse_args(argv)
    setup_logging()

    model = create_model(args.model, args.pretrained or None,
                         precision=args.precision)
    cfg = model.cfg
    tokenizer = get_tokenizer(args.model)
    from leaf_tpu.attacks.engine import CandidateScorer
    scorer = CandidateScorer(cfg)
    preprocess = image_transform(cfg.vision.image_size, do_normalize=False)
    ds = get_coco_retrieval(args.coco_root, args.annotation, preprocess,
                            num_samples=args.num_samples)
    embeds = []
    for batch in ds.image_batches():
        embeds.append(np.asarray(lclip.encode_image_model(
            model.params, cfg, _normalize_images(jnp.asarray(batch), cfg),
            normalize=True)))
    image_embeds = np.concatenate(embeds, 0)
    out = eval_retrieval(scorer, model.params, tokenizer, image_embeds,
                         ds.text, ds.img2txt, ds.txt2img,
                         target=args.target, objective=args.objective,
                         rho=args.rho, k=args.k,
                         out_csv=args.output.replace(".json",
                                                     "_perturbations.csv"))
    result = {"clean": out["clean"], "adv": out["adv"]}
    with open(args.output, "w") as f:
        _json.dump(result, f, indent=2)
    LOG.info("results: %s", result)
    return result


if __name__ == "__main__":
    main()
