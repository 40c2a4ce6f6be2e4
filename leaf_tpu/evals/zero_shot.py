"""In-training zero-shot evaluation harness.

Re-expression of the reference eval loop
(`/root/reference/utils_AT.py:91-260`):

  * ImageNet zero-shot: template-ensemble classifier, clean top1/top5 +
    PGD-attacked top1 (`utils_AT.py:91-129` `run`);
  * image-anchored zero-shot *text* classification on AG-News/SST-2:
    per-sentence Charmer classification attack, clean + adversarial
    accuracy (`utils_AT.py:131-156` `run_text_classification`).

Note the reference quirks preserved here: the classification attack
runs on the raw sentence while final scoring applies the caption
template; clean logits are scaled by 100 (equivalent to argmax).
"""
from __future__ import annotations

import functools
import logging
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.attacks.image import attack_image_classification, _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig
from leaf_tpu.models.zero_shot import (
    build_zero_shot_classifier,
    imagenet_classnames,
    openai_imagenet_templates,
)

LOG = logging.getLogger(__name__)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _clean_logits(params, cfg: CLIPConfig, images, classifier):
    feats = lclip.encode_image_model(params, cfg, _normalize_images(images, cfg),
                                     normalize=True)
    return 100.0 * feats @ classifier


def run_imagenet_eval(params, cfg: CLIPConfig, classifier, loader, key,
                      eps: float = 2 / 255, n_steps: int = 10,
                      stepsize: Optional[float] = None,
                      attack: bool = True):
    """(top1, top5, top1_adv) over an (images, labels) batch loader.
    Images arrive UN-normalised (attacks operate in pixel space,
    `train_AT_text_only.py:262-267`)."""
    top1 = top5 = top1_adv = n = 0
    for images, labels in loader:
        images = jnp.asarray(images)
        labels_j = jnp.asarray(labels)
        logits = np.asarray(_clean_logits(params, cfg, images, classifier))
        rank = (-logits).argsort(axis=-1)
        top1 += (rank[:, 0] == labels).sum()
        top5 += (rank[:, :5] == labels[:, None]).any(axis=-1).sum()
        if attack:
            key, sub = jax.random.split(key)
            adv = attack_image_classification(
                params, cfg, images, classifier, labels_j, sub,
                eps=eps, n_steps=n_steps, stepsize=stepsize)
            logits_adv = np.asarray(_clean_logits(params, cfg, adv, classifier))
            top1_adv += (logits_adv.argmax(-1) == labels).sum()
        n += len(labels)
    if n == 0:
        return 0.0, 0.0, 0.0
    return top1 / n, top5 / n, (top1_adv / n if attack else 0.0)


def run_text_classification(scorer: CandidateScorer, params, tokenizer,
                            image_features, textcls, n_charmer: int = 20,
                            k: int = 1, n_val: Optional[int] = None,
                            attack_batch: int = 16):
    """(clean_acc, adv_acc) — Charmer classification attack against
    image-anchored class embeddings, `attack_batch` sentences at a time
    (identical per-sentence search to the reference's sequential loop,
    `utils_AT.py:131-156`)."""
    from leaf_tpu.attacks.text import (
        attack_text_charmer_classification_batched,
    )
    samples = textcls.samples[:n_val] if n_val is not None \
        else textcls.samples
    # length-sorted chunks keep each chunk's probe-grid width and
    # context bucket at the CHUNK max instead of the dataset max
    # (decision-safe — per-sentence searches are row-independent,
    # test_eval_zero_shot_text_order_invariant); only aggregate
    # accuracies leave this function, so no order restore is needed
    samples = sorted(samples, key=lambda d: len(d["text"]))
    acc = acc_adv = n = 0
    template = textcls.template
    for start in range(0, len(samples), attack_batch):
        chunk = samples[start:start + attack_batch]
        sentences = [d["text"] for d in chunk]
        labels = [d["label"] for d in chunk]
        adv_sentences = attack_text_charmer_classification_batched(
            scorer, params["text"], tokenizer, sentences, image_features,
            labels, n=n_charmer, k=k, vocab=textcls.vocab)
        tokens = tokenizer([template.format(s) for s in sentences]
                           + [template.format(s) for s in adv_sentences])
        feats = scorer.encode_text(params["text"], tokens, normalize=True)
        probs = np.asarray(feats.astype(jnp.float32)
                           @ jnp.asarray(image_features).T.astype(jnp.float32))
        preds = probs.argmax(-1)
        B = len(chunk)
        acc += int((preds[:B] == labels).sum())
        acc_adv += int((preds[B:] == labels).sum())
        n += B
    if n == 0:
        return 0.0, 0.0
    return acc / n, acc_adv / n


def encode_anchor_images(params, cfg: CLIPConfig, textcls, preprocess):
    """Normalised class-anchor image embeddings [K, D]."""
    images = jnp.asarray(textcls.anchor_images(preprocess))
    feats = lclip.encode_image_model(params, cfg, _normalize_images(images, cfg),
                                     normalize=True)
    return feats


def zero_shot_eval(params, cfg: CLIPConfig, data: Dict, tokenizer,
                   preprocess, epoch: int, args, scorer=None, key=None
                   ) -> Dict[str, float]:
    """Full zero-shot eval pass (reference `utils_AT.py:159-260`)."""
    if not any(k in data for k in
               ("imagenet-val", "imagenet-v2", "train-agnews", "train-sst2",
                "val-agnews", "val-sst2")):
        return {}
    zf = getattr(args, "zeroshot_frequency", 1)
    if zf == 0:
        return {}
    if (epoch % zf) != 0 and epoch != getattr(args, "epochs", epoch):
        return {}

    if scorer is None:
        scorer = CandidateScorer(cfg)
    if key is None:
        key = jax.random.PRNGKey(getattr(args, "seed", 0))
    results: Dict[str, float] = {}

    if "imagenet-val" in data or "imagenet-v2" in data:
        LOG.info("Building zero-shot classifier")
        classifier = build_zero_shot_classifier(
            lambda toks: scorer.encode_text(params["text"], toks),
            tokenizer, imagenet_classnames(), openai_imagenet_templates(),
            num_classes_per_batch=10)
        for name, out_prefix in (("imagenet-val", "imagenet"),
                                 ("imagenet-v2", "imagenetv2")):
            if name not in data:
                continue
            top1, top5, top1_adv = run_imagenet_eval(
                params, cfg, classifier, data[name].loader, key,
                eps=getattr(args, "eps_adv", 2 / 255),
                n_steps=getattr(args, "n_steps_adv", 10),
                stepsize=getattr(args, "stepsize_adv", None))
            results[f"{out_prefix}-zeroshot-val-top1"] = top1
            results[f"{out_prefix}-zeroshot-val-top5"] = top5
            # deviation from the reference (utils_AT.py:192,198): it
            # writes BOTH splits' adv accuracy to the same un-prefixed
            # key, so imagenet-v2 silently overwrites imagenet-val's
            # number — prefix the v2 key instead of losing a metric
            adv_key = ("imagenet-zeroshot-val-top1-adv"
                       if out_prefix == "imagenet" else
                       f"{out_prefix}-zeroshot-val-top1-adv")
            results[adv_key] = top1_adv

    for split in ("val", "train"):
        for name in ("agnews", "sst2"):
            dkey = f"{split}-{name}"
            if dkey not in data:
                continue
            textcls = data[dkey]
            anchors = encode_anchor_images(params, cfg, textcls, preprocess)
            acc, acc_adv = run_text_classification(
                scorer, params, tokenizer, anchors, textcls,
                n_charmer=getattr(args, "n_charmer_test", 20),
                k=getattr(args, "k_adv_test", 1),
                n_val=getattr(args, "n_val_text", None))
            results[f"{name}-zeroshot-{split}-acc"] = acc
            results[f"{name}-zeroshot-{split}-acc-adv"] = acc_adv

    return results


def imagenet_zero_shot_clean(params, cfg: CLIPConfig, datainfo, tokenizer,
                             dtype=jnp.float32) -> Dict[str, float]:
    """Clean-only ImageNet zero-shot top1/top5 (the vanilla contrastive
    trainer's eval, reference `open_clip_train/zero_shot.py`)."""
    del dtype  # classifier/eval run in the scorer's default precision
    scorer = CandidateScorer(cfg)
    classifier = build_zero_shot_classifier(
        lambda toks: scorer.encode_text(params["text"], toks),
        tokenizer, imagenet_classnames(), openai_imagenet_templates(),
        num_classes_per_batch=10)
    top1, top5, _ = run_imagenet_eval(
        params, cfg, classifier, datainfo.loader, jax.random.PRNGKey(0),
        attack=False)
    return {"imagenet-zeroshot-val-top1": top1,
            "imagenet-zeroshot-val-top5": top5}
