"""Vanilla contrastive CLIP trainer (the reference's open_clip_train).

Re-expression of `/root/reference/src/open_clip_train/{main,train}.py`:
standard InfoNCE training of both towers with the distributed
feature-gather loss, plus the evaluation path (val contrastive loss +
image↔text recall@K metrics, `utils_AT.py:530-547` get_clip_metrics).

The train step runs under `shard_map` over the `data` mesh axis so the
contrastive all_gather is an ICI collective inside one compiled step
(reference `gather_features`, `loss.py:19-63`).
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig
from leaf_tpu.models.loss import clip_loss, siglip_loss
from leaf_tpu.train.step import TrainState

LOG = logging.getLogger(__name__)


def contrastive_loss_fn(params, cfg: CLIPConfig, images, tokens,
                        axis_name: Optional[str] = None,
                        local_loss: bool = True, siglip: bool = False,
                        dtype=jnp.float32):
    out = lclip.forward(params, cfg, images, tokens, dtype)
    img_f = out["image_features"].astype(jnp.float32)
    txt_f = out["text_features"].astype(jnp.float32)
    scale = out["logit_scale"].astype(jnp.float32)
    if siglip:
        return siglip_loss(img_f, txt_f, scale,
                           out.get("logit_bias"), axis_name)
    return clip_loss(img_f, txt_f, scale, axis_name, local_loss)


def make_contrastive_train_step(cfg: CLIPConfig,
                                tx: optax.GradientTransformation,
                                mesh=None, local_loss: bool = True,
                                siglip: bool = False, dtype=jnp.float32):
    """Jitted full-model contrastive step; with a mesh, the loss runs
    under shard_map with batch sharded over `data`."""

    def loss_of(params, images, tokens):
        if mesh is None:
            return contrastive_loss_fn(params, cfg, images, tokens,
                                       None, local_loss, siglip, dtype)

        def inner(params, images, tokens):
            return contrastive_loss_fn(params, cfg, images, tokens,
                                       "data", local_loss, siglip, dtype)

        return jax.shard_map(
            inner, mesh=mesh,
            in_specs=(P(), P("data"), P("data")), out_specs=P())(
                params, images, tokens)

    def step_fn(state: TrainState, images, tokens):
        loss, grads = jax.value_and_grad(loss_of)(
            state.text_params, images, tokens)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.text_params)
        params = optax.apply_updates(state.text_params, updates)
        # clamp logit_scale to ln(100) (`train.py` post-step clamp)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         math.log(100.0))
        return (TrainState(text_params=params, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss,
                 "logit_scale": jnp.exp(params["logit_scale"])})

    return jax.jit(step_fn, donate_argnums=(0,))


def get_clip_metrics(image_features, text_features, logit_scale
                     ) -> Dict[str, float]:
    """Retrieval metrics: mean rank, median rank, R@1/5/10 both ways
    (reference `utils_AT.py:530-547`)."""
    image_features = np.asarray(image_features)
    text_features = np.asarray(text_features)
    logits_per_image = float(logit_scale) * image_features @ text_features.T
    logits = {"image_to_text": logits_per_image,
              "text_to_image": logits_per_image.T}
    metrics = {}
    n = image_features.shape[0]
    ground_truth = np.arange(n)[:, None]
    for name, logit in logits.items():
        ranking = np.argsort(-logit, axis=1)
        preds = np.where(ranking == ground_truth)[1]
        metrics[f"{name}_mean_rank"] = float(preds.mean() + 1)
        metrics[f"{name}_median_rank"] = float(np.floor(np.median(preds)) + 1)
        for k in (1, 5, 10):
            metrics[f"{name}_R@{k}"] = float((preds < k).mean())
    return metrics


def evaluate_contrastive(params, cfg: CLIPConfig, loader, tokenizer,
                         dtype=jnp.float32) -> Dict[str, float]:
    """Val contrastive loss + recall metrics over a (images, texts)
    loader (reference `utils_AT.py:441-505` evaluate val path)."""
    all_img, all_txt = [], []
    total_loss, n = 0.0, 0
    fwd = jax.jit(functools.partial(lclip.forward, cfg=cfg, dtype=dtype),
                  static_argnames=())
    for images, texts in loader:
        tokens = jnp.asarray(tokenizer(texts))
        out = lclip.forward(params, cfg, jnp.asarray(images), tokens, dtype)
        img_f, txt_f = out["image_features"], out["text_features"]
        scale = out["logit_scale"]
        B = img_f.shape[0]
        logits = scale * img_f.astype(jnp.float32) @ txt_f.T.astype(jnp.float32)
        labels = jnp.arange(B)
        logp_i = jax.nn.log_softmax(logits, -1)
        logp_t = jax.nn.log_softmax(logits.T, -1)
        loss = -(jnp.take_along_axis(logp_i, labels[:, None], 1).mean()
                 + jnp.take_along_axis(logp_t, labels[:, None], 1).mean()) / 2
        total_loss += float(loss) * B
        n += B
        all_img.append(np.asarray(img_f))
        all_txt.append(np.asarray(txt_f))
    if n == 0:
        return {}
    img = np.concatenate(all_img)
    txt = np.concatenate(all_txt)
    metrics = get_clip_metrics(img, txt, float(jnp.exp(params["logit_scale"])))
    metrics["clip_val_loss"] = total_loss / n
    metrics["num_samples"] = n
    return metrics
