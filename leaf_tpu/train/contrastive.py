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
from jax.sharding import PartitionSpec as P

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig
from leaf_tpu.models.loss import clip_loss, siglip_loss
from leaf_tpu.train.step import TrainState

LOG = logging.getLogger(__name__)


def contrastive_loss_fn(params, cfg: CLIPConfig, images, tokens,
                        axis_name: Optional[str] = None,
                        local_loss: bool = True, siglip: bool = False,
                        dtype=jnp.float32, dropout_key=None):
    if dropout_key is not None and cfg.vision.patch_dropout > 0:
        # patch-dropout training path (`--force-patch-dropout`)
        out = {
            "image_features": lclip.encode_image_model(
                params, cfg, images, normalize=True, dtype=dtype,
                dropout_key=dropout_key),
            "text_features": lclip.encode_text(
                params["text"], cfg.text, tokens, cfg.quick_gelu,
                True, dtype),
            "logit_scale": jnp.exp(params["logit_scale"]),
        }
        if "logit_bias" in params:
            out["logit_bias"] = params["logit_bias"]
    else:
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
                                siglip: bool = False, dtype=jnp.float32,
                                base_dropout_key=None):
    """Jitted full-model contrastive step; with a mesh, the loss runs
    under shard_map with batch sharded over `data`.  With
    `base_dropout_key` (and cfg.vision.patch_dropout > 0), each step
    applies patch dropout with a key folded from the step counter."""

    def loss_of(params, images, tokens, dropout_key):
        if mesh is None:
            return contrastive_loss_fn(params, cfg, images, tokens,
                                       None, local_loss, siglip, dtype,
                                       dropout_key)

        def inner(params, images, tokens):
            key = dropout_key
            if key is not None:
                # fold in the shard index: a replicated key would draw
                # IDENTICAL per-sample dropout masks on every shard
                key = jax.random.fold_in(key,
                                         jax.lax.axis_index("data"))
            return contrastive_loss_fn(params, cfg, images, tokens,
                                       "data", local_loss, siglip, dtype,
                                       key)

        # check_vma=False: the towers may lower to pallas_call whose
        # out_shape avals carry no varying-mesh-axes info
        return jax.shard_map(
            inner, mesh=mesh, check_vma=False,
            in_specs=(P(), P("data"), P("data")), out_specs=P())(
                params, images, tokens)

    def step_fn(state: TrainState, images, tokens):
        dropout_key = None
        if base_dropout_key is not None:
            dropout_key = jax.random.fold_in(base_dropout_key, state.step)
        loss, grads = jax.value_and_grad(loss_of)(
            state.text_params, images, tokens, dropout_key)
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


def make_accum_contrastive_train_step(cfg: CLIPConfig,
                                      tx: optax.GradientTransformation,
                                      accum_freq: int,
                                      dtype=jnp.float32):
    """Gradient accumulation with the contrastive feature-cache trick
    (reference `open_clip_train/train.py:78-136`).

    Plain accumulation would contrast each microbatch only against
    itself; instead: (1) a no-grad pass caches features of ALL
    microbatches, (2) each microbatch is re-run with grad and spliced
    into the cached global feature matrix, so every microbatch sees the
    full effective batch as negatives.  One jitted step:
    step(state, images [k, b, H, W, 3], tokens [k, b, C]).
    """

    def step_fn(state: TrainState, images, tokens):
        params = state.text_params
        k, b = images.shape[0], images.shape[1]

        def fwd(p, im, tk):
            out = lclip.forward(p, cfg, im, tk, dtype)
            return (out["image_features"].astype(jnp.float32),
                    out["text_features"].astype(jnp.float32),
                    out["logit_scale"].astype(jnp.float32))

        # pass 1: cached features, no grad
        def cache_one(_, chunk):
            im, tk = chunk
            img_f, txt_f, _ = fwd(params, im, tk)
            return None, (img_f, txt_f)

        _, (all_img, all_txt) = jax.lax.scan(cache_one, None,
                                             (images, tokens))
        all_img = jax.lax.stop_gradient(all_img.reshape(k * b, -1))
        all_txt = jax.lax.stop_gradient(all_txt.reshape(k * b, -1))

        def chunk_loss(p, im, tk, j):
            img_f, txt_f, scale = fwd(p, im, tk)
            img = jax.lax.dynamic_update_slice(all_img, img_f, (j * b, 0))
            txt = jax.lax.dynamic_update_slice(all_txt, txt_f, (j * b, 0))
            logits = scale * img @ txt.T
            labels = jnp.arange(k * b)
            logp_i = jax.nn.log_softmax(logits, -1)
            logp_t = jax.nn.log_softmax(logits.T, -1)
            return -(jnp.take_along_axis(logp_i, labels[:, None], 1).mean()
                     + jnp.take_along_axis(logp_t, labels[:, None], 1).mean()
                     ) / 2

        # pass 2: accumulate grads per microbatch
        def accum_one(carry, chunk):
            grads_acc, loss_acc, j = carry
            im, tk = chunk
            loss, grads = jax.value_and_grad(chunk_loss)(params, im, tk, j)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            return (grads_acc, loss_acc + loss, j + 1), None

        zero = jax.tree.map(jnp.zeros_like, params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            accum_one, (zero, jnp.zeros(()), jnp.zeros((), jnp.int32)),
            (images, tokens))
        # each chunk loss is already a mean over the full k·b effective
        # batch, so the SUM of chunk grads equals the exact full-batch
        # gradient for the TOWER params (only chunk j's features are
        # live in chunk j's loss).  logit_scale is live in EVERY chunk,
        # so its gradient comes out k×— the reference's accum has the
        # same quirk (it sums per-chunk backwards with no division,
        # `train.py:118-136`); dividing here would shrink the tower
        # update k-fold and distort clip_by_global_norm

        updates, opt_state = tx.update(grads, state.opt_state, params)
        new_params = optax.apply_updates(params, updates)
        new_params = dict(new_params)
        new_params["logit_scale"] = jnp.clip(new_params["logit_scale"], 0.0,
                                             math.log(100.0))
        return (TrainState(text_params=new_params, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss_sum / accum_freq})

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


@functools.lru_cache(maxsize=8)
def _eval_batch_jit(cfg: CLIPConfig, dtype):
    """One compiled eval step per (cfg, dtype) — defining the jit
    inside evaluate_contrastive retraced the full two-tower forward on
    every eval call."""

    @jax.jit
    def eval_batch(params, images, tokens):
        out = lclip.forward(params, cfg, images, tokens, dtype)
        img_f, txt_f = out["image_features"], out["text_features"]
        scale = out["logit_scale"]
        logits = (scale * img_f.astype(jnp.float32)
                  @ txt_f.T.astype(jnp.float32))
        labels = jnp.arange(img_f.shape[0])
        logp_i = jax.nn.log_softmax(logits, -1)
        logp_t = jax.nn.log_softmax(logits.T, -1)
        loss = -(jnp.take_along_axis(logp_i, labels[:, None], 1).mean()
                 + jnp.take_along_axis(logp_t, labels[:, None], 1).mean()) / 2
        return img_f, txt_f, loss

    return eval_batch


def evaluate_contrastive(params, cfg: CLIPConfig, loader, tokenizer,
                         dtype=jnp.float32) -> Dict[str, float]:
    """Val contrastive loss + recall metrics over a (images, texts)
    loader (reference `utils_AT.py:441-505` evaluate val path)."""
    all_img, all_txt = [], []
    total_loss, n = 0.0, 0
    eval_batch = _eval_batch_jit(cfg, dtype)

    for images, texts in loader:
        tokens = jnp.asarray(tokenizer(texts))
        img_f, txt_f, loss = eval_batch(params, jnp.asarray(images), tokens)
        B = img_f.shape[0]
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


def make_coca_train_step(cfg, tx: optax.GradientTransformation, mesh=None,
                         caption_loss_weight: float = 2.0,
                         clip_loss_weight: float = 1.0,
                         local_loss: bool = True, dtype=jnp.float32):
    """Jitted CoCa training step: contrastive + captioning CE
    (reference `open_clip_train/main.py` with a coca model +
    `loss.py:134-178` CoCaLoss); with a mesh the loss runs under
    shard_map over `data`."""
    from leaf_tpu.models import coca as lcoca
    from leaf_tpu.models.loss import coca_loss

    def loss_fn(params, images, tokens, axis_name=None):
        out = lcoca.forward(params, cfg, images, tokens, dtype)
        c, cap = coca_loss(
            out["image_features"].astype(jnp.float32),
            out["text_features"].astype(jnp.float32),
            out["logits"].astype(jnp.float32),
            out["labels"],
            out["logit_scale"].astype(jnp.float32),
            caption_loss_weight=caption_loss_weight,
            clip_loss_weight=clip_loss_weight,
            pad_id=cfg.pad_id, axis_name=axis_name, local_loss=local_loss)
        return c + cap

    def loss_of(params, images, tokens):
        if mesh is None:
            return loss_fn(params, images, tokens)
        return jax.shard_map(
            lambda p, im, tk: loss_fn(p, im, tk, "data"),
            mesh=mesh, check_vma=False,
            in_specs=(P(), P("data"), P("data")),
            out_specs=P())(params, images, tokens)

    def step_fn(state: TrainState, images, tokens):
        loss, grads = jax.value_and_grad(loss_of)(
            state.text_params, images, tokens)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.text_params)
        params = optax.apply_updates(state.text_params, updates)
        params = dict(params)
        params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                         math.log(100.0))
        return (TrainState(text_params=params, opt_state=opt_state,
                           step=state.step + 1),
                {"loss": loss,
                 "logit_scale": jnp.exp(params["logit_scale"])})

    return jax.jit(step_fn, donate_argnums=(0,))
