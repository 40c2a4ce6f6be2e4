"""Contrastive losses (CLIP / CoCa / SigLIP / distillation).

TPU-native re-expression of the reference losses
(`/root/reference/src/open_clip/loss.py`):

  * `clip_loss` — symmetric InfoNCE.  Under a mesh axis, features are
    all-gathered with `jax.lax.all_gather`, which is differentiable —
    the reference's `gather_with_grad` is free here, and its
    no-grad-gather workaround is unnecessary.  `local_loss=True`
    computes only this shard's logit rows against the gathered
    features (reference `loss.py:102-118`), the communication-optimal
    form.
  * `siglip_loss` — sigmoid loss with the ring neighbour-exchange
    (`loss.py:300-363`) expressed as `jax.lax.ppermute` steps.
  * `coca_loss`, `distill_clip_loss` — weighted combinations.

All functions are pure and must be called inside `shard_map` (or any
context where `axis_name` is bound) when distributed.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def _cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


def _gathered_logits(image_features, text_features, logit_scale,
                     axis_name: Optional[str], local_loss: bool):
    """(logits_per_image, logits_per_text, labels) — the shared
    gather/local-rows logic of clip_loss and distill_clip_loss
    (reference `loss.py:19-63` gather_features + label rule)."""
    B = image_features.shape[0]
    if axis_name is None:
        li = logit_scale * image_features @ text_features.T
        return li, li.T, jnp.arange(B)
    all_image = jax.lax.all_gather(image_features, axis_name, tiled=True)
    all_text = jax.lax.all_gather(text_features, axis_name, tiled=True)
    if local_loss:
        li = logit_scale * image_features @ all_text.T
        lt = logit_scale * text_features @ all_image.T
        return li, lt, jnp.arange(B) + B * jax.lax.axis_index(axis_name)
    li = logit_scale * all_image @ all_text.T
    return li, li.T, jnp.arange(all_image.shape[0])


def clip_loss(image_features: jnp.ndarray, text_features: jnp.ndarray,
              logit_scale, axis_name: Optional[str] = None,
              local_loss: bool = True, output_dict: bool = False):
    """Symmetric contrastive loss (reference `loss.py:66-131`)."""
    logits_per_image, logits_per_text, labels = _gathered_logits(
        image_features, text_features, logit_scale, axis_name, local_loss)
    total = (_cross_entropy(logits_per_image, labels)
             + _cross_entropy(logits_per_text, labels)) / 2
    if axis_name is not None:
        # mean over shards == DDP loss semantics (per-rank loss, averaged
        # gradients); also makes the scalar replicated for shard_map.
        total = jax.lax.pmean(total, axis_name)
    return {"contrastive_loss": total} if output_dict else total


def _siglip_pair_loss(image_features, text_features, logit_scale, logit_bias,
                      negative_only: bool):
    logits = logit_scale * image_features @ text_features.T
    if logit_bias is not None:
        logits = logits + logit_bias
    n = image_features.shape[0]
    labels = -jnp.ones((n, text_features.shape[0]), logits.dtype)
    if not negative_only:
        labels = labels + 2 * jnp.eye(n, text_features.shape[0], dtype=logits.dtype)
    return -jax.nn.log_sigmoid(labels * logits).sum() / n


def siglip_loss(image_features: jnp.ndarray, text_features: jnp.ndarray,
                logit_scale, logit_bias=None,
                axis_name: Optional[str] = None,
                output_dict: bool = False):
    """SigLIP sigmoid loss with ring exchange of text features
    (reference `loss.py:307-363`): each shard's images see every other
    shard's texts as negatives via world−1 `ppermute` hops."""
    loss = _siglip_pair_loss(image_features, text_features, logit_scale,
                             logit_bias, negative_only=False)
    if axis_name is not None:
        world = jax.lax.axis_size(axis_name)
        perm = [(i, (i + 1) % world) for i in range(world)]
        neighbour_text = text_features
        for _ in range(world - 1):
            neighbour_text = jax.lax.ppermute(neighbour_text, axis_name, perm)
            loss = loss + _siglip_pair_loss(
                image_features, neighbour_text, logit_scale, logit_bias,
                negative_only=True)
        loss = jax.lax.pmean(loss, axis_name)
    return {"contrastive_loss": loss} if output_dict else loss


def coca_loss(image_features, text_features, caption_logits, caption_labels,
              logit_scale, caption_loss_weight: float = 2.0,
              clip_loss_weight: float = 1.0, pad_id: int = 0,
              axis_name: Optional[str] = None, local_loss: bool = True,
              output_dict: bool = False):
    """CLIP contrastive + captioning CE with pad masking
    (reference `loss.py:134-178`).  caption_logits [B, S, V],
    caption_labels [B, S]."""
    c_loss = jnp.zeros(())
    if clip_loss_weight:
        c_loss = clip_loss_weight * clip_loss(
            image_features, text_features, logit_scale, axis_name, local_loss)
    logp = jax.nn.log_softmax(caption_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, caption_labels[..., None], axis=-1)[..., 0]
    mask = (caption_labels != pad_id).astype(nll.dtype)
    cap = caption_loss_weight * (nll * mask).sum() / jnp.maximum(mask.sum(), 1)
    if axis_name is not None:
        cap = jax.lax.pmean(cap, axis_name)
    if output_dict:
        return {"contrastive_loss": c_loss, "caption_loss": cap}
    return c_loss, cap


def distill_clip_loss(image_features, text_features, logit_scale,
                      dist_image_features, dist_text_features,
                      dist_logit_scale, axis_name: Optional[str] = None,
                      local_loss: bool = True, output_dict: bool = False):
    """Contrastive + KD from a teacher (reference `loss.py:181-216`)."""

    li, lt, labels = _gathered_logits(image_features, text_features,
                                      logit_scale, axis_name, local_loss)
    dli, dlt, _ = _gathered_logits(dist_image_features, dist_text_features,
                                   dist_logit_scale, axis_name, local_loss)
    contrastive = (_cross_entropy(li, labels) + _cross_entropy(lt, labels)) / 2

    def dist_loss(teacher, student):
        return -(jax.nn.softmax(teacher, axis=1)
                 * jax.nn.log_softmax(student, axis=1)).sum(axis=1).mean()

    distill = (dist_loss(dli, li) + dist_loss(dlt, lt)) / 2
    if axis_name is not None:
        contrastive = jax.lax.pmean(contrastive, axis_name)
        distill = jax.lax.pmean(distill, axis_name)
    if output_dict:
        return {"contrastive_loss": contrastive, "distill_loss": distill}
    return contrastive, distill


def create_loss(args):
    """Loss factory by flag surface (reference `factory.py:338-372`)."""
    import functools
    local_loss = getattr(args, "local_loss", False)
    if getattr(args, "distill", False):
        return functools.partial(distill_clip_loss, local_loss=local_loss)
    if getattr(args, "siglip", False):
        return siglip_loss
    if "coca" in getattr(args, "model", "").lower():
        return functools.partial(
            coca_loss, local_loss=local_loss,
            caption_loss_weight=getattr(args, "coca_caption_loss_weight", 2.0),
            clip_loss_weight=getattr(args, "coca_contrastive_loss_weight", 1.0))
    return functools.partial(clip_loss, local_loss=local_loss)
