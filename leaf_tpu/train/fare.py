"""FARE image-encoder adversarial finetuning.

TPU-native re-expression of the reference's single-file trainer
(`/root/reference/src/robust_vlm/train/adversarial_training_clip.py`):
unsupervised L2 embedding adversarial training of the *vision* tower —
inner max: PGD-10 (or APGD) pushing the embedding away from the frozen
model's embedding; outer min: ‖f(x_adv) − f_frozen(x)‖² (+ optional
clean-weight and TRADES variants; CE losses when a zero-shot classifier
is supplied).

Structure: the inner attack and the outer update are each one jitted
computation; the frozen tower is a second param pytree through the same
apply fn.
"""
from __future__ import annotations

import dataclasses
import functools
import logging
import math
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from leaf_tpu.attacks.apgd import apgd
from leaf_tpu.attacks.image import pgd, _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig
from leaf_tpu.train.schedules import cosine_lr
from leaf_tpu.train.step import TrainState
from leaf_tpu.utils.meters import AverageMeter

LOG = logging.getLogger(__name__)


def encode_vision(visual_params, cfg: CLIPConfig, images, output_normalize,
                  dtype=jnp.float32, remat: bool = False):
    """Images in [0,1] → embedding (normalisation folded in, reference
    ClipVisionModel `adversarial_training_clip.py:263-281`)."""
    return lclip.encode_image(visual_params, cfg.vision,
                              _normalize_images(images, cfg), cfg.quick_gelu,
                              normalize=output_normalize, dtype=dtype,
                              remat=remat)


def embedding_loss(loss_str: str, embedding, embedding_orig, targets=None,
                   classifier=None, logit_scale: float = 100.0,
                   reduction: str = "mean"):
    """FARE loss menu (reference `adversarial_training_clip.py:558-600`)."""
    emb32 = embedding.astype(jnp.float32)
    if loss_str == "l2":
        per = jnp.square(emb32 - embedding_orig.astype(jnp.float32)).sum(-1)
    elif loss_str == "l1":
        per = jnp.abs(emb32 - embedding_orig.astype(jnp.float32)).sum(-1)
    elif loss_str == "ce":
        logits = emb32 @ (logit_scale * classifier.astype(jnp.float32))
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
    elif loss_str == "ce_reg":
        return (0.7 * embedding_loss("ce", embedding, embedding_orig,
                                     targets, classifier, logit_scale,
                                     reduction)
                + 0.3 * embedding_loss("l2", embedding, embedding_orig,
                                       reduction=reduction))
    else:
        raise ValueError(f"loss {loss_str!r} not supported")
    return per.mean() if reduction == "mean" else per


@dataclasses.dataclass
class FareConfig:
    """Flag surface of the reference trainer
    (`adversarial_training_clip.py:35-68`)."""
    steps: int = 10000
    warmup: int = 700
    batch_size: int = 128
    lr: float = 1e-5
    wd: float = 1e-4
    opt: str = "adamw"
    momentum_sgd: float = 0.9
    attack: str = "pgd"            # pgd | apgd | none
    norm: str = "linf"
    eps: float = 2 / 255           # caller divides by 255 as in reference
    iterations_adv: int = 10
    stepsize_adv: float = 1 / 255
    inner_loss: str = "l2"
    loss: str = "l2"
    loss_clean: str = "l2"
    clean_weight: float = 0.0
    trades: bool = False
    output_normalize: bool = False
    grad_clip: bool = False
    log_freq: int = 10
    # rolling crash-recovery checkpoint cadence (reference saves a
    # 'fallback' model every 20 steps and GCs the previous one,
    # `adversarial_training_clip.py:481-490,253-255`); 0 disables
    fallback_freq: int = 20
    eval_freq: int = 50
    # rematerialise residual blocks in differentiated encodes.  Without
    # it, the PGD backward through a ViT-L at the canonical bs=128
    # saves 24 layers of fp32 attention probs (~20 GB) and cannot fit a
    # 16 GB v5e chip; remat trades ~1 extra forward per backward.
    remat: bool = True


def make_fare_optimizer(fcfg: FareConfig) -> optax.GradientTransformation:
    schedule = cosine_lr(fcfg.lr, fcfg.warmup, fcfg.steps)
    if fcfg.opt == "sgd":
        opt = optax.chain(
            optax.trace(decay=fcfg.momentum_sgd),
            optax.add_decayed_weights(fcfg.wd),
            optax.scale_by_learning_rate(schedule))
    else:
        opt = optax.chain(
            optax.scale_by_adam(),
            optax.add_decayed_weights(fcfg.wd),
            optax.scale_by_learning_rate(schedule))
    if fcfg.grad_clip:
        opt = optax.chain(optax.clip_by_global_norm(1.0), opt)
    return opt


def make_fare_attack(cfg: CLIPConfig, fcfg: FareConfig, dtype=jnp.float32):
    """Jitted inner maximisation on the *trainable* tower."""

    @functools.partial(jax.jit, static_argnames=())
    def attack(visual_params, images, embedding_orig, targets, classifier,
               key):
        def loss_fn(x_adv):
            emb = encode_vision(visual_params, cfg, x_adv,
                                fcfg.output_normalize, dtype,
                                remat=fcfg.remat)
            return embedding_loss(
                fcfg.inner_loss, emb, embedding_orig, targets, classifier,
                reduction="mean" if fcfg.attack == "pgd" else "none")

        if fcfg.attack == "none":
            return images
        if fcfg.attack == "apgd":
            # is_train=True → L1 starts at the sparser top-k fraction
            # (reference `apgd_train.py:162` train-mode init)
            return apgd(loss_fn, images, norm=fcfg.norm, eps=fcfg.eps,
                        n_iter=fcfg.iterations_adv, is_train=True)
        # PGD with uniform init (reference passes a uniform perturbation,
        # `adversarial_training_clip.py:352`).  The raw init is forwarded
        # unclamped — exactly as the reference does — and the image box
        # is enforced only at each iteration's end inside `pgd`
        # (`pgd_train.py:46-49`); clamping before the first forward
        # would change the first step's gradients (ADVICE r4).
        pert0 = fcfg.eps * (2 * jax.random.uniform(key, images.shape,
                                                   images.dtype) - 1)
        return pgd(loss_fn, images, norm=fcfg.norm, eps=fcfg.eps,
                   iterations=fcfg.iterations_adv,
                   stepsize=fcfg.stepsize_adv, mode="max",
                   perturbation=pert0)

    return attack


def make_fare_train_step(cfg: CLIPConfig, fcfg: FareConfig,
                         tx: optax.GradientTransformation,
                         dtype=jnp.float32):
    """Jitted outer update: returns (state', metrics)."""

    def step_fn(state: TrainState, embedding_orig, images, adv_images,
                targets, classifier):
        # embedding_orig comes from the loop's anchor_encode (the
        # frozen tower never changes) — recomputing the frozen forward
        # here doubled the per-step frozen-encode cost

        def loss_fn(visual_params):
            emb_clean = encode_vision(visual_params, cfg, images,
                                      fcfg.output_normalize, dtype,
                                      remat=fcfg.remat)
            loss_clean = jnp.zeros(())
            if fcfg.clean_weight > 0:
                loss_clean = embedding_loss(fcfg.loss_clean, emb_clean,
                                            embedding_orig, targets,
                                            classifier)
            emb_adv = encode_vision(visual_params, cfg, adv_images,
                                    fcfg.output_normalize, dtype,
                                    remat=fcfg.remat)
            anchor = (jax.lax.stop_gradient(emb_clean) if fcfg.trades
                      else embedding_orig)
            loss_adv = embedding_loss(fcfg.loss, emb_adv, anchor, targets,
                                      classifier)
            total = fcfg.clean_weight * loss_clean \
                + (1 - fcfg.clean_weight) * loss_adv
            cos = jnp.mean(jnp.sum(
                lclip.l2_normalize(emb_adv.astype(jnp.float32))
                * lclip.l2_normalize(embedding_orig.astype(jnp.float32)),
                axis=-1))
            return total, {"loss": loss_adv, "loss_clean": loss_clean,
                           "cos_sim": cos}

        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.text_params)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.text_params)
        new_params = optax.apply_updates(state.text_params, updates)
        return TrainState(text_params=new_params, opt_state=opt_state,
                          step=state.step + 1), metrics

    return jax.jit(step_fn, donate_argnums=(0,))


def train_fare(model_params, cfg: CLIPConfig, fcfg: FareConfig, data_iter,
               classifier=None, seed: int = 0,
               on_step: Optional[Callable[[int, Dict], None]] = None,
               checkpoint_fn: Optional[Callable[[int, Any], None]] = None,
               fallback_fn: Optional[Callable[[int, Any], None]] = None,
               mesh=None, init_state: Optional[TrainState] = None,
               start_step: int = 0, dtype=jnp.float32) -> Dict:
    """Run FARE training for fcfg.steps optimizer steps.

    `dtype` is the compute dtype of every encode in the step (PGD inner
    loop, train fwd/bwd, frozen anchor) — LN/softmax and the loss stay
    fp32 inside the tower as everywhere else.  The CLI derives it from
    `--precision` (bf16 default); fp32 here keeps library callers and
    existing tests bit-stable.

    data_iter yields (images [B,H,W,3] in [0,1], targets or None).
    Checkpointing: 10 evenly-spaced milestones + the final step
    (reference `adversarial_training_clip.py:474-490`); `fallback_fn`
    runs every `fcfg.fallback_freq` steps for crash recovery (the
    reference's rolling fallback_<step>.pt, `:481-490`).
    `init_state`/`start_step` resume from a recovered checkpoint
    (params + optimizer moments + step counter; the data stream
    restarts, like the reference's manual fallback recovery).
    With a mesh, image/target batches shard over `data` (params
    replicated; GSPMD inserts the grad psum — the reference's
    DataParallel, `adversarial_training_clip.py:189-191`).
    """
    from leaf_tpu.parallel.sharding import put_batch
    tx = make_fare_optimizer(fcfg)
    if mesh is not None:
        from leaf_tpu.parallel.mesh import replicate
        model_params = replicate(model_params, mesh)
    frozen_visual = jax.tree.map(jnp.copy, model_params["visual"])
    # copy into the state: the jitted step donates its buffers, which
    # must not alias the caller's params
    if init_state is not None:
        state = TrainState(
            text_params=jax.tree.map(jnp.asarray, init_state.text_params),
            opt_state=jax.tree.map(jnp.asarray, init_state.opt_state),
            step=jnp.asarray(init_state.step))
        if mesh is not None:
            from leaf_tpu.parallel.mesh import replicate
            state = replicate(state, mesh)
    else:
        state = TrainState.create(jax.tree.map(jnp.copy,
                                               model_params["visual"]), tx)
    attack = make_fare_attack(cfg, fcfg, dtype=dtype)
    train_step = make_fare_train_step(cfg, fcfg, tx, dtype=dtype)
    anchor_encode = jax.jit(lambda p, x: encode_vision(
        p, cfg, x, fcfg.output_normalize, dtype=dtype))

    milestones = {int(fcfg.steps * (i + 1) / 10) for i in range(10)}
    key = jax.random.PRNGKey(seed)
    if start_step:
        key = jax.random.fold_in(key, start_step)
    loss_m = AverageMeter()
    step_total = start_step
    t0 = time.time()

    # deferred metric reads: float(metrics[...]) right after the
    # dispatch blocks on the device (a full round trip per step on the
    # tunneled TPU backend).  Each step's metrics start an async
    # device->host copy and are consumed one step later (flushed after
    # the loop); log-line content is unchanged, emitted one step late.
    pending = None

    def _flush(rec):
        if rec is None:
            return
        m, n, stp = rec
        loss_m.update(float(m["loss"]), n)
        if on_step is not None:
            on_step(stp, {k: float(v) for k, v in m.items()})
        if stp % fcfg.log_freq == 0:
            LOG.info("FARE step %d/%d loss %.5g (%.5g) cos %.4f [%.2fs/step]",
                     stp, fcfg.steps, loss_m.val, loss_m.avg,
                     float(m["cos_sim"]),
                     (time.time() - t0) / max(stp - start_step, 1))
    for images, targets in data_iter:
        if step_total >= fcfg.steps:
            break
        # dummy targets must be sized from the HOST-LOCAL batch: the
        # global images array is already stitched, so zeros built from
        # its length would re-stitch to n_hosts× the batch
        local_n = np.shape(images)[0]
        images = put_batch(images, mesh)
        targets_j = put_batch(
            targets if targets is not None
            else np.zeros((local_n,), np.int32), mesh)
        cls = classifier if classifier is not None else \
            jnp.zeros((model_params["visual"]["proj"].shape[1], 1))
        key, sub = jax.random.split(key)
        embedding_orig = anchor_encode(frozen_visual, images)
        adv = attack(state.text_params, images, embedding_orig, targets_j,
                     cls, sub)
        state, metrics = train_step(state, embedding_orig, images, adv,
                                    targets_j, cls)
        step_total += 1
        for v in metrics.values():
            try:
                v.copy_to_host_async()
            except AttributeError:
                pass
        _flush(pending)
        pending = (metrics, local_n, step_total)
        if checkpoint_fn is not None and step_total in milestones:
            checkpoint_fn(step_total, state)
        if fallback_fn is not None and fcfg.fallback_freq \
                and step_total % fcfg.fallback_freq == 0:
            fallback_fn(step_total, state)

    _flush(pending)
    out_params = dict(model_params)
    out_params["visual"] = state.text_params
    return {"params": out_params, "state": state, "steps": step_total,
            "final_loss": loss_m.avg}
