"""Vanilla contrastive CLIP pretraining driver.

The reference ships a complete standalone CLIP trainer
(`/root/reference/src/open_clip_train/main.py`, 508 LoC) that both its
test suite and FARE build on; this is its TPU-native counterpart:

  * both towers train (no vision freeze — unlike the LEAF driver),
  * symmetric InfoNCE under `shard_map` over the `data` mesh axis with
    a differentiable `lax.all_gather` (`--local-loss` selects the
    per-shard logit-rows form, reference `loss.py:102-118`),
  * `--siglip` swaps in the sigmoid loss with the `ppermute` ring
    (reference `loss.py:300-363`),
  * `--distill-model`/`--distill-pretrained` adds the KD term from a
    frozen teacher (reference `loss.py:181-216`, `main.py:305-319`),
  * `--accum-freq k` uses the feature-cache trick so every microbatch
    sees the full effective batch as negatives (`train.py:78-136`),
  * Orbax checkpointing/resume, cosine/const schedules, results ledger
    and `--report-to wandb,tensorboard` trackers.

Run e.g.:
  python -m leaf_tpu.train.contrastive_driver --model ViT-tiny-test \
    --dataset-type synthetic --train-num-samples 32 --batch-size 8 \
    --epochs 1 --lr 1e-4
"""
from __future__ import annotations

import logging
import math
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from leaf_tpu.models import clip as lclip
from leaf_tpu.models import create_model_and_transforms, get_tokenizer
from leaf_tpu.models.loss import distill_clip_loss
from leaf_tpu.parallel import create_mesh, replicate
from leaf_tpu.train import checkpoint as ckpt
from leaf_tpu.train.contrastive import (
    evaluate_contrastive,
    make_accum_contrastive_train_step,
    make_contrastive_train_step,
)
from leaf_tpu.train.optim import make_optimizer
from leaf_tpu.train.params import parse_args
from leaf_tpu.train.schedules import make_scheduler
from leaf_tpu.train.step import TrainState
from leaf_tpu.utils.logging_utils import setup_logging
from leaf_tpu.utils.meters import AverageMeter
from leaf_tpu.utils.results import ResultsLedger

LOG = logging.getLogger(__name__)

RESULT_COLUMNS = [
    "epoch", "train_loss", "clip_val_loss",
    "image_to_text_R@1", "image_to_text_R@5",
    "text_to_image_R@1", "text_to_image_R@5",
    "imagenet-zeroshot-val-top1", "imagenet-zeroshot-val-top5",
]


def make_distill_train_step(cfg, teacher_cfg, tx, mesh=None,
                            local_loss: bool = True, dtype=jnp.float32):
    """Contrastive + KD step; the frozen teacher's params are a second
    pytree argument (no module deepcopy — reference `main.py:305-319`)."""

    def loss_of(params, teacher_params, images, tokens):
        def inner(params, teacher_params, images, tokens, axis_name=None):
            out = lclip.forward(params, cfg, images, tokens, dtype)
            t_out = lclip.forward(teacher_params, teacher_cfg, images,
                                  tokens, dtype)
            c, d = distill_clip_loss(
                out["image_features"].astype(jnp.float32),
                out["text_features"].astype(jnp.float32),
                out["logit_scale"].astype(jnp.float32),
                jax.lax.stop_gradient(
                    t_out["image_features"].astype(jnp.float32)),
                jax.lax.stop_gradient(
                    t_out["text_features"].astype(jnp.float32)),
                jax.lax.stop_gradient(
                    t_out["logit_scale"].astype(jnp.float32)),
                axis_name, local_loss)
            return c + d

        if mesh is None:
            return inner(params, teacher_params, images, tokens)
        return jax.shard_map(
            lambda p, tp, im, tk: inner(p, tp, im, tk, "data"),
            mesh=mesh, check_vma=False,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P())(params, teacher_params, images, tokens)

    def step_fn(state: TrainState, teacher_params, images, tokens):
        loss, grads = jax.value_and_grad(loss_of)(
            state.text_params, teacher_params, images, tokens)
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


def _batch_iter(loader, accum_freq: int):
    """Group `accum_freq` loader batches into one [k, b, ...] stack."""
    if accum_freq <= 1:
        yield from loader
        return
    images_acc, texts_acc = [], []
    for images, texts in loader:
        images_acc.append(np.asarray(images))
        texts_acc.append(list(texts))
        if len(images_acc) == accum_freq:
            yield np.stack(images_acc), texts_acc
            images_acc, texts_acc = [], []


def main(args=None) -> Dict:
    if args is None or isinstance(args, list):
        args = parse_args(args)
    setup_logging(level=logging.DEBUG if args.debug else logging.INFO)
    from leaf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from leaf_tpu.parallel.distributed import (
        broadcast_object,
        init_distributed_device,
        is_master,
    )
    init_distributed_device()
    master = is_master()

    run_name = args.name or ((args.custom_out_folder or "")
                             + time.strftime("contrastive-%Y_%m_%d-%H_%M_%S"))
    out_dir = os.path.join(args.logs, run_name)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    LOG.info("contrastive run: %s → %s", run_name, out_dir)

    sync_thread = None
    if master:
        from leaf_tpu.utils.file_utils import copy_codebase, start_run_mirror
        if args.copy_codebase:
            copy_codebase(out_dir)
        sync_thread = start_run_mirror(args, out_dir, run_name)

    mesh = create_mesh(
        tuple(int(x) for x in args.mesh_shape.split(","))
        if args.mesh_shape else None)

    precision = "bf16" if args.precision in ("bf16", "amp") else "fp32"
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32
    pretrained = None
    if args.pretrained:
        from leaf_tpu.models.pretrained import resolve_pretrained
        pretrained = resolve_pretrained(args.model, args.pretrained)
    # CoCa models train here too (the reference's main.py accepts
    # coca_* model names and picks CoCaLoss via create_loss)
    from leaf_tpu.models.coca import COCA_CONFIGS
    is_coca = args.model in COCA_CONFIGS
    preprocess_train = preprocess_val = None
    if is_coca:
        from leaf_tpu.models.coca import create_coca_model
        raw_params, cfg = create_coca_model(args.model, pretrained,
                                            seed=args.seed)
        params = replicate(raw_params, mesh)
    else:
        # the reference's contrastive pipeline ALWAYS RandomResizedCrops
        # at train time (`transform.py:335-340`, scale default 0.9-1.0);
        # parse() turns the CLI dict — possibly empty — into the
        # truthy default cfg so the factory builds the train transform
        from leaf_tpu.models.preprocess import AugmentationCfg
        model, preprocess_train, preprocess_val = create_model_and_transforms(
            args.model, pretrained, precision=precision, seed=args.seed,
            force_quick_gelu=args.force_quick_gelu,
            force_patch_dropout=args.force_patch_dropout,
            force_image_size=args.force_image_size,
            image_mean=args.image_mean, image_std=args.image_std,
            image_interpolation=args.image_interpolation,
            image_resize_mode=args.image_resize_mode,
            aug_cfg=AugmentationCfg.parse(args.aug_cfg or None))
        cfg = model.cfg
        if cfg.resnet is not None:
            LOG.warning(
                "RN towers train with FROZEN (inference-mode) BatchNorm "
                "statistics in this framework — fine for finetuning "
                "pretrained weights, a deviation from torch train-mode "
                "BN when training from scratch")
        params = replicate(model.params, mesh)
    tokenizer = get_tokenizer(args.model if not is_coca else "")

    if not args.gather_with_grad:
        # lax.all_gather differentiates; the reference's no-grad gather
        # workaround (`loss.py:19-63`) has no TPU counterpart to select
        raise ValueError("gather-with-grad is always on under XLA "
                         "(lax.all_gather is differentiable)")

    teacher = None
    if args.distill_model:
        t_pre = None
        if args.distill_pretrained:
            from leaf_tpu.models.pretrained import resolve_pretrained
            t_pre = resolve_pretrained(args.distill_model,
                                       args.distill_pretrained)
        t_model, _, _ = create_model_and_transforms(
            args.distill_model, t_pre, precision=precision, seed=args.seed)
        if t_model.cfg.vision.image_size != cfg.vision.image_size:
            raise ValueError(
                f"--distill-model resolution "
                f"{t_model.cfg.vision.image_size} != student train "
                f"resolution {cfg.vision.image_size}; the teacher "
                f"receives the student's batches — pick models at the "
                f"same resolution (or --force-image-size the student)")
        teacher = (t_model.cfg, replicate(t_model.params, mesh))
        if args.siglip:
            raise ValueError("--distill-model is incompatible with --siglip")
        if args.accum_freq > 1:
            raise ValueError(
                "--distill-model with --accum-freq > 1 is unsupported "
                "(the reference errors likewise, main.py:307)")

    # data (normalised images — contrastive training, no pixel attacks;
    # the imagenet-val loader stays UN-normalised because the zero-shot
    # eval normalises inside its jitted logits fn)
    from leaf_tpu.data import get_data, get_imagenet
    from leaf_tpu.models.preprocess import image_transform
    if preprocess_train is None:
        # CoCa path: the CoCa factory has no transform plumbing; build
        # the pipeline here honouring the same CLI overrides
        from leaf_tpu.models.preprocess import train_image_transform
        mean = args.image_mean or cfg.image_mean
        std = args.image_std or cfg.image_std
        interp = args.image_interpolation or "bicubic"
        preprocess_val = image_transform(
            cfg.vision.image_size, do_normalize=True, mean=mean, std=std,
            interpolation=interp,
            resize_mode=args.image_resize_mode or "shortest")
        preprocess_train = train_image_transform(
            cfg.vision.image_size, mean=mean, std=std,
            aug_cfg=args.aug_cfg or None, interpolation=interp,
            seed=args.seed)
    imagenet_val, args.imagenet_val = args.imagenet_val, None
    data = get_data(args, preprocess_train,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    preprocess_val=preprocess_val)
    args.imagenet_val = imagenet_val
    if imagenet_val:
        # un-normalised (the zero-shot eval normalises from cfg stats
        # inside its jitted logits fn) but geometry must still honour
        # the CLI overrides like every other split
        data["imagenet-val"] = get_imagenet(
            imagenet_val,
            image_transform(
                cfg.vision.image_size, do_normalize=False,
                interpolation=args.image_interpolation or "bicubic",
                resize_mode=args.image_resize_mode or "shortest"),
            "val", args.batch_size, n_val=args.n_val_imagenet,
            seed=args.seed)
    if "train" not in data:
        raise ValueError("contrastive training needs --train-data or "
                         "--dataset-type synthetic")

    steps_per_epoch = data["train"].num_batches // args.accum_freq
    total_steps = steps_per_epoch * args.epochs
    schedule = make_scheduler(
        "const" if args.skip_scheduler else args.lr_scheduler,
        args.lr, args.warmup, max(total_steps, 1),
        cooldown_steps=(args.epochs_cooldown or 0) * steps_per_epoch,
        cooldown_power=args.lr_cooldown_power,
        cooldown_end_lr=args.lr_cooldown_end)
    tx = make_optimizer(lambda step: jnp.asarray(schedule(step)),
                        weight_decay=args.wd, beta1=args.beta1,
                        beta2=args.beta2, eps=args.eps,
                        grad_clip_norm=args.grad_clip_norm)
    # LiT-style tower locking (reference main.py:316-325); --lock-image
    # is a None-sentinel shared with the LEAF driver — only an explicit
    # --lock-image freezes here
    if args.lock_image_freeze_bn_stats:
        LOG.info("--lock-image-freeze-bn-stats: inherent here — the "
                 "functional towers always normalise with stored "
                 "running stats (they never update)")
    if args.lock_image or args.lock_text:
        from leaf_tpu.train.locking import apply_locking
        tx = apply_locking(tx, params, args)
        LOG.info("tower locking: image=%s (unlocked_groups=%d) text=%s "
                 "(unlocked_layers=%d)", bool(args.lock_image),
                 args.lock_image_unlocked_groups, args.lock_text,
                 args.lock_text_unlocked_layers)
    state = TrainState.create(jax.tree.map(jnp.copy, params), tx)

    if is_coca:
        if teacher is not None or args.siglip or args.accum_freq > 1:
            raise ValueError("CoCa training supports the plain "
                             "contrastive+caption loss only")
        from leaf_tpu.train.contrastive import make_coca_train_step
        step_fn = make_coca_train_step(
            cfg, tx, mesh=mesh,
            caption_loss_weight=args.coca_caption_loss_weight,
            clip_loss_weight=args.coca_contrastive_loss_weight,
            local_loss=args.local_loss, dtype=dtype)
    elif teacher is not None:
        step_fn = make_distill_train_step(cfg, teacher[0], tx, mesh=mesh,
                                          local_loss=args.local_loss,
                                          dtype=dtype)
    elif args.accum_freq > 1:
        # the feature-cache accum step implements InfoNCE only; running
        # it for a sigmoid-ring or patch-dropout recipe would silently
        # train the wrong objective
        if args.siglip:
            raise ValueError("--siglip with --accum-freq > 1 is "
                             "unsupported (the feature-cache accumulation "
                             "computes the InfoNCE loss)")
        if cfg.vision.patch_dropout > 0:
            raise ValueError("--force-patch-dropout with --accum-freq > 1 "
                             "is unsupported (the accum step has no "
                             "dropout key plumbing)")
        step_fn = make_accum_contrastive_train_step(
            cfg, tx, accum_freq=args.accum_freq, dtype=dtype)
    else:
        dropout_key = (jax.random.PRNGKey(args.seed + 17)
                       if cfg.vision.patch_dropout > 0 else None)
        step_fn = make_contrastive_train_step(
            cfg, tx, mesh=mesh, local_loss=args.local_loss,
            siglip=args.siglip, dtype=dtype,
            base_dropout_key=dropout_key)

    from leaf_tpu.utils.trackers import create_tracker
    tracker = create_tracker(args.report_to, out_dir, run_name,
                             wandb_project=args.wandb_project_name,
                             wandb_notes=args.wandb_notes,
                             config=vars(args)) if master else None

    results = ResultsLedger(os.path.join(out_dir, "results.csv"),
                            columns=RESULT_COLUMNS) if master else None

    start_epoch = 0
    resume = broadcast_object(
        ckpt.resolve_resume(args.resume, ckpt_dir) if master else None)
    if resume is not None:
        epoch_done, path = resume
        LOG.info("resuming from %s (epoch %d)", path, epoch_done)
        payload = ckpt.load_checkpoint(
            path, like={"params": state.text_params,
                        "opt_state": state.opt_state, "step": state.step})
        state = TrainState(text_params=payload["params"],
                           opt_state=payload["opt_state"],
                           step=payload["step"])
        start_epoch = epoch_done
        if results is not None:
            results.truncate_to_epoch(epoch_done)

    def save(epoch: int):
        ckpt.save_checkpoint(ckpt_dir, epoch, {
            "params": state.text_params, "opt_state": state.opt_state,
            "step": state.step})

    from leaf_tpu.parallel.sharding import put_batch

    def put_microbatched(x):
        """[k, b, ...] stacks shard the *microbatch* axis over data."""
        if mesh is None:
            return jnp.asarray(x)
        b = x.shape[1]
        if b % mesh.shape["data"] == 0:
            return jax.device_put(x, NamedSharding(mesh, P(None, "data")))
        return jax.device_put(x, NamedSharding(mesh, P()))

    def run_eval(epoch: int) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        if is_coca:
            return metrics  # CoCa eval = captioning benchmark CLI
        if "val" in data:
            metrics.update(evaluate_contrastive(
                eval_params(), cfg, data["val"].loader, tokenizer,
                dtype=dtype))
        if "imagenet-val" in data and args.zeroshot_frequency and (
                epoch % args.zeroshot_frequency == 0 or epoch == args.epochs):
            from leaf_tpu.evals.zero_shot import imagenet_zero_shot_clean
            metrics.update(imagenet_zero_shot_clean(
                eval_params(), cfg, data["imagenet-val"], tokenizer,
                dtype=dtype))
        return metrics

    def eval_params():
        return state.text_params

    def record(epoch: int, train_loss: float, metrics: Dict[str, float]):
        if results is None:
            return
        row = {"epoch": epoch, "train_loss": train_loss}
        for col in RESULT_COLUMNS[2:]:
            if col in metrics:
                row[col] = metrics[col]
        results.append(row)
        if tracker is not None:
            tracker.log({f"val/{k}": v for k, v in metrics.items()
                         if isinstance(v, (int, float))}, step=epoch)

    if start_epoch == 0:
        metrics = run_eval(0)
        if metrics:
            LOG.info("epoch 0 eval: %s", metrics)
        record(0, float("nan"), metrics)

    for epoch in range(start_epoch, args.epochs):
        LOG.info("Start epoch %d", epoch)
        info = data["train"]
        info.set_epoch(epoch)
        losses_m = AverageMeter()
        batch_time_m = AverageMeter()
        end = time.time()
        # deferred logging: async device->host loss copy, emitted one
        # logging point later (same as train.loop) — float(loss) right
        # after the dispatch is a blocking device read, a full round
        # trip per step on the tunneled TPU backend.  state.step is
        # mirrored on host (step_ctr) because the device scalar of a
        # past state may sit in a donated buffer by flush time.
        pending = None
        step_ctr = int(state.step)

        def _flush(rec):
            if rec is None:
                return
            loss_val = float(rec["loss_arr"])
            losses_m.update(loss_val)
            LOG.info("Contrastive Epoch %d [%d/%d] loss %.5g (%.5g) "
                     "%.1f samples/s", epoch, rec["i1"], steps_per_epoch,
                     loss_val, losses_m.avg, rec["sps"])
            if tracker is not None:
                tracker.log({"train/loss": loss_val,
                             "train/samples_per_second": rec["sps"]},
                            step=rec["step"])

        for i, (images, texts) in enumerate(
                _batch_iter(info.loader, args.accum_freq)):
            ctx = cfg.text.context_length
            if args.accum_freq > 1:
                tokens = np.stack([
                    np.asarray(tokenizer(t, context_length=ctx))
                    for t in texts])
                images_d = put_microbatched(np.asarray(images))
                tokens_d = put_microbatched(tokens)
            else:
                tokens_d = put_batch(
                    np.asarray(tokenizer(texts, context_length=ctx)), mesh)
                images_d = put_batch(np.asarray(images), mesh)
            if teacher is not None:
                state, metrics = step_fn(state, teacher[1], images_d,
                                         tokens_d)
            else:
                state, metrics = step_fn(state, images_d, tokens_d)
            step_ctr += 1
            batch_time_m.update(time.time() - end)
            end = time.time()
            if (i + 1) % args.log_every_n_steps == 0 \
                    or i + 1 == steps_per_epoch:
                loss_arr = metrics["loss"]
                try:
                    loss_arr.copy_to_host_async()
                except AttributeError:
                    pass
                sps = (args.batch_size * args.accum_freq
                       * jax.process_count() / batch_time_m.val)
                rec = {"loss_arr": loss_arr, "i1": i + 1, "sps": sps,
                       "step": step_ctr}
                _flush(pending)
                pending = rec
        _flush(pending)
        completed = epoch + 1
        metrics = run_eval(completed)
        if metrics:
            LOG.info("epoch %d eval: %s", completed, metrics)
        record(completed, losses_m.avg if losses_m.count else float("nan"),
               metrics)
        if completed % args.save_frequency == 0 or completed == args.epochs:
            save(completed)

    ckpt.wait_for_checkpoints()
    if sync_thread is not None:
        sync_thread.stop(final_sync=True)
    if tracker is not None:
        tracker.finish()
    return {"results": results.rows if results is not None else [],
            "state": state, "cfg": cfg, "out_dir": out_dir}


if __name__ == "__main__":
    main()
