"""LEAF training driver (the reference's `train_AT_text_only.py` main).

Wires the pieces: mesh, model + frozen anchor tower, optimizer with
weight-decay mask + schedule, data, per-epoch eval, checkpointing and
the results.csv ledger.  See `scripts/train_leaf_vitl.sh` for the
canonical recipes.

TPU deltas vs the reference driver
(`/root/reference/train_AT_text_only.py:87-588`):
  * no DDP wrapper — params are mesh-replicated and XLA inserts the
    grad psum;
  * the frozen anchor model is just the initial text-param pytree (no
    deepcopy of modules);
  * no GradScaler — bf16 on TPU needs no loss scaling;
  * checkpoints via Orbax (atomic), resume via directory discovery.
"""
from __future__ import annotations

import logging
import math
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks import edits
from leaf_tpu.attacks.constraint import WordConstraint
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.data import get_data
from leaf_tpu.evals.zero_shot import zero_shot_eval
from leaf_tpu.models import create_model_and_transforms, get_tokenizer
from leaf_tpu.models.preprocess import image_transform
from leaf_tpu.parallel import create_mesh, replicate
from leaf_tpu.train import checkpoint as ckpt
from leaf_tpu.train.loop import train_one_epoch_text_only
from leaf_tpu.train.optim import make_optimizer
from leaf_tpu.train.params import parse_args
from leaf_tpu.train.schedules import make_scheduler
from leaf_tpu.train.step import TrainState, make_anchor_encode, make_train_step
from leaf_tpu.utils.logging_utils import setup_logging
from leaf_tpu.utils.results import ResultsLedger, TimingLedger

LOG = logging.getLogger(__name__)

RESULT_COLUMNS = [
    "epoch", "train_loss",
    "imagenet-zeroshot-val-top1", "imagenet-zeroshot-val-top5",
    "imagenet-zeroshot-val-top1-adv",
    "agnews-zeroshot-train-acc", "agnews-zeroshot-train-acc-adv",
    "sst2-zeroshot-train-acc", "sst2-zeroshot-train-acc-adv",
]


def build_run_name(args) -> str:
    """Run folder name under --logs.  `--custom_out_folder` is a NAME
    PREFIX, as upstream (`/root/reference/train_AT_text_only.py:483`
    concatenates it into './results/<prefix>text_only_k...'), NOT an
    alternative logs root."""
    import datetime
    if args.name:
        return args.name
    prefix = getattr(args, "custom_out_folder", None) or ""
    now = datetime.datetime.now().strftime("%Y_%m_%d-%H_%M_%S")
    return (f"{prefix}{now}-model_{args.model.replace('/', '-')}-lr_{args.lr}-"
            f"b_{args.batch_size}-rho_{args.rho}-k_{args.k_adv}")


def main(args=None) -> Dict:
    if args is None or isinstance(args, list):
        args = parse_args(args)
    setup_logging(level=logging.DEBUG if args.debug else logging.INFO)
    from leaf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    # multi-host coordination when JAX_COORDINATOR_ADDRESS / SLURM env
    # is present (reference `init_distributed_device`,
    # `distributed.py:63-114`); single-process otherwise
    from leaf_tpu.parallel.distributed import init_distributed_device
    dist = init_distributed_device()
    if dist["world_size"] > 1:
        LOG.info("multi-host: rank %d / %d", dist["rank"],
                 dist["world_size"])
    if args.matmul_precision:
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    run_name = build_run_name(args)
    out_dir = os.path.join(args.logs, run_name)
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    os.makedirs(out_dir, exist_ok=True)
    # file log: master-only unless --log-local (reference
    # `open_clip_train/logger.py` log-local semantics)
    if jax.process_index() == 0 or args.log_local:
        suffix = f"_rank{jax.process_index()}" if args.log_local else ""
        setup_logging(log_file=os.path.join(out_dir, f"out{suffix}.log"),
                      level=logging.DEBUG if args.debug else logging.INFO)
    LOG.info("run: %s → %s", run_name, out_dir)

    # codebase snapshot + remote mirror (reference
    # `train_AT_text_only.py:189-213`): master-only; one verified sync
    # pass before training, then a background thread, final sync at end
    sync_thread = None
    if jax.process_index() == 0:
        from leaf_tpu.utils.file_utils import copy_codebase, start_run_mirror
        if args.copy_codebase:
            copy_codebase(out_dir)
        sync_thread = start_run_mirror(args, out_dir, run_name)

    mesh = create_mesh(
        tuple(int(x) for x in args.mesh_shape.split(","))
        if args.mesh_shape else None)

    # model + frozen anchor tower -----------------------------------------
    precision = "bf16" if args.precision in ("bf16", "amp") else "fp32"
    pretrained = None
    if args.pretrained:
        from leaf_tpu.models.pretrained import resolve_pretrained
        pretrained = resolve_pretrained(args.model, args.pretrained)
    # flags that belong to the vanilla contrastive trainer are a hard
    # error here — silent acceptance hid them in round 1
    if args.siglip or args.distill_model or args.local_loss:
        raise ValueError(
            "--siglip/--distill-model/--local-loss drive the contrastive "
            "pretrainer; run python -m leaf_tpu.train.contrastive_driver")
    if args.aug_cfg:
        # text-only AT discards train images (loop.py), so augmentation
        # could only ever silently do nothing here
        raise ValueError(
            "--aug-cfg has no effect on LEAF text-only AT (train images "
            "are discarded); it drives the contrastive pretrainer")
    if args.lock_image is False:   # None (default) = locked
        # the reference freezes model.visual unconditionally for
        # text-only AT (`train_AT_text_only.py:489-490`); only the
        # text tower enters the optimizer here, so an unlocked vision
        # tower cannot be honoured
        raise ValueError("LEAF text-AT always locks the vision tower")
    model, preprocess_train, preprocess_val = create_model_and_transforms(
        args.model, pretrained, precision=precision, seed=args.seed,
        force_quick_gelu=args.force_quick_gelu,
        force_patch_dropout=args.force_patch_dropout,
        force_image_size=args.force_image_size,
        image_mean=args.image_mean, image_std=args.image_std,
        image_interpolation=args.image_interpolation,
        image_resize_mode=args.image_resize_mode)
    cfg = model.cfg
    params = replicate(model.params, mesh)
    # the frozen anchor tower takes the ORIGINAL buffers (popped so no
    # dead third copy stays pinned in HBM — ~GBs for ViT-H towers);
    # the trainable state below is created from a copy, which is what
    # the train step donates
    frozen_text_params = params.pop("text")
    dtype = jnp.bfloat16 if precision == "bf16" else jnp.float32

    # attack vocabulary V (`train_AT_text_only.py:93`)
    vocab = edits.DEFAULT_VOCAB
    constraint = WordConstraint() if args.constrain else None
    scorer = CandidateScorer(cfg, dtype=dtype, mesh=mesh)
    tokenizer = get_tokenizer(args.model)

    # data ----------------------------------------------------------------
    # attacks operate in pixel space: datasets yield UN-normalised images
    preprocess_nonorm = image_transform(
        cfg.vision.image_size, do_normalize=False,
        interpolation=args.image_interpolation or "bicubic",
        resize_mode=args.image_resize_mode or "shortest")
    data = get_data(args, preprocess_nonorm,
                    process_index=jax.process_index(),
                    process_count=jax.process_count(),
                    text_only=args.text_only)

    # optimizer ------------------------------------------------------------
    steps_per_epoch = (data["train"].num_batches // args.accum_freq
                       if "train" in data else 0)
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
                        grad_clip_norm=args.grad_clip_norm,
                        accum_freq=args.accum_freq)
    # copy: the jitted train step donates its buffers, which must not
    # alias the frozen anchor tower
    state = TrainState.create(
        jax.tree.map(jnp.copy, frozen_text_params), tx)

    train_step = make_train_step(cfg, tx, normalize=args.normalize_fare,
                                 dtype=dtype, remat=args.grad_checkpointing,
                                 w_fare_text=args.w_fare_text)
    anchor_encode = make_anchor_encode(cfg, normalize=args.normalize_fare,
                                       dtype=dtype)
    fused_step = None
    if not args.use_charmer:
        # the fused path covers every leaf-attack recipe, INCLUDING
        # --constrain (validity masks are applied to the candidate
        # token buffer host-side) and k_adv > 1 (2 dispatches per edit
        # round, train update fused into the last)
        from leaf_tpu.train.fused import FusedLeafStep
        fused_step = FusedLeafStep(cfg, tx, tokenizer, rho=args.rho,
                                   vocab=vocab,
                                   normalize=args.normalize_fare,
                                   dtype=dtype,
                                   remat=args.grad_checkpointing,
                                   mesh=mesh, constraint=constraint,
                                   objective=args.attack_objective,
                                   w_fare_text=args.w_fare_text,
                                   k=args.k_adv)

    # ledger/file writes are master-only (the reference gates on
    # is_master, `train_AT_text_only.py:498-513`); concurrent same-path
    # appends from several hosts would corrupt the CSVs
    from leaf_tpu.parallel.distributed import broadcast_object, is_master
    master = is_master()
    results = ResultsLedger(os.path.join(out_dir, "results.csv"),
                            columns=RESULT_COLUMNS) if master else None
    timing = TimingLedger(os.path.join(
        out_dir, f"times_{args.use_charmer}.csv")) if master else None
    from leaf_tpu.utils.trackers import create_tracker
    tracker = create_tracker(args.report_to, out_dir, run_name,
                             wandb_project=args.wandb_project_name,
                             wandb_notes=args.wandb_notes,
                             config=vars(args)) if master else None

    # resume ---------------------------------------------------------------
    # rank-0 discovers the latest checkpoint, everyone loads the same
    # one (reference `train_AT_text_only.py:184-186`)
    start_epoch = 0

    def _discover_resume():
        found = ckpt.resolve_resume(args.resume, ckpt_dir)
        # with a remote mirror, `latest` must consider the remote too —
        # the local run dir may be a fresh machine (reference
        # `train_AT_text_only.py:158-179`)
        if args.remote_sync and args.resume == "latest":
            remote_ckpts = os.path.join(args.remote_sync, run_name,
                                        "checkpoints")
            if "://" in remote_ckpts:
                LOG.warning("remote latest-discovery skipped: %s is not a "
                            "local path (checkpoints load locally)",
                            remote_ckpts)
            elif os.path.isdir(remote_ckpts):
                remote = ckpt.resolve_resume("latest", remote_ckpts)
                if remote is not None and (found is None
                                           or remote[0] > found[0]):
                    found = remote
        return found

    # config validation must run on EVERY rank: a master-only raise
    # would leave the other hosts hanging in the broadcast collective
    if args.remote_sync and args.resume == "latest" \
            and args.save_most_recent:
        raise ValueError(
            "cannot use --save-most-recent with --remote-sync and "
            "--resume latest (reference errors likewise)")
    resume = broadcast_object(_discover_resume() if master else None)
    if resume is not None:
        epoch_done, path = resume
        LOG.info("resuming from %s (epoch %d)", path, epoch_done)
        like = {"text_params": state.text_params,
                "opt_state": state.opt_state,
                "step": state.step}
        try:
            payload = ckpt.load_checkpoint(path, like=like)
        except ValueError:
            # pre-sidecar layout: the frozen tower rides inside every
            # epoch payload (orbax rejects the extra key against the
            # 3-key `like`)
            payload = ckpt.load_checkpoint(
                path, like=dict(like,
                                frozen_text_params=frozen_text_params))
        state = TrainState(text_params=payload["text_params"],
                           opt_state=payload["opt_state"],
                           step=payload["step"])
        # the frozen anchor tower never changes: it lives in a one-off
        # `frozen` sidecar, not in every epoch payload (a ViT-L text
        # tower is ~340 MB of redundant device→host + disk traffic per
        # epoch otherwise).  Recovery order (ADVICE r2 medium): the
        # resumed payload itself (pre-sidecar format) → this run's
        # sidecar → the sidecar next to the resumed checkpoint (an
        # explicit --resume into another run's dir).  Any non-local
        # recovery is re-saved as this run's sidecar so the *next*
        # resume finds it even though new epoch payloads omit it.
        recovered = False
        if "frozen_text_params" in payload:
            recovered = True
            frozen_text_params = payload["frozen_text_params"]
        else:
            try:
                frozen_text_params = ckpt.load_named(
                    ckpt_dir, "frozen")["frozen_text_params"]
            except Exception:  # noqa: BLE001
                recovered = True
                frozen_text_params = ckpt.load_named(
                    os.path.dirname(os.path.abspath(path)),
                    "frozen")["frozen_text_params"]
        if recovered:
            # ALL processes call: a multi-host orbax save is collective
            # (barriers + metadata sync); orbax itself gates the actual
            # writes to the primary host
            ckpt.save_named(ckpt_dir, "frozen",
                            {"frozen_text_params": frozen_text_params})
        # checkpoint names record *completed* epochs; training epoch
        # indices are 0-based, so the next epoch to run == epoch_done
        start_epoch = epoch_done
        if results is not None:
            results.truncate_to_epoch(epoch_done)
    else:
        # all processes participate (collective save; primary writes)
        ckpt.save_named(ckpt_dir, "frozen",
                        {"frozen_text_params": frozen_text_params})

    def payload():
        return {
            "text_params": state.text_params,
            "opt_state": state.opt_state,
            "step": state.step,
        }

    def export_model(epoch: int):
        """Full-model OpenCLIP-format export next to the Orbax state.

        The reference saves a complete state dict every epoch
        (`train_AT_text_only.py:529-537`), which is what its eval CLIs
        load; our Orbax payload holds only the trained text side, so
        `checkpoints/model_epoch_<N>/open_clip_model.safetensors` (+
        activation metadata) is the artifact the standalone evals,
        convert.py and push_to_hf_hub consume (docs/REPLICATION.md §4).
        """
        import json

        from leaf_tpu.convert import params_to_openclip, save_state_dict
        out = os.path.join(ckpt_dir, f"model_epoch_{epoch}")
        try:
            sd = params_to_openclip(eval_params(), cfg)
        except Exception as e:  # noqa: BLE001 — non-CLIP tower layouts
            LOG.warning("skipping model export for epoch %d: %s", epoch, e)
            return
        save_state_dict(sd, out, "openclip")
        with open(os.path.join(out, "open_clip_config.json"), "w") as f:
            json.dump({"model_cfg": {"quick_gelu": bool(cfg.quick_gelu)}}, f)

    def save(epoch: int):
        ckpt.save_checkpoint(ckpt_dir, epoch, payload())
        if master:
            export_model(epoch)
        if args.delete_previous_checkpoint and master:
            # the save above is async — epoch_N must be COMMITTED
            # before epoch_{N-1} is deleted, or a crash in the write
            # window leaves zero resumable checkpoints
            ckpt.wait_for_checkpoints()
            import shutil
            for prev in (os.path.join(ckpt_dir, f"epoch_{epoch - 1}"),
                         os.path.join(ckpt_dir, f"model_epoch_{epoch - 1}")):
                if os.path.isdir(prev):
                    shutil.rmtree(prev)

    def eval_params():
        p = dict(params)
        p["text"] = state.text_params
        return p

    def run_eval(epoch: int) -> Dict[str, float]:
        metrics = zero_shot_eval(eval_params(), cfg, data, tokenizer,
                                 preprocess_nonorm, epoch, args,
                                 scorer=scorer,
                                 key=jax.random.PRNGKey(args.seed + epoch))
        # optional contrastive val loss + recall metrics
        # (`utils_AT.py:441-505`)
        if "val" in data and (epoch % max(args.val_frequency, 1) == 0
                              or epoch == args.epochs):
            from leaf_tpu.train.contrastive import evaluate_contrastive

            def norm_loader():
                from leaf_tpu.attacks.image import _normalize_images
                for images, texts in data["val"].loader:
                    yield np.asarray(_normalize_images(
                        jnp.asarray(images), cfg)), texts

            metrics.update(evaluate_contrastive(
                eval_params(), cfg, norm_loader(), tokenizer, dtype=dtype))
        return metrics

    def record(epoch: int, train_loss: float, metrics: Dict[str, float]):
        if results is None:
            return
        row = {"epoch": epoch, "train_loss": train_loss}
        for col in RESULT_COLUMNS[2:]:
            if col in metrics:
                row[col] = metrics[col]
        results.append(row)

    # epoch-0 snapshot (`train_AT_text_only.py:492-525`)
    if start_epoch == 0:
        metrics = run_eval(0)
        LOG.info("epoch 0 eval: %s", metrics)
        # the reference writes train_loss=-1 for the pre-training
        # epoch-0 row (`train_AT_text_only.py:501`)
        record(0, -1.0, metrics)
        if "train" in data:
            save(0)

    if "train" not in data:
        if sync_thread is not None:
            sync_thread.stop(final_sync=True)   # epoch-0 eval results
        if tracker is not None:
            tracker.finish()
        return {"results": results.rows if results is not None else [],
                "state": state}

    for epoch in range(start_epoch, args.epochs):
        LOG.info("Start epoch %d", epoch)
        state, log_data = train_one_epoch_text_only(
            state, frozen_text_params, scorer, anchor_encode, train_step,
            tokenizer, vocab, data, epoch, args, constraint=constraint,
            timing=timing, rng=np.random.default_rng(args.seed + 1000 * epoch
                                                     + jax.process_index()),
            fused_step=fused_step, mesh=mesh, tracker=tracker)
        completed = epoch + 1
        metrics = run_eval(completed)
        LOG.info("epoch %d eval: %s", completed, metrics)
        record(completed, log_data.get("train/loss", float("nan")), metrics)
        if tracker is not None:
            tracker.log({f"val/{k}": v for k, v in metrics.items()
                         if isinstance(v, (int, float))}, step=completed)
        if (args.save_frequency > 0
                and completed % args.save_frequency == 0) \
                or completed == args.epochs:
            save(completed)
        if args.save_most_recent:
            ckpt.save_latest(ckpt_dir, completed, payload())

    ckpt.wait_for_checkpoints()
    if sync_thread is not None:
        sync_thread.stop(final_sync=True)
    if tracker is not None:
        tracker.finish()
    return {"results": results.rows if results is not None else [],
            "state": state,
            "params": eval_params(), "cfg": cfg, "out_dir": out_dir}


if __name__ == "__main__":
    main()
