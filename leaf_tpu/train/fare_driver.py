"""FARE training CLI (the reference's
`src/robust_vlm/train/adversarial_training_clip.py` __main__).

Flag names mirror the reference's 33-flag parser
(`adversarial_training_clip.py:35-68`, dashes instead of underscores);
ε and step size are given in /255 units as there.
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from leaf_tpu.models import create_model, get_tokenizer
from leaf_tpu.models.preprocess import image_transform
from leaf_tpu.models.zero_shot import (
    build_zero_shot_classifier,
    imagenet_classnames,
    openai_imagenet_templates,
    simple_imagenet_templates,
)
from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.data.imagenet import get_imagenet
from leaf_tpu.train import checkpoint as ckpt
from leaf_tpu.train.fare import FareConfig, train_fare
from leaf_tpu.utils.logging_utils import setup_logging

LOG = logging.getLogger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser("leaf_tpu FARE image adversarial training")
    p.add_argument("--model", type=str, default="ViT-L-14")
    p.add_argument("--pretrained", type=str, default="")
    p.add_argument("--imagenet-root", type=str, required=True)
    p.add_argument("--template", type=str, default="ensemble",
                   choices=["ensemble", "std", "simple"])
    p.add_argument("--output-normalize", action="store_true", default=False)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--warmup", type=int, default=700)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--loss", type=str, default="l2")
    p.add_argument("--loss-clean", type=str, default="l2")
    p.add_argument("--clean-weight", type=float, default=0.0)
    p.add_argument("--trades", action="store_true", default=False)
    p.add_argument("--opt", type=str, default="adamw", choices=["adamw", "sgd"])
    p.add_argument("--momentum-sgd", type=float, default=0.9)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--wd", type=float, default=1e-4)
    p.add_argument("--attack", type=str, default="pgd",
                   choices=["pgd", "apgd", "none"])
    p.add_argument("--inner-loss", type=str, default="l2")
    p.add_argument("--norm", type=str, default="linf")
    p.add_argument("--eps", type=float, default=2.0, help="in /255 units")
    p.add_argument("--iterations-adv", type=int, default=10)
    p.add_argument("--stepsize-adv", type=float, default=1.0,
                   help="in /255 units")
    p.add_argument("--precision", type=str, default="bf16")
    p.add_argument("--no-remat", dest="remat", action="store_false",
                   default=True,
                   help="disable block rematerialisation in the attack/"
                        "train backwards (needs >16GB HBM at bs=128)")
    p.add_argument("--output-dir", type=str, default="./fare_out")
    p.add_argument("--experiment-name", type=str, default="FARE")
    p.add_argument("--log-freq", type=int, default=10)
    p.add_argument("--report-to", default="", type=str,
                   help="comma-sep: wandb,tensorboard (the reference "
                        "FARE trainer's --wandb, robust_vlm/utils.py:"
                        "96-115)")
    p.add_argument("--wandb-project-name", type=str, default="clip-finetune")
    p.add_argument("--fallback-freq", type=int, default=20,
                   help="rolling crash-recovery checkpoint cadence "
                        "(reference saves fallback_<step> every 20 "
                        "steps); 0 disables")
    p.add_argument("--eval-freq", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", default="",
                   help="'latest' resumes from the newest fallback/"
                        "milestone checkpoint in the output dir "
                        "(params + optimizer moments + step; the data "
                        "stream restarts)")
    return p.parse_args(argv)


def _latest_fare_checkpoint(ckpt_dir: str):
    """(step, path) of the newest fallback_<N>/epoch_<N> dir, or None."""
    import re
    if not os.path.isdir(ckpt_dir):
        return None
    best = None
    for name in os.listdir(ckpt_dir):
        m = re.match(r"^(?:fallback|epoch)_(\d+)$", name)
        if m and os.path.isdir(os.path.join(ckpt_dir, name)):
            step = int(m.group(1))
            if best is None or step > best[0]:
                best = (step, os.path.join(ckpt_dir, name))
    return best


def main(argv=None):
    args = parse_args(argv)
    setup_logging()
    model = create_model(args.model, args.pretrained or None,
                         precision=args.precision, seed=args.seed)
    cfg = model.cfg
    tokenizer = get_tokenizer(args.model)
    scorer = CandidateScorer(cfg)

    # zero-shot classifier for CE losses / logging (reference caches it
    # to /tmp, `adversarial_training_clip.py:160-177`)
    classifier = None
    if "ce" in (args.loss, args.inner_loss, args.loss_clean):
        templates = (openai_imagenet_templates() if args.template == "ensemble"
                     else simple_imagenet_templates())
        classifier = build_zero_shot_classifier(
            lambda t: scorer.encode_text(model.params["text"], t),
            tokenizer, imagenet_classnames(), templates)

    preprocess = image_transform(cfg.vision.image_size, do_normalize=False)
    train_info = get_imagenet(args.imagenet_root, preprocess, "train",
                              batch_size=args.batch_size, seed=args.seed,
                              process_index=jax.process_index(),
                              process_count=jax.process_count())

    def repeat_forever():
        while True:
            yield from ((imgs, targets) for imgs, targets
                        in train_info.loader)

    fcfg = FareConfig(
        steps=args.steps, warmup=args.warmup, batch_size=args.batch_size,
        lr=args.lr, wd=args.wd, opt=args.opt,
        momentum_sgd=args.momentum_sgd, attack=args.attack, norm=args.norm,
        eps=args.eps / 255.0, iterations_adv=args.iterations_adv,
        stepsize_adv=args.stepsize_adv / 255.0, inner_loss=args.inner_loss,
        loss=args.loss, loss_clean=args.loss_clean,
        clean_weight=args.clean_weight, trades=args.trades,
        output_normalize=args.output_normalize, log_freq=args.log_freq,
        eval_freq=args.eval_freq, remat=args.remat,
        fallback_freq=args.fallback_freq)

    out_dir = os.path.join(args.output_dir, args.experiment_name)
    os.makedirs(out_dir, exist_ok=True)
    ckpt_dir = os.path.join(out_dir, "checkpoints")

    def payload(state):
        # optimizer moments ride along — without them a recovered run
        # resets Adam state and diverges from the pre-crash trajectory
        # (the reference saves fallback_<step>_opt.pt alongside,
        # `adversarial_training_clip.py:482-487`)
        return {"visual_params": state.text_params,
                "opt_state": state.opt_state, "step": state.step}

    def checkpoint_fn(step, state):
        ckpt.save_checkpoint(ckpt_dir, step, payload(state))

    def fallback_fn(step, state):
        # rolling crash-recovery checkpoint: save fallback_<step>, then
        # GC the previous one (reference `adversarial_training_clip.py:
        # 481-490,253-255`); all processes call the collective save,
        # master alone removes old dirs
        import shutil

        import jax as _jax
        ckpt.save_named(ckpt_dir, f"fallback_{step}", payload(state))
        if _jax.process_index() == 0 and os.path.isdir(ckpt_dir):
            for name in os.listdir(ckpt_dir):
                if name.startswith("fallback_") \
                        and name != f"fallback_{step}":
                    shutil.rmtree(os.path.join(ckpt_dir, name),
                                  ignore_errors=True)

    # resume: params + optimizer moments + step from the newest
    # fallback/milestone (crash recovery; the data stream restarts,
    # like the reference's manual fallback reload)
    init_state = None
    start_step = 0
    if args.resume:
        if args.resume != "latest":
            raise ValueError("--resume only supports 'latest'")
        found = _latest_fare_checkpoint(ckpt_dir)
        if found is not None:
            start_step, path = found
            LOG.info("resuming FARE from %s (step %d)", path, start_step)
            from leaf_tpu.train.fare import make_fare_optimizer
            from leaf_tpu.train.step import TrainState
            tx = make_fare_optimizer(fcfg)
            like = {"visual_params": model.params["visual"],
                    "opt_state": tx.init(model.params["visual"]),
                    "step": np.asarray(0)}
            try:
                loaded = ckpt.load_checkpoint(path, like=like)
            except ValueError:
                # pre-opt_state payload: recover params, fresh moments
                loaded = ckpt.load_checkpoint(
                    path, like={"visual_params": like["visual_params"],
                                "step": like["step"]})
                loaded["opt_state"] = like["opt_state"]
            init_state = TrainState(text_params=loaded["visual_params"],
                                    opt_state=loaded["opt_state"],
                                    step=loaded["step"])

    from leaf_tpu.parallel import create_mesh
    from leaf_tpu.parallel.distributed import is_master
    from leaf_tpu.utils.trackers import create_tracker
    mesh = create_mesh()
    tracker = create_tracker(args.report_to, out_dir, args.experiment_name,
                             wandb_project=args.wandb_project_name,
                             config=vars(args)) \
        if is_master() and args.report_to else None
    on_step = None
    if tracker is not None:
        def on_step(step, metrics):  # noqa: F811
            tracker.log({f"train/{k}": v for k, v in metrics.items()},
                        step=step)
    # compute dtype from --precision: bf16 halves both the MXU time and
    # the activation footprint of the PGD-10 fwd/bwd ladder (before
    # this, --precision only cast the *params* and every encode still
    # computed fp32); LN/softmax/loss stay fp32 inside the tower
    dtype = jnp.bfloat16 if args.precision in ("bf16", "amp") \
        else jnp.float32
    out = train_fare(model.params, cfg, fcfg, repeat_forever(),
                     classifier=classifier, seed=args.seed,
                     checkpoint_fn=checkpoint_fn,
                     fallback_fn=fallback_fn, mesh=mesh,
                     init_state=init_state, start_step=start_step,
                     on_step=on_step, dtype=dtype)
    # completed runs clean their fallbacks up (reference
    # `adversarial_training_clip.py:253-255`); the milestone
    # checkpoints are the durable artifacts
    ckpt.wait_for_checkpoints()   # final milestone must be COMMITTED
    if out["steps"] >= fcfg.steps and jax.process_index() == 0 \
            and os.path.isdir(ckpt_dir):
        # ...before the fallbacks are deleted, or a crash in the write
        # window leaves neither
        import shutil
        for name in os.listdir(ckpt_dir):
            if name.startswith("fallback_"):
                shutil.rmtree(os.path.join(ckpt_dir, name),
                              ignore_errors=True)
    if tracker is not None:
        tracker.finish()
    LOG.info("FARE done: %d steps, final loss %.5g", out["steps"],
             out["final_loss"])
    return out


if __name__ == "__main__":
    main()
