"""PEZ prompt-inversion driver.

Re-expression of the reference's `src/pez/run_coco.py` (caption
inversion) and `run.py` (image-target inversion via
`optim_utils.get_target_feature(target_images=...)`, :94-106): invert
a text or image embedding back into a discrete prompt, recording the
reconstruction and its cosine similarity.  JSON config files merge
into the CLI namespace exactly as the reference does
(`run_coco.py:90-93`: config first, CLI flags override).

  python -m leaf_tpu.evals.pez_driver --config pez_config.json \
      --model ViT-L-14 --pretrained ckpt.safetensors \
      --captions captions.txt --n-samples 10 --iter 300 \
      --output results_inversions/

  # hard-prompt inversion of target image(s); several images optimize
  # ONE prompt across all of them (the reference's style-transfer use)
  python -m leaf_tpu.evals.pez_driver --images img1.jpg img2.jpg \
      --model ViT-L-14 --prompt-len 16 --iter 1000
"""
from __future__ import annotations

import argparse
import json
import logging
import os
from typing import List, Optional

import numpy as np

from leaf_tpu.utils.logging_utils import setup_logging

LOG = logging.getLogger(__name__)

# every flag default lives HERE so the merge order (defaults < json <
# explicitly-passed CLI flags) actually holds — argparse defaults are
# all None and only user-passed values override the JSON config
DEFAULTS = dict(seed=0, prompt_len="match", lr=0.1, weight_decay=0.1,
                loss_weight=1.0, iter=3000, batch_size=1,
                model="ViT-L-14", pretrained="", n_samples=10,
                output="./results_inversions")


def run_one_inversion(caption: str, params, cfg, tokenizer, args) -> dict:
    import jax.numpy as jnp

    from leaf_tpu.evals.pez import optimize_prompt
    from leaf_tpu.models import clip as lclip

    # target: the caption's own (frozen-model) text embedding — the
    # text-inversion protocol LEAF evaluates robust encoders with
    tokens = jnp.asarray(tokenizer([caption]))
    target = lclip.encode_text(params["text"], cfg.text, tokens,
                               cfg.quick_gelu, normalize=True)
    if args.prompt_len == "match":
        ids = np.asarray(tokens)[0]
        # EOT position (the max id), not a nonzero count — BPE id 0 is
        # the non-final '!' token and appears mid-caption
        prompt_len = int(ids.argmax()) - 1      # minus SOT
        prompt_len = max(1, min(prompt_len, cfg.text.context_length - 2))
    else:
        prompt_len = int(args.prompt_len)

    out = optimize_prompt(params["text"], cfg, target,
                          prompt_len=prompt_len, iters=args.iter,
                          lr=args.lr, weight_decay=args.weight_decay,
                          loss_weight=args.loss_weight, seed=args.seed)
    rec_ids = [int(i) for i in np.asarray(out["ids"])]
    reconstructed = tokenizer.decode(rec_ids)
    return {"original": caption, "reconstructed": reconstructed,
            "cosine_sim": float(out["sim"]), "prompt_len": prompt_len,
            # token ids for pez_metrics (reference compute_metrics.py
            # token accuracy needs ids_orig/ids_rec)
            "ids_orig": [int(i) for i in np.asarray(tokens)[0]],
            "ids_rec": rec_ids}


def run_image_inversion(image_paths: List[str], params, cfg, preprocess,
                        tokenizer, args) -> dict:
    """One prompt optimized against the image(s)' CLIP features
    (reference `run.py` + `optim_utils.py:94-101`)."""
    import jax.numpy as jnp

    from leaf_tpu.evals.pez import optimize_prompt
    from leaf_tpu.models import clip as lclip
    from PIL import Image

    batch = np.stack([preprocess(Image.open(p).convert("RGB"))
                      for p in image_paths])
    target = lclip.encode_image_model(params, cfg, jnp.asarray(batch),
                                      normalize=True)
    # "match" has no caption to match against — the reference's
    # sample_config uses a fixed prompt_len (16) for image targets
    prompt_len = 16 if args.prompt_len == "match" else int(args.prompt_len)
    out = optimize_prompt(params["text"], cfg, target,
                          prompt_len=prompt_len, iters=args.iter,
                          lr=args.lr, weight_decay=args.weight_decay,
                          loss_weight=args.loss_weight, seed=args.seed)
    rec_ids = [int(i) for i in np.asarray(out["ids"])]
    return {"images": list(image_paths),
            "reconstructed": tokenizer.decode(rec_ids),
            "cosine_sim": float(out["sim"]), "prompt_len": prompt_len,
            "ids_rec": rec_ids}


def main(argv: Optional[List[str]] = None) -> dict:
    p = argparse.ArgumentParser("leaf_tpu PEZ inversion")
    p.add_argument("--config", default=None,
                   help="JSON config; CLI flags override its values")
    p.add_argument("--model", default=None)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--captions", default=None,
                   help="text file, one caption per line")
    p.add_argument("--images", nargs="+", default=None,
                   help="target image path(s); several images optimize "
                        "a single prompt across all of them")
    p.add_argument("--n-samples", type=int, default=None)
    p.add_argument("--iter", type=int, default=None)
    p.add_argument("--prompt-len", dest="prompt_len", default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--weight-decay", type=float, default=None)
    p.add_argument("--loss-weight", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--output", default=None)
    cli = p.parse_args(argv)

    # merge order (reference run_coco.py:90-93): defaults < json < CLI
    merged = dict(DEFAULTS)
    if cli.config:
        with open(cli.config) as f:
            merged.update(json.load(f))
    for k, v in vars(cli).items():
        if v is not None:
            merged[k] = v
    args = argparse.Namespace(**merged)

    if not getattr(args, "captions", None) and \
            not getattr(args, "images", None):
        p.error("one of --captions or --images is required")

    setup_logging()
    from leaf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from leaf_tpu.models import create_model_and_transforms, get_tokenizer
    from leaf_tpu.models.pretrained import resolve_pretrained
    pretrained = resolve_pretrained(args.model, args.pretrained) \
        if args.pretrained else None
    model, _, preprocess = create_model_and_transforms(
        args.model, pretrained)
    tokenizer = get_tokenizer(args.model)

    results = []
    if getattr(args, "images", None):
        res = run_image_inversion(args.images, model.params, model.cfg,
                                  preprocess, tokenizer, args)
        LOG.info("image target sim=%.4f reconstructed=%r",
                 res["cosine_sim"], res["reconstructed"])
        results.append(res)
        n_items = len(args.images)
    else:
        with open(args.captions) as f:
            captions = [l.strip() for l in f if l.strip()][:args.n_samples]
        for i, caption in enumerate(captions):
            res = run_one_inversion(caption, model.params, model.cfg,
                                    tokenizer, args)
            LOG.info("[%d/%d] sim=%.4f reconstructed=%r", i + 1,
                     len(captions), res["cosine_sim"], res["reconstructed"])
            results.append(res)
        n_items = len(captions)

    payload = {"config": {k: v for k, v in vars(args).items()},
               "results": results,
               "mean_cosine_sim": float(np.mean(
                   [r["cosine_sim"] for r in results])) if results else 0.0}
    os.makedirs(args.output, exist_ok=True)
    out_path = os.path.join(
        args.output,
        f"results-{n_items}smpls-{args.iter}iters-"
        f"{args.model.replace('/', '-')}.json")
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=2)
    LOG.info("wrote %s", out_path)
    return payload


if __name__ == "__main__":
    main()
