"""Text-to-image robustness eval (Stable Diffusion harness).

Re-expression of `/root/reference/eval_text_to_image.py`: attack COCO
captions with Charmer (optionally against BOTH SDXL text encoders —
the dual-encoder objective, `eval_text_to_image.py:209-222`), generate
images with an SD pipeline whose text encoder has been swapped for the
robust LEAF encoder (`:172-178`), then score with CLIPScore
(`leaf_tpu.evals.clipscore`).

The diffusion pipeline itself requires the `diffusers` package and
local SD weights; this module cleanly separates the three stages so the
attack and scoring stages run without them:

  1. `attack_captions(...)`      — no diffusion dependency
  2. `generate_images(...)`      — requires diffusers + local weights
  3. `compute_clipscores(...)`   — no diffusion dependency
"""
from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence

import numpy as np

from leaf_tpu.attacks.engine import CandidateScorer
from leaf_tpu.attacks.text import attack_text_charmer_inference
from leaf_tpu.utils.results import ResultsLedger

LOG = logging.getLogger(__name__)


def attack_captions(
    scorer: CandidateScorer,
    text_params,
    tokenizer,
    captions: Sequence[str],
    rho: int = 10,
    k: int = 2,
    objective: str = "l2",
    text_params2=None,
    scorer2=None,
    out_csv: Optional[str] = None,
) -> List[str]:
    """Charmer-attack each caption anchored on its own embedding
    (drift maximisation), optionally averaging a second encoder's loss
    (SDXL dual-tower mode)."""
    ledger = ResultsLedger(out_csv, fresh=True, stream=True, columns=["caption", "caption_adv"]) \
        if out_csv else None
    out = []
    if text_params2 is None:
        # single-encoder mode: batched charmer (identical search)
        from leaf_tpu.attacks.text import attack_text_charmer_batched
        for start in range(0, len(captions), 32):
            chunk = list(captions[start:start + 32])
            anchors = scorer.encode_text(text_params, tokenizer(chunk))
            out.extend(attack_text_charmer_batched(
                scorer, text_params, tokenizer, chunk, anchors,
                objective=objective, n=rho, k=k))
    else:
        # dual-encoder (SDXL) mode: per caption, averaging both losses
        s2 = scorer2 or scorer
        for cap in captions:
            anchor = scorer.encode_text(text_params, tokenizer([cap]))[0]
            anchor2 = s2.encode_text(text_params2, tokenizer([cap]))[0]
            adv, _ = attack_text_charmer_inference(
                scorer, text_params, tokenizer, cap, anchor,
                objective=objective, n=rho, k=k,
                text_params2=text_params2, anchor_features2=anchor2,
                scorer2=scorer2)
            out.append(adv)
    if ledger is not None:
        for cap, adv in zip(captions, out):
            ledger.append({"caption": cap, "caption_adv": adv})
    return out


def generate_images(captions: Sequence[str], sd_model_path: str,
                    robust_text_encoder_hf_dir: Optional[str] = None,
                    num_inference_steps: int = 50, seed: int = 0,
                    device: str = "cpu") -> np.ndarray:
    """Generate images with a local SD pipeline, optionally swapping in
    the robust text encoder (exported via `leaf_tpu.convert --to hf`).
    Requires the `diffusers` package."""
    try:
        import torch
        from diffusers import StableDiffusionPipeline
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "text-to-image generation requires the `diffusers` package and "
            "local SD weights; run stages 1/3 (attack_captions, "
            "compute_clipscores) standalone instead") from e
    pipe = StableDiffusionPipeline.from_pretrained(sd_model_path)
    if robust_text_encoder_hf_dir:
        from transformers import CLIPTextModel
        pipe.text_encoder = CLIPTextModel.from_pretrained(
            robust_text_encoder_hf_dir)
    pipe = pipe.to(device)
    gen = torch.Generator(device=device).manual_seed(seed)
    images = []
    for cap in captions:
        out = pipe(cap, num_inference_steps=num_inference_steps,
                   generator=gen, output_type="np")
        images.append(out.images[0])
    return np.stack(images)


def main(argv=None):
    """CLI (reference `eval_text_to_image.py:33-242`): stage 1 attacks
    the captions with Charmer (optionally dual-encoder), stage 2
    generates images when local SD weights are available, stage 3
    scores with CLIPScore/FID (`leaf_tpu.evals.clipscore`).  Without
    `--sd-model-path` only stage 1 runs — the scoring stage is a
    separate CLI over the generated folders."""
    import argparse
    import json
    import logging
    import os

    import jax.numpy as jnp

    p = argparse.ArgumentParser("leaf_tpu text-to-image eval")
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--model2", default=None,
                   help="second text encoder (SDXL dual-tower attack)")
    p.add_argument("--pretrained2", default=None)
    p.add_argument("--captions", required=True, help="JSON list")
    p.add_argument("--rho", type=int, default=10)
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--objective", default="l2")
    p.add_argument("--sd-model-path", default=None)
    p.add_argument("--robust-text-encoder-hf-dir", default=None)
    p.add_argument("--num-inference-steps", type=int, default=50)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--output-dir", default="results_t2i")
    args = p.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from leaf_tpu.attacks.engine import CandidateScorer
    from leaf_tpu.models.factory import create_model, get_tokenizer
    from leaf_tpu.models.pretrained import resolve_pretrained

    pretrained = (resolve_pretrained(args.model, args.pretrained)
                  if args.pretrained else None)
    model = create_model(args.model, pretrained, precision=args.precision)
    tokenizer = get_tokenizer(args.model)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    scorer = CandidateScorer(model.cfg, dtype=dtype)
    text_params2 = scorer2 = None
    if args.model2:
        pre2 = (resolve_pretrained(args.model2, args.pretrained2)
                if args.pretrained2 else None)
        model2 = create_model(args.model2, pre2, precision=args.precision)
        text_params2 = model2.params["text"]
        # the second encoder scores through ITS OWN config (ViT-bigG
        # in the SDXL pairing)
        scorer2 = CandidateScorer(model2.cfg, dtype=dtype)

    with open(args.captions) as f:
        captions = json.load(f)
    os.makedirs(args.output_dir, exist_ok=True)
    adv = attack_captions(
        scorer, model.params["text"], tokenizer, captions,
        rho=args.rho, k=args.k, objective=args.objective,
        text_params2=text_params2, scorer2=scorer2,
        out_csv=os.path.join(args.output_dir, "captions_adv.csv"))
    with open(os.path.join(args.output_dir, "captions_adv.json"),
              "w") as f:
        json.dump(adv, f, indent=2)

    if args.sd_model_path:
        for name, caps in (("clean", captions), ("adv", adv)):
            imgs = generate_images(
                caps, args.sd_model_path,
                robust_text_encoder_hf_dir=args.robust_text_encoder_hf_dir,
                num_inference_steps=args.num_inference_steps)
            d = os.path.join(args.output_dir, f"gen_{name}")
            os.makedirs(d, exist_ok=True)
            from PIL import Image
            for i, im in enumerate(imgs):
                Image.fromarray((im * 255).astype("uint8")).save(
                    os.path.join(d, f"{i:05d}.png"))
    else:
        logging.getLogger(__name__).info(
            "no --sd-model-path: wrote attacked captions only; generate "
            "with a local SD pipeline, then score via "
            "`python -m leaf_tpu.evals.clipscore`")
    print(json.dumps({"n": len(adv),
                      "output_dir": args.output_dir}))
    return adv


if __name__ == "__main__":
    main()
