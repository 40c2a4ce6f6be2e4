"""Batch feature-extraction / scoring CLI (the serving path).

The reference has no serving entry point — deployment means "load the
HF checkpoint elsewhere".  For a production TPU framework the hot
serving op is batched feature extraction, so this CLI embeds text
and/or image inputs at fixed shapes (one compile, padded final batch),
optionally L2-normalized, and writes an `.npz` with features + the
input ids/paths.  `--export` additionally emits the StableHLO AOT
artifact (`models/export.py`) for serving without Python model code.

Usage:
  python -m leaf_tpu.serve --model ViT-L-14-quickgelu \
      --pretrained <ckpt> --texts captions.txt --output feats.npz
  python -m leaf_tpu.serve --model ... --images imgs_dir --output f.npz
  python -m leaf_tpu.serve --model ... --texts a.txt --images d/ \
      --output f.npz              # both towers + cosine scores
"""
from __future__ import annotations

import argparse
import glob
import logging
import os
import time
from typing import List

import numpy as np

LOG = logging.getLogger(__name__)

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".webp", ".bmp")


def _list_images(spec: str) -> List[str]:
    if os.path.isdir(spec):
        # case-insensitive match (IMG_0001.JPG must not be skipped)
        out = [p for p in glob.glob(os.path.join(spec, "**", "*"),
                                    recursive=True)
               if p.lower().endswith(IMAGE_EXTS)]
        return sorted(out)
    return [p for p in spec.split(",") if p]


def _pad_to(x: np.ndarray, n: int) -> np.ndarray:
    if x.shape[0] == n:
        return x
    pad = np.broadcast_to(x[-1:], (n - x.shape[0],) + x.shape[1:])
    return np.concatenate([x, pad], axis=0)


def main(argv=None):
    p = argparse.ArgumentParser("leaf_tpu.serve")
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", default=None)
    p.add_argument("--texts", default=None,
                   help="file with one text per line")
    p.add_argument("--images", default=None,
                   help="image directory (recursive) or comma list")
    p.add_argument("--output", required=True, help=".npz output path")
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--precision", default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--no-normalize", action="store_true",
                   help="skip L2 normalization of features")
    p.add_argument("--export", default=None,
                   help="also write the StableHLO AOT artifact here")
    p.add_argument("--int8-mlp", action="store_true", default=False,
                   help="weight-only int8 for the transformer MLP "
                        "linears (the reference's --use-bnb-linear "
                        "c_fc/c_proj swap, main.py:251-260) — halves "
                        "resident MLP weight bytes for serving")
    args = p.parse_args(argv)
    if not args.texts and not args.images:
        p.error("need --texts and/or --images")

    from leaf_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from leaf_tpu.models import create_model_and_transforms
    from leaf_tpu.models.factory import get_tokenizer

    model, _, preprocess = create_model_and_transforms(
        args.model, args.pretrained, precision=args.precision)
    cfg = model.cfg
    if args.int8_mlp:
        from leaf_tpu.models.quantize import (quantize_mlp_params,
                                              quantized_nbytes)
        before = quantized_nbytes(model.params)
        model.params = quantize_mlp_params(model.params)
        LOG.info("int8 MLP: params %0.1f → %0.1f MiB",
                 before / 2**20,
                 quantized_nbytes(model.params) / 2**20)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    normalize = not args.no_normalize
    bs = args.batch_size
    out = {}

    if args.texts:
        from leaf_tpu.attacks.engine import bucket_tokens
        tokenizer = get_tokenizer(args.model)
        with open(args.texts) as f:
            texts = [line.rstrip("\n") for line in f if line.strip()]
        if not texts:
            raise ValueError(f"{args.texts!r} contains no non-blank lines")
        # the MODEL's dispatching encoder (native / HF tower / CoCa),
        # params as jit ARGUMENTS; a raw lclip.encode_text crashed for
        # CoCa configs and HF text towers
        enc = jax.jit(lambda p, t: model.encode_text(
            t, params=p, normalize=normalize))
        # tokenize everything up front and bucket ONCE (exact under
        # causal masking + argmax pooling): one compiled shape, and
        # short captions ride the packed 16/32-token fast path instead
        # of full 77-context rows
        all_toks = np.asarray(tokenizer(texts))
        from leaf_tpu.attacks.engine import can_bucket
        from leaf_tpu.models.config import CLIPConfig
        if isinstance(cfg, CLIPConfig) and can_bucket(cfg):
            # bucketing invariance holds only for causal+argmax CLIP
            # towers (CoCa's cls-token tail is not truncation-safe)
            all_toks = bucket_tokens(all_toks)
        # warm the compile outside the timer AND reuse the result for
        # batch 0, like the image path
        first_toks = _pad_to(all_toks[:bs], bs)
        first_feats = np.asarray(enc(model.params, first_toks))
        feats = []
        t0 = time.perf_counter()
        # depth-2 pipeline: batch i+1's dispatch goes out BEFORE batch
        # i's features are pulled to host, so the per-batch readback
        # (the only hard sync; ~tens of ms through a tunnel) overlaps
        # the next batch's device encode
        pending = None
        for i in range(0, len(all_toks), bs):
            chunk = all_toks[i:i + bs]
            n = chunk.shape[0]
            if i == 0:
                feats.append(first_feats[:n])
                continue
            dev = enc(model.params, _pad_to(chunk, bs))
            dev.copy_to_host_async()   # transfer overlaps the next encode
            if pending is not None:
                feats.append(np.asarray(pending[0])[:pending[1]])
            pending = (dev, n)
        if pending is not None:
            feats.append(np.asarray(pending[0])[:pending[1]])
        dt = time.perf_counter() - t0
        out["text_features"] = np.concatenate(feats).astype(np.float32)
        out["texts"] = np.asarray(texts)
        LOG.info("text: %d seqs in %.2fs (%.1f/s steady-state)",
                 len(texts), dt, len(texts) / max(dt, 1e-9))

    if args.images:
        from PIL import Image
        paths = _list_images(args.images)
        if not paths:
            raise FileNotFoundError(f"no images under {args.images!r}")
        enc_i = jax.jit(lambda p, x: model.encode_image(
            x, params=p, normalize=normalize))

        def load_batch(chunk):
            return _pad_to(np.stack(
                [preprocess(Image.open(q).convert("RGB"))
                 for q in chunk]), bs)

        # warm the compile outside the timer (the decoded first batch
        # is reused); host PIL decode stays inside — it IS part of
        # image-serving cost
        first = load_batch(paths[:bs])
        np.asarray(enc_i(model.params, first))
        feats = []
        t0 = time.perf_counter()
        # depth-2 pipeline (see the text loop): batch i+1's host PIL
        # decode AND dispatch overlap batch i's feature readback
        pending = None
        for i in range(0, len(paths), bs):
            chunk = paths[i:i + bs]
            imgs = first if i == 0 else load_batch(chunk)
            dev = enc_i(model.params, imgs)
            dev.copy_to_host_async()   # transfer overlaps the next encode
            if pending is not None:
                feats.append(np.asarray(pending[0])[:pending[1]])
            pending = (dev, len(chunk))
        if pending is not None:
            feats.append(np.asarray(pending[0])[:pending[1]])
        dt = time.perf_counter() - t0
        out["image_features"] = np.concatenate(feats).astype(np.float32)
        out["image_paths"] = np.asarray(paths)
        LOG.info("image: %d imgs in %.2fs (%.1f/s steady-state, "
                 "incl. host decode)", len(paths), dt,
                 len(paths) / max(dt, 1e-9))

    if "text_features" in out and "image_features" in out:
        # cosine scores (features already normalized unless opted out)
        out["scores"] = out["image_features"] @ out["text_features"].T

    os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                exist_ok=True)
    np.savez(args.output, **out)
    LOG.info("wrote %s (%s)", args.output, ", ".join(sorted(out)))

    if args.export:
        from leaf_tpu.models.export import export_model
        # same dtype/normalization as the features just written, so a
        # deployment serving from the artifact agrees with the .npz
        export_model(model.params, cfg, args.export, batch_size=bs,
                     dtype=dtype, normalize=normalize)
        LOG.info("exported StableHLO artifact to %s", args.export)
    return out


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
