"""CLIPScore computation + t2i result post-processing.

Re-expression of `/root/reference/compute_clipscores.py`: CLIPScore
(max(0, 100·cos) between CLIP embeddings — the torchmetrics definition
the reference relies on) over (real image, generated image, caption)
triplets, with NSFW-blanked (all-black) generated images filtered out.
FID (cleanfid in the reference) requires an InceptionV3 checkpoint and
is delegated to `fid_features`-based callers when those weights exist
locally.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks.image import _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def clip_score(image_features, text_features) -> np.ndarray:
    """Per-pair CLIPScore = max(0, 100·cos) ([N, D] × [N, D] → [N])."""
    a = np.asarray(lclip.l2_normalize(jnp.asarray(image_features)))
    b = np.asarray(lclip.l2_normalize(jnp.asarray(text_features)))
    return np.maximum(0.0, 100.0 * (a * b).sum(-1))


def is_black_image(image: np.ndarray, threshold: float = 5 / 255) -> bool:
    """NSFW-blanked detection: an (almost) all-black generated image.
    Threshold matches the reference's mean-intensity < 5 on 0-255
    grayscale (`compute_clipscores.py` filter)."""
    return float(np.asarray(image, np.float32).mean()) < threshold


def compute_clipscores(
    params,
    cfg: CLIPConfig,
    tokenizer,
    captions: Sequence[str],
    gen_images: np.ndarray,       # [N, H, W, 3] in [0,1]
    real_images: Optional[np.ndarray] = None,
    batch_size: int = 64,
) -> Dict[str, object]:
    """CLIPScores for generated-vs-caption (and real-vs-caption /
    gen-vs-real when real images are given), black images excluded."""
    keep = [i for i in range(len(captions))
            if not is_black_image(gen_images[i])]
    n_black = len(captions) - len(keep)

    def embed_images(images):
        out = []
        for i in range(0, len(images), batch_size):
            chunk = jnp.asarray(images[i:i + batch_size])
            out.append(np.asarray(lclip.encode_image_model(
                params, cfg, _normalize_images(chunk, cfg))))
        return np.concatenate(out, 0)

    def embed_texts(texts):
        out = []
        for i in range(0, len(texts), batch_size):
            out.append(np.asarray(lclip.encode_text(
                params["text"], cfg.text,
                jnp.asarray(tokenizer(texts[i:i + batch_size])),
                cfg.quick_gelu)))
        return np.concatenate(out, 0)

    if not keep:
        # every generation NSFW-blanked: report the filtering instead
        # of crashing on an empty embed batch
        return {"n": 0, "n_black_filtered": n_black,
                "clipscore_gen_caption": 0.0}
    kept_caps = [captions[i] for i in keep]
    text_f = embed_texts(kept_caps)
    gen_f = embed_images(gen_images[keep])
    result: Dict[str, object] = {
        "n": len(keep), "n_black_filtered": n_black,
        "clipscore_gen_caption": float(clip_score(gen_f, text_f).mean()),
    }
    if real_images is not None and keep:
        real_f = embed_images(np.asarray(real_images)[keep])
        result["clipscore_real_caption"] = float(
            clip_score(real_f, text_f).mean())
        result["clipscore_gen_real"] = float(
            clip_score(gen_f, real_f).mean())
    return result


def compute_clipscores_and_fid(params, cfg: CLIPConfig, tokenizer,
                               captions: Sequence[str],
                               gen_images: np.ndarray,
                               real_images: Optional[np.ndarray] = None,
                               batch_size: int = 64,
                               fid_features: str = "clip"
                               ) -> Dict[str, object]:
    """CLIPScore + FID post-processing (the full
    `compute_clipscores.py:14-185` metric set): CLIPScores over
    non-black images, FID between real and generated sets
    (`fid_features`: 'clip' offline-first, 'inception' classic)."""
    result = compute_clipscores(params, cfg, tokenizer, captions,
                                gen_images, real_images, batch_size)
    keep = [i for i in range(len(gen_images))
            if not is_black_image(gen_images[i])]
    if real_images is not None and keep:
        from leaf_tpu.evals.fid import (
            compute_fid,
            make_clip_feature_fn,
            make_inception_feature_fn,
        )
        fn = None
        if fid_features == "inception":
            fn = make_inception_feature_fn()
        if fn is None:
            fn = make_clip_feature_fn(params, cfg, batch_size)
            fid_features = "clip"
        # the reference computes FID only on non-black pairs
        # (filter_and_copy_images builds filtered temp dirs)
        result[f"fid_{fid_features}"] = compute_fid(
            np.asarray(real_images)[keep], np.asarray(gen_images)[keep], fn)
    return result


def _load_image_dir(path: str, size: Optional[int] = None) -> np.ndarray:
    """Sorted [N, H, W, 3] float array in [0,1] from an image folder,
    with CLIP eval geometry (bicubic shortest-side + center crop — a
    naive squash distorts aspect ratio and depresses scores)."""
    import os

    from PIL import Image

    from leaf_tpu.models.preprocess import image_transform
    files = sorted(os.path.join(path, f) for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    tf = image_transform(size, do_normalize=False) if size else None
    imgs = []
    for f in files:
        im = Image.open(f).convert("RGB")
        imgs.append(tf(im) if tf else np.asarray(im, np.float32) / 255.0)
    return np.stack(imgs)


def main(argv=None) -> Dict[str, object]:
    """CLI (reference `compute_clipscores.py:14-185`): CLIPScore over
    generated images vs captions (black/NSFW-blanked images filtered),
    plus real-image scores and FID when a real dir is given."""
    import argparse
    import json
    import logging

    p = argparse.ArgumentParser("leaf_tpu CLIPScore/FID post-processing")
    p.add_argument("--model", default="ViT-L-14")
    p.add_argument("--pretrained", default=None)
    p.add_argument("--gen-dir", required=True,
                   help="folder of generated images (sorted order "
                        "matches the captions file)")
    p.add_argument("--real-dir", default=None)
    p.add_argument("--captions", required=True,
                   help="JSON list of captions")
    p.add_argument("--fid-features", default="clip",
                   choices=["clip", "inception"])
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--output", default=None, help="results JSON path")
    p.add_argument("--allow-random-weights", action="store_true",
                   help="score with a randomly initialised model "
                        "(tests only — the metrics are meaningless)")
    args = p.parse_args(argv)
    if not args.pretrained and not args.allow_random_weights:
        p.error("--pretrained is required: CLIPScore from randomly "
                "initialised weights is meaningless noise "
                "(--allow-random-weights to override for tests)")

    logging.basicConfig(level=logging.INFO)
    from leaf_tpu.models.factory import create_model, get_tokenizer
    from leaf_tpu.models.pretrained import resolve_pretrained

    pretrained = (resolve_pretrained(args.model, args.pretrained)
                  if args.pretrained else None)
    model = create_model(args.model, pretrained)
    tokenizer = get_tokenizer(args.model)
    with open(args.captions) as f:
        captions = json.load(f)
    size = model.cfg.vision.image_size
    gen = _load_image_dir(args.gen_dir, size)
    real = _load_image_dir(args.real_dir, size) if args.real_dir else None
    n = min(len(captions), len(gen), *( [len(real)] if real is not None else [] ))
    out = compute_clipscores_and_fid(
        model.params, model.cfg, tokenizer, captions[:n], gen[:n],
        real[:n] if real is not None else None,
        batch_size=args.batch_size, fid_features=args.fid_features)
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
