"""Host-side image preprocessing (resize / center-crop / normalize).

Equivalent of the reference transforms
(`/root/reference/src/open_clip/transform.py:274-407`), returning NHWC
float32 numpy ready for device upload.  LEAF's training path splits the
pipeline into (geometry) and (normalize) so attacks can operate in
pixel space (`train_AT_text_only.py:262-267`); we expose the same split.
"""
from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple, Union

import numpy as np

# reference `src/open_clip/constants.py`
OPENAI_DATASET_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_DATASET_STD = (0.26862954, 0.26130258, 0.27577711)


def resize_shorter(img, size: int, interp=None):
    """PIL resize of the shorter side to `size` (bicubic default)."""
    from PIL import Image
    w, h = img.size
    if w < h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return img.resize(new, Image.BICUBIC if interp is None else interp)


def center_crop(arr: np.ndarray, size: int) -> np.ndarray:
    h, w = arr.shape[:2]
    top = (h - size) // 2
    left = (w - size) // 2
    return arr[top:top + size, left:left + size]


def normalize(images: np.ndarray,
              mean: Sequence[float] = OPENAI_DATASET_MEAN,
              std: Sequence[float] = OPENAI_DATASET_STD) -> np.ndarray:
    """[..., H, W, 3] in [0,1] → normalized (broadcast over batch)."""
    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)
    return (images - mean) / std


def denormalize(images: np.ndarray,
                mean: Sequence[float] = OPENAI_DATASET_MEAN,
                std: Sequence[float] = OPENAI_DATASET_STD) -> np.ndarray:
    mean = np.asarray(mean, dtype=np.float32)
    std = np.asarray(std, dtype=np.float32)
    return images * std + mean


INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


_PIL_INTERP = {"bicubic": "BICUBIC", "bilinear": "BILINEAR"}


def _resolve_interp(interpolation: str, rng=None):
    """'random' picks bicubic/bilinear per image (reference
    `transform.py` InterpolationMode handling + 'random' choice)."""
    from PIL import Image
    if interpolation == "random":
        idx = (int(rng.integers(2)) if rng is not None
               else np.random.randint(2))
        return getattr(Image, ("BICUBIC", "BILINEAR")[idx])
    return getattr(Image, _PIL_INTERP[interpolation])


def _geometry(img, image_size: int, resize_mode: str, interp):
    """Eval geometry (reference `transform.py:352-380`): 'shortest' =
    resize shorter side + center crop; 'longest' = fit inside + pad;
    'squash' = direct (possibly anisotropic) resize."""
    w, h = img.size
    if resize_mode == "squash":
        img = img.resize((image_size, image_size), interp)
        return np.asarray(img, dtype=np.float32) / 255.0
    if resize_mode == "longest":
        scale = image_size / max(w, h)
        nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
        img = img.resize((nw, nh), interp)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        out = np.zeros((image_size, image_size, 3), np.float32)
        top, left = (image_size - nh) // 2, (image_size - nw) // 2
        out[top:top + nh, left:left + nw] = arr
        return out
    if resize_mode != "shortest":
        raise ValueError(f"unknown resize_mode {resize_mode!r}")
    img = resize_shorter(img, image_size, interp)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    return center_crop(arr, image_size)


def image_transform(image_size: int, do_normalize: bool = True,
                    mean: Optional[Sequence[float]] = None,
                    std: Optional[Sequence[float]] = None,
                    interpolation: str = "bicubic",
                    resize_mode: str = "shortest"):
    """Return fn: PIL image / uint8 array → NHWC float32 [H, W, 3].

    Pipeline: resize per `resize_mode` (shortest+crop / longest+pad /
    squash, reference `transform.py:352-380`) with `interpolation`
    (bicubic/bilinear/random) → scale to [0,1] → (optional) normalize
    with `mean`/`std` (default OpenAI CLIP stats; SigLIP-family configs
    carry (0.5, 0.5, 0.5)).
    """
    mean = OPENAI_DATASET_MEAN if mean is None else tuple(mean)
    std = OPENAI_DATASET_STD if std is None else tuple(std)

    # "random is ignored for interpolation_mode, so defaults to BICUBIC
    # for inference if set" (reference transform.py:294)
    eval_interp = "bicubic" if interpolation == "random" else interpolation

    def transform(img) -> np.ndarray:
        if isinstance(img, np.ndarray):
            from PIL import Image
            img = Image.fromarray(img)
        img = img.convert("RGB")
        arr = _geometry(img, image_size, resize_mode,
                        _resolve_interp(eval_interp))
        if do_normalize:
            arr = normalize(arr, mean, std)
        return arr

    return transform


class AugmentationCfg:
    """Train-time augmentation knobs (reference `transform.py:62-72`;
    unknown keys raise like the reference's dataclass would)."""

    def __init__(self, scale=(0.9, 1.0), ratio=(3 / 4, 4 / 3),
                 color_jitter=None, color_jitter_prob=None,
                 gray_scale_prob=None):
        self.scale = tuple(float(s) for s in scale)
        self.ratio = tuple(float(r) for r in ratio)
        self.color_jitter = (tuple(float(c) for c in color_jitter)
                             if color_jitter is not None else None)
        self.color_jitter_prob = color_jitter_prob
        self.gray_scale_prob = gray_scale_prob

    @classmethod
    def parse(cls, d):
        if d is None:
            return cls()
        if isinstance(d, cls):
            return d
        return cls(**d)


def _random_resized_crop(img, image_size: int, scale, ratio, interp, rng):
    """torchvision RandomResizedCrop semantics: 10 area/log-ratio
    attempts, center-crop fallback."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = area * rng.uniform(*scale)
        log_r = rng.uniform(np.log(ratio[0]), np.log(ratio[1]))
        ar = np.exp(log_r)
        cw = int(round(np.sqrt(target * ar)))
        ch = int(round(np.sqrt(target / ar)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            img = img.crop((left, top, left + cw, top + ch))
            return img.resize((image_size, image_size), interp)
    # fallback: center crop to the clipped aspect ratio
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    img = img.crop((left, top, left + cw, top + ch))
    return img.resize((image_size, image_size), interp)


def _apply_color_jitter(img, cj, prob, rng):
    from PIL import ImageEnhance
    if rng.uniform() >= prob:
        return img
    b, c, s = cj[0], cj[1], cj[2]
    hue = cj[3] if len(cj) > 3 else 0.0
    for v, enh in ((b, ImageEnhance.Brightness), (c, ImageEnhance.Contrast),
                   (s, ImageEnhance.Color)):
        if v:
            img = enh(img).enhance(rng.uniform(max(0.0, 1 - v), 1 + v))
    if hue:
        hsv = np.asarray(img.convert("HSV"), np.int16)
        shift = int(round(rng.uniform(-hue, hue) * 255))
        hsv[..., 0] = (hsv[..., 0] + shift) % 256
        from PIL import Image
        img = Image.fromarray(hsv.astype(np.uint8), "HSV").convert("RGB")
    return img


def train_image_transform(image_size: int, do_normalize: bool = True,
                          mean: Optional[Sequence[float]] = None,
                          std: Optional[Sequence[float]] = None,
                          aug_cfg=None, interpolation: str = "bicubic",
                          seed: int = 0):
    """Training transform (reference `transform.py:307-351`):
    RandomResizedCrop(scale, ratio) + optional color-jitter/gray-scale
    (the simclr-style probs) → [0,1] → normalize."""
    import threading

    aug = AugmentationCfg.parse(aug_cfg)
    mean = OPENAI_DATASET_MEAN if mean is None else tuple(mean)
    std = OPENAI_DATASET_STD if std is None else tuple(std)
    # the tar pipeline decodes in a thread pool (data/wds.py) and
    # np.random.Generator is not thread-safe: give each decode thread
    # its own stream (deterministic under single-threaded use; under
    # threads, determinism is bounded by scheduling order anyway).
    # Fold in the process index so multi-host ranks draw independent
    # augmentations rather than correlated ones.
    try:
        import jax
        rank = jax.process_index()
    except Exception:
        rank = 0
    local = threading.local()
    thread_counter = [0]
    counter_lock = threading.Lock()

    def _rng():
        rng = getattr(local, "rng", None)
        if rng is None:
            with counter_lock:
                tid = thread_counter[0]
                thread_counter[0] += 1
            rng = local.rng = np.random.default_rng((seed, rank, tid))
        return rng

    def transform(img) -> np.ndarray:
        rng = _rng()
        if isinstance(img, np.ndarray):
            from PIL import Image
            img = Image.fromarray(img)
        img = img.convert("RGB")
        interp = _resolve_interp(interpolation, rng)
        img = _random_resized_crop(img, image_size, aug.scale, aug.ratio,
                                   interp, rng)
        if aug.color_jitter_prob:
            if aug.color_jitter is None or len(aug.color_jitter) != 4:
                raise ValueError(
                    "color_jitter_prob needs color_jitter=(b, c, s, hue) "
                    "(reference transform.py:342-345)")
            img = _apply_color_jitter(img, aug.color_jitter,
                                      aug.color_jitter_prob, rng)
        if aug.gray_scale_prob and rng.uniform() < aug.gray_scale_prob:
            img = img.convert("L").convert("RGB")
        arr = np.asarray(img, dtype=np.float32) / 255.0
        if do_normalize:
            arr = normalize(arr, mean, std)
        return arr

    return transform
