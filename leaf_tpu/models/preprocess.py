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


def resize_shorter(img, size: int):
    """PIL bicubic resize of the shorter side to `size`."""
    from PIL import Image
    w, h = img.size
    if w < h:
        new = (size, max(1, round(h * size / w)))
    else:
        new = (max(1, round(w * size / h)), size)
    return img.resize(new, Image.BICUBIC)


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


def image_transform(image_size: int, do_normalize: bool = True,
                    mean: Optional[Sequence[float]] = None,
                    std: Optional[Sequence[float]] = None):
    """Return fn: PIL image / uint8 array → NHWC float32 [H, W, 3].

    Pipeline: bicubic resize shorter side → center crop → scale to
    [0,1] → (optional) normalize with `mean`/`std` (default OpenAI CLIP
    stats; SigLIP-family configs carry (0.5, 0.5, 0.5)).
    """
    mean = OPENAI_DATASET_MEAN if mean is None else tuple(mean)
    std = OPENAI_DATASET_STD if std is None else tuple(std)
    def transform(img) -> np.ndarray:
        if isinstance(img, np.ndarray):
            from PIL import Image
            img = Image.fromarray(img)
        img = img.convert("RGB")
        img = resize_shorter(img, image_size)
        arr = np.asarray(img, dtype=np.float32) / 255.0
        arr = center_crop(arr, image_size)
        if do_normalize:
            arr = normalize(arr, mean, std)
        return arr

    return transform
