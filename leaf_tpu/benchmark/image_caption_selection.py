"""Image-caption-selection benchmark (SugarCrepe et al.).

Re-expression of `src/clip_benchmark/metrics/
image_caption_selection.py`: each image comes with a small list of
candidate captions whose FIRST entry is the positive; accuracy is the
fraction of images whose positive caption scores highest.
"""
from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks.image import _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def evaluate_image_caption_selection(params, cfg: CLIPConfig, tokenizer,
                                     dataset) -> Dict[str, float]:
    """dataset iterates (images [B,H,W,3] in [0,1], caption_lists)."""
    correct = 0
    total = 0
    for images, caption_lists in dataset:
        img_f = np.asarray(lclip.encode_image_model(
            params, cfg, _normalize_images(jnp.asarray(images), cfg),
            normalize=True))
        flat = [c for caps in caption_lists for c in caps]
        txt_f = np.asarray(lclip.encode_text(
            params["text"], cfg.text, jnp.asarray(tokenizer(flat)),
            cfg.quick_gelu, normalize=True))
        off = 0
        for i, caps in enumerate(caption_lists):
            k = len(caps)
            scores = img_f[i] @ txt_f[off:off + k].T
            # positive caption is index 0; strict argmax win required
            correct += int(np.argmax(scores) == 0)
            total += 1
            off += k
    return {"acc": correct / max(total, 1), "num_samples": total}
