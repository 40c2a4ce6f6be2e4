"""Zero-shot classifier builder + metadata.

TPU-native equivalent of the reference's
`build_zero_shot_classifier` (`/root/reference/src/open_clip/
zero_shot_classifier.py:24-77`) and `zero_shot_metadata.py` (1000
ImageNet classnames + 80 OpenAI prompt templates, stored here as a JSON
asset): for every class, encode all templated prompts, average the
normalised embeddings, re-normalise, and stack into a [D, K] classifier
matrix.  Batched over classes so the encode runs as a few large
MXU-shaped batches.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Callable, List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "assets", "zero_shot_metadata.json")


@functools.lru_cache()
def _metadata() -> dict:
    with open(_ASSET) as f:
        return json.load(f)


def imagenet_classnames() -> List[str]:
    return list(_metadata()["imagenet_classnames"])


def openai_imagenet_templates() -> List[str]:
    """80 prompt templates as '{}'-format strings."""
    return list(_metadata()["openai_imagenet_templates"])


def simple_imagenet_templates() -> List[str]:
    return list(_metadata()["simple_imagenet_templates"])


def build_zero_shot_classifier(
    encode_text: Callable[[np.ndarray], jnp.ndarray],
    tokenizer,
    classnames: Sequence[str],
    templates: Sequence[Union[str, Callable[[str], str]]],
    num_classes_per_batch: Optional[int] = 10,
) -> jnp.ndarray:
    """Build a [D, K] zero-shot classifier.

    encode_text: fn(tokens [N, C]) → UNnormalised features [N, D]
    templates: '{}'-format strings (or callables str→str).
    """
    fmt = [t if callable(t) else t.format for t in templates]
    T = len(fmt)
    chunks = []
    step = num_classes_per_batch or len(classnames)
    for start in range(0, len(classnames), step):
        batch_names = classnames[start:start + step]
        texts = [f(name) for name in batch_names for f in fmt]
        feats = encode_text(tokenizer(texts))
        feats = jnp.asarray(feats).reshape(len(batch_names), T, -1)
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        mean = feats.mean(axis=1)
        mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
        chunks.append(mean)
    return jnp.concatenate(chunks, axis=0).T  # [D, K]
