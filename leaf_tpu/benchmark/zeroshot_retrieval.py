"""Zero-shot retrieval benchmark (recall@K both directions).

Re-expression of `src/clip_benchmark/metrics/zeroshot_retrieval.py`:
image↔text recall@K over a dataset where each image has one or more
captions (positive-pair list semantics).
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import jax.numpy as jnp
import numpy as np

from leaf_tpu.attacks.image import _normalize_images
from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


def recall_at_k(scores: np.ndarray, positive_pairs: np.ndarray,
                k: int) -> np.ndarray:
    """Per-query recall@k: fraction of a query's positives in its
    top-k (the clip_benchmark `recall_at_k` definition)."""
    topk = np.argsort(-scores, axis=1)[:, :k]
    hits = np.take_along_axis(positive_pairs, topk, axis=1).sum(1)
    n_pos = positive_pairs.sum(1)
    return hits / np.maximum(n_pos, 1)


def evaluate_zeroshot_retrieval(
    params,
    cfg: CLIPConfig,
    tokenizer,
    image_loader,                 # yields image batches [B,H,W,3] in [0,1]
    captions: Sequence[str],
    img2txt: Dict[int, List[int]],
    recall_ks: Sequence[int] = (1, 5, 10),
    batch_size: int = 256,
) -> Dict[str, float]:
    img_feats = []
    for images in image_loader:
        chunk = jnp.asarray(images)
        img_feats.append(np.asarray(lclip.encode_image_model(
            params, cfg, _normalize_images(chunk, cfg), normalize=True)))
    image_embs = np.concatenate(img_feats, 0)

    txt_feats = []
    for i in range(0, len(captions), batch_size):
        toks = jnp.asarray(tokenizer(captions[i:i + batch_size]))
        txt_feats.append(np.asarray(lclip.encode_text(
            params["text"], cfg.text, toks, cfg.quick_gelu,
            normalize=True)))
    text_embs = np.concatenate(txt_feats, 0)

    positive = np.zeros((len(image_embs), len(text_embs)), bool)
    for img_id, txt_ids in img2txt.items():
        for t in txt_ids:
            positive[img_id, t] = True

    scores_i2t = image_embs @ text_embs.T
    out = {}
    for k in recall_ks:
        out[f"image_retrieval_recall@{k}"] = float(
            (recall_at_k(scores_i2t.T, positive.T, k) > 0).mean())
        out[f"text_retrieval_recall@{k}"] = float(
            (recall_at_k(scores_i2t, positive, k) > 0).mean())
    return out
