"""Frechet Inception Distance for the t2i eval.

Re-expression of the reference's clean-fid usage
(`/root/reference/compute_clipscores.py:14-185`): FID between the real
and generated image sets.  The Frechet distance itself is exact
(symmetric-PSD square root via eigendecomposition — no scipy.sqrtm
instability); the feature extractor is pluggable:

  * `clip`   — our CLIP image tower (clean-fid's "clip_features"
               mode, the offline-first default: no inception weights
               needed),
  * `inception` — torchvision InceptionV3 pool3 features when its
               weights are cached locally (the classic FID).
"""
from __future__ import annotations

import functools
import logging
from typing import Callable, Optional, Tuple

import numpy as np

LOG = logging.getLogger(__name__)


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
    """d² = |μ1−μ2|² + tr(Σ1 + Σ2 − 2·(Σ1^{1/2} Σ2 Σ1^{1/2})^{1/2}).

    tr of the geometric-mean term is computed as Σ√λ over the
    eigenvalues of the symmetric product — mathematically identical to
    tr·sqrtm(Σ1 Σ2) for PSD inputs, and numerically robust."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    diff = mu1 - mu2

    s1 = sigma1 + eps * np.eye(sigma1.shape[0])
    s2 = sigma2 + eps * np.eye(sigma2.shape[0])
    # A = Σ1^{1/2} via eigh (symmetric PSD)
    w, v = np.linalg.eigh(s1)
    w = np.clip(w, 0, None)
    a = (v * np.sqrt(w)) @ v.T
    m = a @ s2 @ a
    m = (m + m.T) / 2
    lam = np.clip(np.linalg.eigvalsh(m), 0, None)
    tr_covmean = float(np.sqrt(lam).sum())
    return float(diff @ diff + np.trace(s1) + np.trace(s2)
                 - 2.0 * tr_covmean)


def feature_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, np.atleast_2d(sigma)


def make_clip_feature_fn(params, cfg, batch_size: int = 64) -> Callable:
    """CLIP image-tower features (clean-fid's CLIP-FID mode)."""
    import jax
    import jax.numpy as jnp

    from leaf_tpu.attacks.image import _normalize_images
    from leaf_tpu.models import clip as lclip

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def enc_jit(params, cfg, images):
        # params as an argument, not a baked-in module constant
        return lclip.encode_image_model(params, cfg,
                                        _normalize_images(images, cfg),
                                        normalize=False)

    enc = lambda images: enc_jit(params, cfg, images)  # noqa: E731

    def features(images: np.ndarray) -> np.ndarray:
        out = []
        for i in range(0, len(images), batch_size):
            out.append(np.asarray(enc(jnp.asarray(
                images[i:i + batch_size], jnp.float32))))
        return np.concatenate(out) if out else np.zeros((0, cfg.embed_dim))

    return features


def make_inception_feature_fn(batch_size: int = 32) -> Optional[Callable]:
    """InceptionV3 pool3 features (classic FID); None when torchvision
    weights are not locally available (zero-egress containers)."""
    try:
        import torch
        import torchvision
        net = torchvision.models.inception_v3(weights="DEFAULT")
    except Exception as e:  # noqa: BLE001
        LOG.warning("inception weights unavailable (%r); "
                    "use the CLIP feature mode", e)
        return None
    net.fc = torch.nn.Identity()
    net.eval()

    def features(images: np.ndarray) -> np.ndarray:
        out = []
        with torch.no_grad():
            for i in range(0, len(images), batch_size):
                x = torch.from_numpy(
                    images[i:i + batch_size].transpose(0, 3, 1, 2)).float()
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False)
                # torchvision's ImageNet-trained weights expect ImageNet
                # normalization (the [-1,1] scaling belongs to the
                # TF-slim FID checkpoint, a different network).  NOTE:
                # literature FID numbers use that TF checkpoint — this
                # mode is self-consistent but not literature-comparable;
                # the CLIP-FID mode is the comparable one (cleanfid).
                mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
                std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
                x = (x - mean) / std
                out.append(net(x).numpy())
        return np.concatenate(out)

    return features


def compute_fid(real_images: np.ndarray, fake_images: np.ndarray,
                feature_fn: Callable) -> float:
    """FID between two image sets ([N,H,W,3] float in [0,1])."""
    mu1, s1 = feature_statistics(feature_fn(real_images))
    mu2, s2 = feature_statistics(feature_fn(fake_images))
    return frechet_distance(mu1, s1, mu2, s2)
