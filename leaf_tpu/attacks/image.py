"""L∞/L2 PGD image attacks, fully jitted.

TPU-native re-expression of the reference image attacks:
  * `attack_image` / `attack_image_classification`
    (`/root/reference/utils_attacks.py:654-730`): sign-gradient PGD with
    uniform init, ε-ball clamp, de-normalised pixel space;
  * FARE's momentum PGD (`src/robust_vlm/train/pgd_train.py:6-66`):
    normalised gradient + momentum, L∞/L2 projection, [0,1] clamp.

Each attack is one `lax.fori_loop` of forward+input-grad through the
vision tower — a single compiled graph per (shape, steps) with no
host↔device traffic inside the loop (SURVEY.md §7 hard part 7).
Images are NHWC in [0,1]; normalisation is folded into the loss closure.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig
from leaf_tpu.models.preprocess import OPENAI_DATASET_MEAN, OPENAI_DATASET_STD


def _normalize_images(x: jnp.ndarray, cfg=None) -> jnp.ndarray:
    """Pixel [0,1] → model input.  `cfg` (a CLIPConfig) selects the
    model's preprocess stats; None/unset → OpenAI CLIP stats (SigLIP
    configs carry 0.5/0.5)."""
    mean_v = OPENAI_DATASET_MEAN
    std_v = OPENAI_DATASET_STD
    if cfg is not None and getattr(cfg, "image_mean", None):
        mean_v = cfg.image_mean
        std_v = cfg.image_std or std_v
    mean = jnp.asarray(mean_v, x.dtype)
    std = jnp.asarray(std_v, x.dtype)
    return (x - mean) / std


def _encode(params, cfg: CLIPConfig, images, normalize, dtype):
    return lclip.encode_image_model(params, cfg,
                                    _normalize_images(images, cfg),
                                    normalize=normalize, dtype=dtype)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "objective", "n_steps", "dtype"))
def attack_image(params, cfg: CLIPConfig, images, anchor_features, key,
                 objective: str = "l2", eps: float = 2 / 255,
                 n_steps: int = 10, stepsize: Optional[float] = None,
                 dtype=jnp.float32):
    """Embedding-objective PGD (reference `utils_attacks.py:654-697`).

    Maximise ‖f(x+δ) − a‖² (l2) or −⟨f̂, â⟩ (dissim) over ‖δ‖∞ ≤ ε,
    uniform init, sign-gradient steps.  `images` NHWC in [0,1],
    pre-normalisation.
    """
    stepsize = eps / n_steps if stepsize is None else stepsize
    if objective not in ("l2", "dissim"):
        # the reference image attack implements exactly these two
        # (`utils_attacks.py:668-681`); silently falling through to an
        # unnormalized dot product matched no documented objective
        raise ValueError(f"attack_image objective must be 'l2' or "
                         f"'dissim', got {objective!r}")
    if objective == "dissim":
        anchor_features = lclip.l2_normalize(anchor_features)

    def loss_fn(delta):
        feats = _encode(params, cfg, images + delta,
                        normalize=(objective == "dissim"), dtype=dtype)
        feats = feats.astype(jnp.float32)
        if objective == "l2":
            return jnp.sum(jnp.square(anchor_features - feats))
        return -jnp.sum(anchor_features * feats)

    grad_fn = jax.grad(loss_fn)
    delta0 = eps * (2 * jax.random.uniform(key, images.shape,
                                           images.dtype) - 1)

    def body(_, delta):
        g = grad_fn(delta)
        delta = delta + stepsize * jnp.sign(g)
        return jnp.clip(delta, -eps, eps)

    delta = jax.lax.fori_loop(0, n_steps, body, delta0)
    return images + delta


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "dtype"))
def attack_image_classification(params, cfg: CLIPConfig, images, classifier,
                                labels, key, eps: float = 2 / 255,
                                n_steps: int = 10,
                                stepsize: Optional[float] = None,
                                dtype=jnp.float32):
    """Zero-shot-classification PGD: maximise CE of normalised image
    features against the class-embedding matrix `classifier` [D, K]
    (reference `utils_attacks.py:699-730`)."""
    stepsize = eps / n_steps if stepsize is None else stepsize

    def loss_fn(delta):
        feats = _encode(params, cfg, images + delta, normalize=True,
                        dtype=dtype).astype(jnp.float32)
        logits = feats @ classifier.astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))

    grad_fn = jax.grad(loss_fn)
    delta0 = eps * (2 * jax.random.uniform(key, images.shape,
                                           images.dtype) - 1)

    def body(_, delta):
        g = grad_fn(delta)
        delta = delta + stepsize * jnp.sign(g)
        return jnp.clip(delta, -eps, eps)

    delta = jax.lax.fori_loop(0, n_steps, body, delta0)
    return images + delta


def _normalize_grad(g: jnp.ndarray, norm: str) -> jnp.ndarray:
    if norm in ("inf", "linf", "Linf"):
        return jnp.sign(g)
    flat = g.reshape(g.shape[0], -1)
    flat = flat / jnp.maximum(jnp.linalg.norm(flat, axis=1, keepdims=True), 1e-12)
    return flat.reshape(g.shape)


def _project(delta: jnp.ndarray, eps: float, norm: str) -> jnp.ndarray:
    if norm in ("inf", "linf", "Linf"):
        return jnp.clip(delta, -eps, eps)
    flat = delta.reshape(delta.shape[0], -1)
    norms = jnp.linalg.norm(flat, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, eps / jnp.maximum(norms, 1e-12))
    return (flat * scale).reshape(delta.shape)


def pgd(loss_fn: Callable, images: jnp.ndarray, norm: str, eps: float,
        iterations: int, stepsize: float, mode: str = "max",
        momentum: float = 0.9, perturbation: Optional[jnp.ndarray] = None):
    """FARE momentum PGD (reference `pgd_train.py:6-66`).

    `loss_fn(adv_images) → scalar`; gradient is normalised (sign for L∞,
    unit-L2 otherwise), accumulated with momentum, re-normalised,
    stepped, projected to the ε-ball and clamped so x+δ stays in [0,1].
    NaN gradients are zeroed (`pgd_train.py:42-44`).
    """
    sign = {"max": 1.0, "min": -1.0}[mode]
    grad_fn = jax.grad(lambda d: loss_fn(images + d))
    if perturbation is None:
        perturbation = jnp.zeros_like(images)

    def body(_, state):
        delta, velocity = state
        g = grad_fn(delta)
        g = jnp.where(jnp.isnan(g), 0.0, g)
        g = _normalize_grad(g, norm)
        velocity = _normalize_grad(momentum * velocity + g, norm)
        delta = delta + sign * stepsize * velocity
        delta = _project(delta, eps, norm)
        delta = jnp.clip(images + delta, 0.0, 1.0) - images
        return delta, velocity

    delta, _ = jax.lax.fori_loop(0, iterations, body,
                                 (perturbation, jnp.zeros_like(images)))
    return images + delta
