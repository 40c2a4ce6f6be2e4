"""Square Attack (black-box random search, L∞).

Completes the reference's AutoAttack surface
(`/root/reference/src/clip_benchmark/metrics/zeroshot_classification.py:137-154`
runs apgd-ce + apgd-t [+ square]): score-based random search
(Andriushchenko et al., 2020) — per iteration, perturb a shrinking
random square window to ±ε per channel and keep the change iff the
per-sample margin loss improves.  Only forward passes touch the model
(one jitted margin-loss query); the proposal loop is host-side numpy.
"""
from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _p_selection(p_init: float, it: int, n_iters: int) -> float:
    """Piecewise schedule of the fraction of pixels to perturb
    (the published schedule)."""
    t = int(it / n_iters * 10000)
    if 10 < t <= 50:
        return p_init / 2
    if 50 < t <= 200:
        return p_init / 4
    if 200 < t <= 500:
        return p_init / 8
    if 500 < t <= 1000:
        return p_init / 16
    if 1000 < t <= 2000:
        return p_init / 32
    if 2000 < t <= 4000:
        return p_init / 64
    if 4000 < t <= 6000:
        return p_init / 128
    if 6000 < t <= 8000:
        return p_init / 256
    if t > 8000:
        return p_init / 512
    return p_init


def square_attack(
    margin_loss_fn: Callable,     # images [B,H,W,C] → (loss [B], fooled [B])
    images: np.ndarray,           # [B, H, W, C] in [0,1]
    eps: float = 8 / 255,
    n_iters: int = 1000,
    p_init: float = 0.8,
    seed: int = 0,
) -> np.ndarray:
    """Returns the best adversarial images found (per-sample)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(images, np.float32)
    B, H, W, C = x.shape

    # init: vertical stripes of ±eps
    stripes = rng.choice([-eps, eps], size=(B, 1, W, C))
    x_best = np.clip(x + stripes, 0.0, 1.0).astype(np.float32)
    loss_best, fooled = (np.asarray(a) for a in margin_loss_fn(
        jnp.asarray(x_best)))

    for it in range(n_iters):
        active = ~fooled
        if not active.any():
            break
        p = _p_selection(p_init, it, n_iters)
        s = max(1, int(round(math.sqrt(p * H * W / 1))))
        s = min(s, H, W)
        x_new = x_best.copy()
        for b in np.where(active)[0]:
            r = rng.integers(0, H - s + 1)
            c = rng.integers(0, W - s + 1)
            delta = rng.choice([-eps, eps], size=(1, 1, C))
            window = x[b, r:r + s, c:c + s] + delta
            x_new[b, r:r + s, c:c + s] = np.clip(window, 0.0, 1.0)
            # keep within the eps-ball of x
            x_new[b] = np.clip(x_new[b], x[b] - eps, x[b] + eps)
            x_new[b] = np.clip(x_new[b], 0.0, 1.0)
        loss_new, fooled_new = (np.asarray(a) for a in margin_loss_fn(
            jnp.asarray(x_new)))
        improved = active & (loss_new > loss_best)
        x_best[improved] = x_new[improved]
        loss_best[improved] = loss_new[improved]
        fooled = fooled | fooled_new
    return x_best


def make_margin_loss_fn(logits_fn: Callable, labels):
    """(margin loss [B], fooled [B]) from a [B,...]→[B,K] logits fn;
    jitted once."""
    labels = jnp.asarray(labels)

    @jax.jit
    def f(x):
        logits = logits_fn(x)
        n_cls = logits.shape[-1]
        is_true = jax.nn.one_hot(labels, n_cls, dtype=bool)
        other = jnp.max(jnp.where(is_true, -jnp.inf, logits), axis=-1)
        true = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return other - true, other > true

    return f
