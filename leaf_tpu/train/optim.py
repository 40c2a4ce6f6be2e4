"""Optimizer construction (AdamW + weight-decay mask + clip + accum).

Reproduces the reference's parameter grouping
(`/root/reference/train_AT_text_only.py:326-341`): weight decay applies
only to parameters that are ≥2-D *in the reference's per-layer layout*
and are not layer-norm gains, biases, or logit_scale.  Because our
residual blocks are stacked on a leading layer axis (ndim shifted by 1),
the mask is expressed by parameter *path* instead of ndim — the decay
sets are identical.

Gradient clipping (`--grad-clip-norm`, global L2) and gradient
accumulation (`--accum-freq` → optax.MultiSteps) are folded into the
same optax chain.  bf16-friendly: no loss scaler needed on TPU (the
reference's GradScaler AMP path is GPU-specific).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import optax

# Path components that put a leaf in the no-decay group.
_NO_DECAY_KEYS = {"ln_1", "ln_2", "ln_pre", "ln_post", "ln_final",
                  "logit_scale", "class_embedding", "bias", "scale"}


def _is_decay_leaf(path) -> bool:
    for entry in path:
        key = getattr(entry, "key", None)
        if key is None:
            continue
        if key in _NO_DECAY_KEYS or key.endswith("_b") or key.endswith("_bias"):
            return False
    return True


def weight_decay_mask(params) -> Any:
    """Pytree of bools: True where weight decay applies."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _is_decay_leaf(path), params)


def make_optimizer(
    schedule,
    weight_decay: float = 0.2,
    beta1: float = 0.9,
    beta2: float = 0.98,
    eps: float = 1e-6,
    grad_clip_norm: Optional[float] = None,
    accum_freq: int = 1,
) -> optax.GradientTransformation:
    """AdamW chain with the reference's defaults
    (`params_AT.py` lr/beta/eps flags; per-model defaults applied by
    the driver)."""
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm) if grad_clip_norm
        else optax.identity(),
        optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=weight_decay_mask),
        optax.scale_by_learning_rate(schedule),
    )
    if accum_freq > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_freq)
    return tx
