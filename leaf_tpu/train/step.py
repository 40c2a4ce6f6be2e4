"""The LEAF training step (jitted, mesh-sharded).

TPU-native redesign of the reference's per-batch update
(`/root/reference/utils_AT.py:262-426`): everything after the attack —
adversarial encode, TextFARE MSE loss, grad, AdamW update, logit_scale
clamp — is ONE compiled XLA computation.  The frozen anchor tower is
just a second text-param pytree through the same apply fn (no model
deepcopy — `train_AT_text_only.py:439-465` equivalent); only the
trainable text tower has optimizer state (the vision tower is frozen
and never enters the step).

Sharding: params replicated, batch sharded over the `data` mesh axis;
GSPMD inserts the grad psum (the reference's DDP allreduce,
SURVEY.md §2.4).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from leaf_tpu.models import clip as lclip
from leaf_tpu.models.config import CLIPConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Trainable text-tower params + optimizer state + step counter."""
    text_params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, text_params, tx: optax.GradientTransformation):
        return cls(text_params=text_params,
                   opt_state=tx.init(text_params),
                   step=jnp.zeros((), jnp.int32))


def textfare_loss(text_params, cfg: CLIPConfig, adv_tokens, anchor_features,
                  normalize: bool = False, dtype=jnp.float32,
                  remat: bool = False,
                  w_fare_text: float = 1.0) -> jnp.ndarray:
    """TextFARE objective: w · MSE(anchor, f(adv)).sum(-1).mean()
    (reference `utils_AT.py:319-322`; `--w_fare_text` weight)."""
    feats = lclip.encode_text(text_params, cfg.text, adv_tokens,
                              cfg.quick_gelu, normalize, dtype, remat=remat)
    diff = anchor_features.astype(jnp.float32) - feats.astype(jnp.float32)
    return w_fare_text * jnp.square(diff).sum(axis=-1).mean()


def make_train_step(cfg: CLIPConfig, tx: optax.GradientTransformation,
                    normalize: bool = False, dtype=jnp.float32,
                    remat: bool = False, donate: bool = True,
                    w_fare_text: float = 1.0):
    """Build the jitted train step.

    step(state, adv_tokens [B,C], anchor_features [B,D])
      → (state', metrics {loss, grad_norm})
    """

    def step_fn(state: TrainState, adv_tokens, anchor_features):
        loss, grads = jax.value_and_grad(textfare_loss)(
            state.text_params, cfg, adv_tokens, anchor_features,
            normalize, dtype, remat, w_fare_text)
        updates, opt_state = tx.update(grads, state.opt_state,
                                       state.text_params)
        text_params = optax.apply_updates(state.text_params, updates)
        new_state = TrainState(text_params=text_params,
                               opt_state=opt_state,
                               step=state.step + 1)
        metrics = {"loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def make_anchor_encode(cfg: CLIPConfig, normalize: bool = False,
                       dtype=jnp.float32):
    """Jitted frozen-tower anchor encode (`utils_AT.py:296`)."""

    @jax.jit
    def encode(frozen_text_params, tokens):
        return lclip.encode_text(frozen_text_params, cfg.text, tokens,
                                 cfg.quick_gelu, normalize, dtype)

    return encode


def clamp_logit_scale(params: Dict[str, Any]) -> Dict[str, Any]:
    """Clamp logit_scale to [0, ln 100] after each step
    (`utils_AT.py:366`)."""
    import math
    params = dict(params)
    params["logit_scale"] = jnp.clip(params["logit_scale"], 0.0,
                                     math.log(100.0))
    return params
