"""Learning-rate schedules.

Pure step→lr functions (jnp-based: traceable inside jit and usable host-side) matching the reference exactly
(`/root/reference/src/open_clip_train/scheduler.py`), usable both as
optax schedules and for logging.  Warmup is linear with lr(0) =
base_lr/warmup (the reference's (step+1)/warmup form).
"""
from __future__ import annotations

import jax.numpy as jnp


def const_lr(base_lr: float, warmup_length: int, steps: int):
    def schedule(step):
        step = jnp.asarray(step)
        warm = base_lr * (step + 1) / max(warmup_length, 1)
        return jnp.where(step < warmup_length, warm, base_lr)
    return schedule


def cosine_lr(base_lr: float, warmup_length: int, steps: int):
    def schedule(step):
        step = jnp.asarray(step)
        warm = base_lr * (step + 1) / max(warmup_length, 1)
        e = step - warmup_length
        es = max(steps - warmup_length, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup_length, warm, cos)
    return schedule


def const_lr_cooldown(base_lr: float, warmup_length: int, steps: int,
                      cooldown_steps: int, cooldown_power: float = 1.0,
                      cooldown_end_lr: float = 0.0):
    def schedule(step):
        step = jnp.asarray(step)
        warm = base_lr * (step + 1) / max(warmup_length, 1)
        start_cooldown = steps - cooldown_steps
        e = step - start_cooldown
        es = max(steps - start_cooldown, 1)
        decay = (1 - jnp.clip(e / es, 0, 1)) ** cooldown_power
        cool = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        out = jnp.where(step < start_cooldown, base_lr, cool)
        return jnp.where(step < warmup_length, warm, out)
    return schedule


def make_scheduler(name: str, base_lr: float, warmup_length: int, steps: int,
                   cooldown_steps: int = 0, cooldown_power: float = 1.0,
                   cooldown_end_lr: float = 0.0):
    """Scheduler by CLI name (`--lr-scheduler`, `params_AT.py`)."""
    if name == "cosine":
        return cosine_lr(base_lr, warmup_length, steps)
    if name == "const":
        return const_lr(base_lr, warmup_length, steps)
    if name == "const-cooldown":
        return const_lr_cooldown(base_lr, warmup_length, steps,
                                 cooldown_steps, cooldown_power,
                                 cooldown_end_lr)
    raise ValueError(f"unknown scheduler {name!r}")
