"""Auto-PGD (APGD) — fully jitted, Linf/L2.

Re-derivation of the reference implementation
(`/root/reference/src/robust_vlm/train/apgd_train.py:125-376`,
originally fra31/auto-attack): momentum steps (a=0.75), per-sample
adaptive step size with oscillation-based halving at shrinking
checkpoint intervals, best-point restarts, [0,1] pixel clamp.

The whole attack is one `lax.fori_loop` over a fixed-shape state — no
host↔device traffic inside (SURVEY.md §7 hard part 7).  The dynamic
checkpoint schedule (k shrinks by 3% of n_iter at each check, floor 6%)
is carried as scalar state and branched with `jnp.where`, so one
compilation serves any n_iter.

L1/L0 norms (used only by AutoAttack's rarely-selected L1 branch) are
not implemented; Linf and L2 cover FARE training and the apgd-ce/apgd-t
ImageNet eval.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _l2_norm(x, keepdim=True):
    z = jnp.sqrt(jnp.sum(jnp.square(x.reshape(x.shape[0], -1)), axis=-1))
    if keepdim:
        z = z.reshape(-1, *([1] * (x.ndim - 1)))
    return z


class _State(NamedTuple):
    x_adv: jnp.ndarray
    x_adv_old: jnp.ndarray
    grad: jnp.ndarray
    loss: jnp.ndarray              # [B] current per-sample loss
    x_best: jnp.ndarray
    grad_best: jnp.ndarray
    loss_best: jnp.ndarray
    loss_best_last_check: jnp.ndarray
    reduced_last_check: jnp.ndarray
    loss_steps: jnp.ndarray        # [n_iter, B]
    step_size: jnp.ndarray         # [B, 1, 1, 1]
    counter3: jnp.ndarray          # scalar int
    k: jnp.ndarray                 # scalar int: checkpoint interval


def _check_oscillation(loss_steps, j, k, n_iter, k3=0.75):
    """Fraction of the last k steps that improved ≤ k3 → oscillating
    (reference `apgd_train.py:117-123`, incl. wrap-around indexing)."""
    counter5 = jnp.arange(n_iter)
    valid = counter5 < k
    idx_a = jnp.mod(j - counter5, n_iter)
    idx_b = jnp.mod(j - counter5 - 1, n_iter)
    improved = (jnp.take(loss_steps, idx_a, axis=0)
                > jnp.take(loss_steps, idx_b, axis=0))
    t = jnp.sum(improved * valid[:, None], axis=0)
    return t <= k * k3


def apgd(loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
         x: jnp.ndarray, norm: str = "linf", eps: float = 4 / 255,
         n_iter: int = 10, initial_stepsize: Optional[float] = None
         ) -> jnp.ndarray:
    """Maximise per-sample `loss_fn(x_adv) → [B]` over the ε-ball.

    Returns the best-loss adversarial points (reference returns
    `x_best`).  Call under jit for a single fused computation.
    """
    norm = norm.lower().replace("l2", "L2").replace("linf", "Linf")
    assert norm in ("Linf", "L2"), f"unsupported norm {norm}"
    B = x.shape[0]
    ones = (B,) + (1,) * (x.ndim - 1)

    n_iter_2 = max(int(0.22 * n_iter), 1)
    n_iter_min = max(int(0.06 * n_iter), 1)
    size_decr = max(int(0.03 * n_iter), 1)
    thr_decr = 0.75
    alpha = 2.0 if initial_stepsize is None else initial_stepsize / eps

    grad_loss = jax.grad(lambda xa: loss_fn(xa).sum())

    x_adv0 = jnp.clip(x, 0.0, 1.0)
    loss0 = loss_fn(x_adv0)
    grad0 = grad_loss(x_adv0)

    state = _State(
        x_adv=x_adv0, x_adv_old=x_adv0, grad=grad0, loss=loss0,
        x_best=x_adv0, grad_best=grad0, loss_best=loss0,
        loss_best_last_check=loss0,
        reduced_last_check=jnp.ones((B,), x.dtype),
        loss_steps=jnp.zeros((n_iter, B), x.dtype),
        step_size=alpha * eps * jnp.ones(ones, x.dtype),
        counter3=jnp.zeros((), jnp.int32),
        k=jnp.asarray(n_iter_2, jnp.int32),
    )

    def project(x_adv_1):
        if norm == "Linf":
            return jnp.clip(jnp.clip(x_adv_1, x - eps, x + eps), 0.0, 1.0)
        delta = x_adv_1 - x
        dn = _l2_norm(delta) + 1e-12
        scale = jnp.minimum(eps, _l2_norm(delta)) / dn
        return jnp.clip(x + delta * scale, 0.0, 1.0)

    def body(i, s: _State) -> _State:
        a = jnp.where(i > 0, 0.75, 1.0)
        grad2 = s.x_adv - s.x_adv_old

        if norm == "Linf":
            step = s.step_size * jnp.sign(s.grad)
        else:
            step = s.step_size * s.grad / (_l2_norm(s.grad) + 1e-12)
        x_adv_1 = project(s.x_adv + step)
        x_adv_1 = project(s.x_adv + (x_adv_1 - s.x_adv) * a + grad2 * (1 - a))

        loss = loss_fn(x_adv_1)
        grad = grad_loss(x_adv_1)

        # track best per-sample points
        better = loss > s.loss_best
        bsel = better.reshape(ones)
        x_best = jnp.where(bsel, x_adv_1, s.x_best)
        grad_best = jnp.where(bsel, grad, s.grad_best)
        loss_best = jnp.where(better, loss, s.loss_best)
        loss_steps = s.loss_steps.at[i].set(loss)

        counter3 = s.counter3 + 1
        do_check = counter3 == s.k

        osc = _check_oscillation(loss_steps, i, s.k, n_iter, thr_decr)
        no_impr = (1.0 - s.reduced_last_check) * (
            s.loss_best_last_check >= loss_best)
        halve = jnp.maximum(osc.astype(x.dtype), no_impr)

        step_size = jnp.where(do_check & (halve.reshape(ones) > 0),
                              s.step_size / 2.0, s.step_size)
        hsel = (halve.reshape(ones) > 0) & do_check
        x_adv_new = jnp.where(hsel, x_best, x_adv_1)
        grad_new = jnp.where(hsel, grad_best, grad)
        reduced = jnp.where(do_check, halve, s.reduced_last_check)
        loss_best_last = jnp.where(do_check, loss_best,
                                   s.loss_best_last_check)
        k_new = jnp.where(do_check,
                          jnp.maximum(s.k - size_decr, n_iter_min), s.k)
        counter3 = jnp.where(do_check, 0, counter3)

        return _State(
            x_adv=x_adv_new, x_adv_old=s.x_adv, grad=grad_new, loss=loss,
            x_best=x_best, grad_best=grad_best, loss_best=loss_best,
            loss_best_last_check=loss_best_last,
            reduced_last_check=reduced, loss_steps=loss_steps,
            step_size=step_size, counter3=counter3, k=k_new)

    final = jax.lax.fori_loop(0, n_iter, body, state)
    return final.x_best


# -- classification losses for AutoAttack-style eval ------------------------

def ce_loss_fn(logits_fn: Callable, y: jnp.ndarray):
    """Per-sample cross-entropy (apgd-ce inner loss)."""
    def f(x_adv):
        logits = logits_fn(x_adv)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=-1)[:, 0]
    return f


def dlr_targeted_loss_fn(logits_fn: Callable, y: jnp.ndarray,
                         y_target: jnp.ndarray):
    """Targeted DLR loss (apgd-t inner loss, fra31/auto-attack):
    -(z_y − z_t) / (z_π1 − (z_π3 + z_π4)/2)."""
    def f(x_adv):
        logits = logits_fn(x_adv)
        sorted_z = jnp.sort(logits, axis=-1)[:, ::-1]
        z_y = jnp.take_along_axis(logits, y[:, None], axis=-1)[:, 0]
        z_t = jnp.take_along_axis(logits, y_target[:, None], axis=-1)[:, 0]
        denom = sorted_z[:, 0] - (sorted_z[:, 2] + sorted_z[:, 3]) / 2 + 1e-12
        return -(z_y - z_t) / denom
    return f
