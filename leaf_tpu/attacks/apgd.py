"""Auto-PGD (APGD) — fully jitted, Linf/L2/L1.

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

L1 follows the reference's sparse variant (`apgd_train.py:160-167,
257-268, 358-370`): top-k sparse sign steps, exact projection onto the
box∩L1-ball, and sparsity-adaptive (not oscillation-based) step-size
control at fixed checkpoint intervals.  The projection itself
(`L1_projection`, `apgd_train.py:25-78`) is re-derived as a jittable
bisection on the soft-threshold λ — the same KKT solution the
reference's sort-and-scan computes, but O(n log(1/tol)) with static
shapes instead of a data-dependent loop.
"""
from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp


def _l2_norm(x, keepdim=True):
    z = jnp.sqrt(jnp.sum(jnp.square(x.reshape(x.shape[0], -1)), axis=-1))
    if keepdim:
        z = z.reshape(-1, *([1] * (x.ndim - 1)))
    return z


def l1_projection(x: jnp.ndarray, y: jnp.ndarray, eps: float,
                  n_bisect: int = 60) -> jnp.ndarray:
    """δ such that y+δ is the Euclidean projection of y onto
    {d : ‖d‖₁ ≤ eps, 0 ≤ x+d ≤ 1} (reference `apgd_train.py:25-78`
    L1_projection).

    KKT form: d_i(λ) = clip(soft_threshold(y_i, λ), -x_i, 1-x_i) with
    ‖d(λ)‖₁ monotonically decreasing in λ; λ=0 is the box-only clip.
    Bisection over λ ∈ [0, max|y|] to 2⁻⁶⁰ relative precision; exact
    zeros are produced for |y_i| ≤ λ (the L0 sparsity the reference's
    adaptive-topk logic reads back is preserved)."""
    B = y.shape[0]
    yf = y.reshape(B, -1)
    lo_box = -x.reshape(B, -1)
    hi_box = 1.0 - x.reshape(B, -1)

    def d_of(lam):  # lam [B, 1]
        st = jnp.sign(yf) * jnp.maximum(jnp.abs(yf) - lam, 0.0)
        return jnp.clip(st, lo_box, hi_box)

    def l1(d):
        return jnp.sum(jnp.abs(d), axis=-1, keepdims=True)

    need = l1(d_of(jnp.zeros((B, 1), yf.dtype))) > eps
    lo = jnp.zeros((B, 1), yf.dtype)
    hi = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)

    def body(_, carry):
        lo, hi = carry
        mid = (lo + hi) / 2.0
        too_big = l1(d_of(mid)) > eps
        return jnp.where(too_big, mid, lo), jnp.where(too_big, hi, mid)

    lo, hi = jax.lax.fori_loop(0, n_bisect, body, (lo, hi))
    lam = jnp.where(need, hi, 0.0)
    return (d_of(lam) - yf).reshape(y.shape)


class _State(NamedTuple):
    x_adv: jnp.ndarray
    x_adv_old: jnp.ndarray
    grad: jnp.ndarray
    x_best: jnp.ndarray
    grad_best: jnp.ndarray
    loss_best: jnp.ndarray
    loss_best_last_check: jnp.ndarray
    reduced_last_check: jnp.ndarray
    loss_steps: jnp.ndarray        # [n_iter, B]
    step_size: jnp.ndarray         # [B, 1, 1, 1]
    counter3: jnp.ndarray          # scalar int
    k: jnp.ndarray                 # scalar int: checkpoint interval
    topk: jnp.ndarray              # [B] L1 sparse-step fraction
    sp_old: jnp.ndarray            # [B] L1 previous ‖x_best−x‖₀


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
         n_iter: int = 10, initial_stepsize: Optional[float] = None,
         is_train: bool = False) -> jnp.ndarray:
    """Maximise per-sample `loss_fn(x_adv) → [B]` over the ε-ball.

    Returns the best-loss adversarial points (reference returns
    `x_best`).  Call under jit for a single fused computation.
    `is_train` only affects L1 (initial top-k fraction .05 vs .2,
    reference `apgd_train.py:162`).
    """
    norm = (norm.lower().replace("l2", "L2").replace("linf", "Linf")
            .replace("l1", "L1"))
    assert norm in ("Linf", "L2", "L1"), f"unsupported norm {norm}"
    B = x.shape[0]
    ones = (B,) + (1,) * (x.ndim - 1)
    n_fts = math.prod(x.shape[1:])

    if norm == "L1":
        n_iter_2 = max(int(0.04 * n_iter), 1)   # fixed checkpoint gap
        n_iter_min = n_iter_2
        size_decr = 0
        init_topk = 0.05 if is_train else 0.2
        adasp_redstep, adasp_minstep = 1.5, 10.0
        alpha = 1.0
    else:
        n_iter_2 = max(int(0.22 * n_iter), 1)
        n_iter_min = max(int(0.06 * n_iter), 1)
        size_decr = max(int(0.03 * n_iter), 1)
        init_topk = 0.0
        alpha = 2.0
    thr_decr = 0.75
    if initial_stepsize is not None:
        alpha = initial_stepsize / eps

    def loss_and_grad(xa):
        # one fused forward+backward (jax.grad alone would re-run the
        # forward for the loss value)
        def summed(xa):
            l = loss_fn(xa)
            return l.sum(), l
        (_, l), g = jax.value_and_grad(summed, has_aux=True)(xa)
        return l, g

    x_adv0 = jnp.clip(x, 0.0, 1.0)
    loss0, grad0 = loss_and_grad(x_adv0)

    state = _State(
        x_adv=x_adv0, x_adv_old=x_adv0, grad=grad0,
        x_best=x_adv0, grad_best=grad0, loss_best=loss0,
        loss_best_last_check=loss0,
        reduced_last_check=jnp.ones((B,), x.dtype),
        loss_steps=jnp.zeros((n_iter, B), x.dtype),
        step_size=alpha * eps * jnp.ones(ones, x.dtype),
        counter3=jnp.zeros((), jnp.int32),
        k=jnp.asarray(n_iter_2, jnp.int32),
        topk=init_topk * jnp.ones((B,), x.dtype),
        sp_old=float(n_fts) * jnp.ones((B,), x.dtype),
    )

    def project(x_adv_1):
        if norm == "Linf":
            return jnp.clip(jnp.clip(x_adv_1, x - eps, x + eps), 0.0, 1.0)
        delta = x_adv_1 - x
        dn = _l2_norm(delta) + 1e-12
        scale = jnp.minimum(eps, _l2_norm(delta)) / dn
        return jnp.clip(x + delta * scale, 0.0, 1.0)

    def l1_step(s: _State) -> jnp.ndarray:
        """Sparse sign step + exact box∩L1 projection (reference
        `apgd_train.py:257-268`); no momentum for L1."""
        ga = jnp.abs(s.grad).reshape(B, -1)
        sorted_ga = jnp.sort(ga, axis=-1)                  # ascending
        idx = jnp.clip(((1.0 - s.topk) * n_fts).astype(jnp.int32),
                       0, n_fts - 1)
        thr = jnp.take_along_axis(sorted_ga, idx[:, None], axis=-1)
        sparse = s.grad * (jnp.abs(s.grad) >= thr.reshape(ones))
        sgn = jnp.sign(sparse)
        denom = jnp.sum(jnp.abs(sgn).reshape(B, -1), axis=-1) + 1e-10
        x_adv_1 = s.x_adv + s.step_size * sgn / denom.reshape(ones)
        delta_u = x_adv_1 - x
        return x + delta_u + l1_projection(x, delta_u, eps)

    def body(i, s: _State) -> _State:
        if norm == "L1":
            x_adv_1 = l1_step(s)
        else:
            a = jnp.where(i > 0, 0.75, 1.0)
            grad2 = s.x_adv - s.x_adv_old

            if norm == "Linf":
                step = s.step_size * jnp.sign(s.grad)
            else:
                step = s.step_size * s.grad / (_l2_norm(s.grad) + 1e-12)
            x_adv_1 = project(s.x_adv + step)
            x_adv_1 = project(s.x_adv + (x_adv_1 - s.x_adv) * a
                              + grad2 * (1 - a))

        # the final iteration's gradient is never used — skip its
        # backward pass (the reference's 'save one backward' branch,
        # apgd_train.py)
        loss, grad = jax.lax.cond(
            i < n_iter - 1, loss_and_grad,
            lambda xa: (loss_fn(xa), jnp.zeros_like(xa)), x_adv_1)

        # track best per-sample points
        better = loss > s.loss_best
        bsel = better.reshape(ones)
        x_best = jnp.where(bsel, x_adv_1, s.x_best)
        grad_best = jnp.where(bsel, grad, s.grad_best)
        loss_best = jnp.where(better, loss, s.loss_best)
        loss_steps = s.loss_steps.at[i].set(loss)

        counter3 = s.counter3 + 1
        do_check = counter3 == s.k

        if norm == "L1":
            # sparsity-adaptive step control (reference
            # `apgd_train.py:358-370`); k stays fixed for L1
            sp_curr = jnp.sum(
                (jnp.abs(x_best - x) > 1e-10).reshape(B, -1), axis=-1
            ).astype(x.dtype)
            fl_red = (sp_curr / s.sp_old) < 0.95
            topk_new = jnp.where(do_check, sp_curr / n_fts / 1.5, s.topk)
            new_step = jnp.where(fl_red.reshape(ones), alpha * eps,
                                 s.step_size / adasp_redstep)
            new_step = jnp.clip(new_step, alpha * eps / adasp_minstep,
                                alpha * eps)
            step_size = jnp.where(do_check, new_step, s.step_size)
            hsel = fl_red.reshape(ones) & do_check
            x_adv_new = jnp.where(hsel, x_best, x_adv_1)
            grad_new = jnp.where(hsel, grad_best, grad)
            sp_old_new = jnp.where(do_check, sp_curr, s.sp_old)
            reduced = s.reduced_last_check
            loss_best_last = s.loss_best_last_check
            k_new = s.k
        else:
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
            topk_new = s.topk
            sp_old_new = s.sp_old
        counter3 = jnp.where(do_check, 0, counter3)

        return _State(
            x_adv=x_adv_new, x_adv_old=s.x_adv, grad=grad_new,
            x_best=x_best, grad_best=grad_best, loss_best=loss_best,
            loss_best_last_check=loss_best_last,
            reduced_last_check=reduced, loss_steps=loss_steps,
            step_size=step_size, counter3=counter3, k=k_new,
            topk=topk_new, sp_old=sp_old_new)

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
