"""FAB-T — targeted Fast Adaptive Boundary attack (minimum-norm).

TPU-native re-implementation of the FAB attack of AutoAttack (vendored in
the reference at RobustART/noise/utils/adv/Attacks/autoattack/fab_base.py:24-336
with closed-form projections in fab_projections.py; algorithm: Croce & Hein,
"Minimally distorted adversarial examples with a fast adaptive boundary
attack", ICML 2020).

XLA design choices:

- Per iteration the decision boundary toward the target class is linearized
  (f = z_t - z_y, g = ∇f) and the current/original points are projected onto
  {x : f + ⟨g, x − x_i⟩ = 0} ∩ [0,1]^d minimizing the attack norm. The
  reference's sort-based closed forms (fab_projections.py:7-117) are replaced
  with **monotone bisection** on the Lagrange multiplier — 26 fixed
  iterations, branch-free, identical solutions to float tolerance and far
  friendlier to the TPU vector unit than data-dependent sorts.
- The n_iter loop is a ``lax.fori_loop``; the "found adversarial → backward
  step β" branch is masked arithmetic.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp

LogitsFn = Callable[[Any, jax.Array], jax.Array]

_BISECT_ITERS = 26


def _flat(v):
    return v.reshape(v.shape[0], -1)


def _norms(v, p):
    f = _flat(v)
    if p == "Linf":
        return jnp.max(jnp.abs(f), axis=1)
    if p == "L2":
        return jnp.sqrt(jnp.sum(f * f, axis=1) + 1e-18)
    return jnp.sum(jnp.abs(f), axis=1)


def proj_plane_box_linf(x0, g, b):
    """argmin ||x - x0||_inf  s.t. <g, x> = b, 0 <= x <= 1 (per sample).

    Bisection on the radius r: the attainable max of <g, x> within the
    r-ball ∩ box is monotone in r.
    """
    gf, x0f = _flat(g), _flat(x0)
    bf = b

    def attain(r):
        # max over the feasible set of <g, x>
        xr = jnp.clip(x0f + r[:, None] * jnp.sign(gf), 0.0, 1.0)
        return jnp.sum(gf * xr, axis=1), xr

    lo = jnp.zeros(x0f.shape[0])
    hi = jnp.ones(x0f.shape[0])

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        val, _ = attain(mid)
        ok = val >= bf
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    r = hi
    val, xr = attain(r)
    base = jnp.sum(gf * x0f, axis=1)
    theta = jnp.where(
        jnp.abs(val - base) > 1e-12, (bf - base) / (val - base), 0.0
    )
    theta = jnp.clip(theta, 0.0, 1.0)[:, None]
    x_star = x0f + theta * (xr - x0f)
    return (x_star - x0f).reshape(x0.shape)


def proj_plane_box_l2(x0, g, b):
    """argmin ||x - x0||_2  s.t. <g, x> = b, box — bisection on λ in
    x(λ) = clip(x0 + λ g)."""
    gf, x0f = _flat(g), _flat(x0)

    def val(lam):
        x = jnp.clip(x0f + lam[:, None] * gf, 0.0, 1.0)
        return jnp.sum(gf * x, axis=1), x

    lo = jnp.zeros(x0f.shape[0])
    hi = jnp.full((x0f.shape[0],), 1.0)
    # grow hi until attainable or capped (box caps attainment anyway)
    for _ in range(12):
        v, _ = val(hi)
        hi = jnp.where(v < b, hi * 2.0, hi)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        v, _ = val(mid)
        ok = v >= b
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, _BISECT_ITERS, body, (lo, hi))
    _, x_star = val(hi)
    return (x_star - x0f).reshape(x0.shape)


def proj_plane_box_l1(x0, g, b):
    """argmin ||x - x0||_1 s.t. <g, x> = b, box — greedy by |g| via sort."""
    gf, x0f = _flat(g), _flat(x0)
    # movement capacity of each coord toward increasing <g, x>
    room = jnp.where(gf >= 0, 1.0 - x0f, x0f)  # distance to the useful bound
    gain = jnp.abs(gf) * room  # constraint gain if fully moved
    order = jnp.argsort(-jnp.abs(gf), axis=1)
    gain_sorted = jnp.take_along_axis(gain, order, axis=1)
    cum = jnp.cumsum(gain_sorted, axis=1)
    need = (b - jnp.sum(gf * x0f, axis=1))[:, None]
    # how many coords fully moved; the next one partially
    fully = cum < need
    prev_cum = jnp.concatenate(
        [jnp.zeros((cum.shape[0], 1)), cum[:, :-1]], axis=1
    )
    frac_needed = jnp.clip(
        (need - prev_cum) / jnp.maximum(gain_sorted, 1e-18), 0.0, 1.0
    )
    move_frac_sorted = jnp.where(fully, 1.0, frac_needed)
    move_frac = jnp.zeros_like(gf).at[
        jnp.arange(gf.shape[0])[:, None], order
    ].set(move_frac_sorted)
    x_star = x0f + move_frac * room * jnp.sign(gf)
    return (x_star - x0f).reshape(x0.shape)


_PROJ = {"Linf": proj_plane_box_linf, "L2": proj_plane_box_l2, "L1": proj_plane_box_l1}


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "norm", "n_iter", "untargeted")
)
def fab_attack_targeted(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    targets: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    norm: str = "Linf",
    n_iter: int = 100,
    alpha_max: float = 0.1,
    eta: float = 1.05,
    beta: float = 0.9,
    untargeted: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One FAB run. Returns (x_adv_best, best_norm) where x_adv_best is the
    minimal-norm misclassified point found (x where none).

    ``untargeted=True`` re-selects the boundary class per iteration as the
    currently most-likely non-true class (the reference's untargeted FAB
    linearizes toward the closest decision boundary, fab_base.py:84+; the
    per-iteration argmax surrogate avoids the C-class Jacobian).
    """
    b = x.shape[0]
    tail = (1,) * (x.ndim - 1)
    proj = _PROJ[norm]

    def f_and_grad(xi):
        z0 = logits_fn(variables, xi)
        if untargeted:
            masked = z0.at[jnp.arange(b), labels].set(-jnp.inf)
            tgt = jax.lax.stop_gradient(jnp.argmax(masked, 1))
        else:
            tgt = targets

        def f_sum(xx):
            z = logits_fn(variables, xx)
            z_t = jnp.take_along_axis(z, tgt[:, None], 1)[:, 0]
            z_y = jnp.take_along_axis(z, labels[:, None], 1)[:, 0]
            return (z_t - z_y).sum()

        g = jax.grad(f_sum)(xi)
        z_t = jnp.take_along_axis(z0, tgt[:, None], 1)[:, 0]
        z_y = jnp.take_along_axis(z0, labels[:, None], 1)[:, 0]
        pred = jnp.argmax(z0, 1)
        return z_t - z_y, g, pred

    x_i = x
    best_norm = jnp.full((b,), jnp.inf)
    x_best = x

    def body(_, carry):
        x_i, x_best, best_norm = carry
        f, g, pred = f_and_grad(x_i)
        # target plane: f + <g, x - x_i> = 0  →  <g, x> = <g, x_i> - f
        b_i = jnp.sum(_flat(g) * _flat(x_i), 1) - f
        d_i = proj(x_i, g, b_i)
        d_o = proj(x, g, b_i)
        n_i = _norms(d_i, norm)
        n_o = _norms(d_o, norm)
        alpha = jnp.clip(n_i / jnp.maximum(n_i + n_o, 1e-12), 0.0, alpha_max)
        alpha_t = alpha.reshape((-1,) + tail)
        x_next = jnp.clip(
            (1 - alpha_t) * (x_i + eta * d_i) + alpha_t * (x + eta * d_o),
            0.0, 1.0,
        )
        pred2 = jnp.argmax(logits_fn(variables, x_next), 1)
        is_adv = pred2 != labels
        # record the ADVERSARIAL point (reference fab_base.py records into
        # adv_c before the backward step; recording after it would store a
        # point stepped back across the boundary — no longer adversarial)
        cur_norm = _norms(x_next - x, norm)
        improved = is_adv & (cur_norm < best_norm)
        best_norm = jnp.where(improved, cur_norm, best_norm)
        x_best = jnp.where(improved.reshape((-1,) + tail), x_next, x_best)
        # backward step toward the original on success → next iterate only
        x_next = jnp.where(
            is_adv.reshape((-1,) + tail),
            jnp.clip((1 - beta) * x + beta * x_next, 0.0, 1.0),
            x_next,
        )
        return x_next, x_best, best_norm

    x_i, x_best, best_norm = jax.lax.fori_loop(
        0, n_iter, body, (x_i, x_best, best_norm)
    )
    # only return points within the eps budget
    ok = (best_norm <= eps).reshape((-1,) + tail)
    return jnp.where(ok, x_best, x), best_norm
