"""Auto-PGD (APGD) — step-size-adaptive PGD, CE and DLR losses, targeted mode.

TPU-native re-implementation of the APGD attack of AutoAttack (vendored in
the reference at RobustART/noise/utils/adv/Attacks/autoattack/
autopgd_base.py:89-691; algorithm: Croce & Hein, "Reliable evaluation of
adversarial robustness with an ensemble of diverse parameter-free attacks",
ICML 2020). Re-designed for XLA:

- the 100-iteration loop is a ``lax.fori_loop`` with per-sample carried state
  (step size, best point, halving counters) — one compiled program, no host
  sync inside the attack;
- the checkpoint schedule w_j (p_0=0, p_1=0.22, p_{j+1}=p_j + max(p_j -
  p_{j-1} - 0.03, 0.06)) is precomputed into a static per-iteration mask;
- step halving conditions (progress < rho·window, or step and best-loss both
  unchanged) are evaluated per sample with masked arithmetic instead of
  Python control flow.

Supports Linf, L2 and L1 norms — L1 uses the sparse top-k step and the
L1-ball∩box projection of the reference's L1_projection (bisection form),
enabling the AutoAttack-L1 variant beyond the reference's exposed Linf.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

LogitsFn = Callable[[Any, jax.Array], jax.Array]


def checkpoint_mask(n_iter: int) -> np.ndarray:
    """Boolean mask, True at checkpoint iterations w_j (paper schedule)."""
    p = [0.0, 0.22]
    while p[-1] < 1.0:
        p.append(p[-1] + max(p[-1] - p[-2] - 0.03, 0.06))
    ws = sorted({int(np.ceil(pi * n_iter)) for pi in p if pi <= 1.0})
    mask = np.zeros(n_iter + 1, bool)
    for w in ws:
        if 0 < w <= n_iter:
            mask[w] = True
    return mask


def _margin_flat(v: jax.Array) -> jax.Array:
    return v.reshape(v.shape[0], -1)


def _l2n(v: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.sum(_margin_flat(v) ** 2, 1, keepdims=True) + 1e-12)


def ce_loss_per_sample(logits: jax.Array, labels: jax.Array) -> jax.Array:
    logp = jax.nn.log_softmax(logits)
    return -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]


def dlr_loss(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """DLR loss (untargeted): -(z_y - max_{i≠y} z_i)/(z_p1 - z_p3)."""
    z_sorted = jnp.sort(logits, axis=1)[:, ::-1]
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    is_top = z_sorted[:, 0] == z_y
    z_other = jnp.where(is_top, z_sorted[:, 1], z_sorted[:, 0])
    denom = z_sorted[:, 0] - z_sorted[:, 2] + 1e-12
    return -(z_y - z_other) / denom


def dlr_loss_targeted(logits: jax.Array, labels: jax.Array,
                      targets: jax.Array) -> jax.Array:
    """Targeted DLR: -(z_y - z_t)/(z_p1 - (z_p3 + z_p4)/2)."""
    z_sorted = jnp.sort(logits, axis=1)[:, ::-1]
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    z_t = jnp.take_along_axis(logits, targets[:, None], axis=1)[:, 0]
    denom = z_sorted[:, 0] - (z_sorted[:, 2] + z_sorted[:, 3]) / 2 + 1e-12
    return -(z_y - z_t) / denom


def l1_ball_box_projection(x_orig, x_adv, eps, iters: int = 30):
    """Project x_adv onto {z : ||z − x_orig||₁ ≤ eps} ∩ [0,1]^d.

    The reference's ``L1_projection`` solves this by bisection
    (autopgd_base.py:19-87); here: the box-feasible soft-threshold solution
    z(λ) = clip(x_orig + sign(δ)·max(|δ|−λ, 0), box) has an L1 distance
    monotone decreasing in λ, so bisect λ ∈ [0, max|δ|].
    """
    d_box = jnp.clip(x_adv, 0.0, 1.0) - x_orig  # feasible direction
    mag = jnp.abs(d_box)
    flat_mag = _margin_flat(mag)

    def l1_at(lam):
        th = jnp.maximum(flat_mag - lam[:, None], 0.0)
        return th.sum(1)

    lo = jnp.zeros(x_adv.shape[0])
    hi = flat_mag.max(1) + 1e-6

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        ok = l1_at(mid) <= eps
        return jnp.where(ok, lo, mid), jnp.where(ok, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    lam = hi.reshape((-1,) + (1,) * (x_adv.ndim - 1))
    need = (_margin_flat(mag).sum(1) > eps).reshape(lam.shape)
    shrunk = jnp.sign(d_box) * jnp.maximum(mag - lam, 0.0)
    delta = jnp.where(need, shrunk, d_box)
    return jnp.clip(x_orig + delta, 0.0, 1.0)


def _l1_sparse_step(x_adv, grad, step, sparsity: float = 0.05):
    """L1-APGD step: move only the top-k fraction of coordinates by |grad|
    (Croce & Hein, 'Mind the box: l1-APGD'; reference autopgd_base sparse
    top-k steps). Step mass ``step`` is spread over the selected coords."""
    g = _margin_flat(grad)
    k = max(int(g.shape[1] * sparsity), 1)
    thresh = jnp.sort(jnp.abs(g), axis=1)[:, -k][:, None]
    mask = (jnp.abs(g) >= thresh).astype(g.dtype)
    direction = jnp.sign(g) * mask
    direction = direction / jnp.maximum(
        jnp.sum(jnp.abs(direction), 1, keepdims=True), 1e-12
    )
    return x_adv + (step.reshape(-1, 1) * direction).reshape(x_adv.shape)


def _project(x_adv, x_orig, eps, norm):
    x_adv = jnp.clip(x_adv, 0.0, 1.0)
    if norm == "Linf":
        return jnp.clip(x_adv, x_orig - eps, x_orig + eps)
    if norm == "L1":
        return l1_ball_box_projection(x_orig, x_adv, eps)
    delta = x_adv - x_orig
    n = _l2n(delta).reshape((-1,) + (1,) * (x_adv.ndim - 1))
    factor = jnp.minimum(1.0, eps / n)
    return jnp.clip(x_orig + delta * factor, 0.0, 1.0)


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "loss", "norm", "n_iter", "eot_iter"),
)
def apgd_attack(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    norm: str = "Linf",
    loss: str = "ce",
    n_iter: int = 100,
    targets: jax.Array | None = None,
    eot_iter: int = 1,
    rho: float = 0.75,
) -> tuple[jax.Array, jax.Array]:
    """One APGD run. Returns (x_adv_best, best_loss_per_sample).

    ``loss``: 'ce' | 'dlr' | 'dlr-targeted' (requires ``targets``).
    Maximizes the loss within the eps-ball.
    """
    b = x.shape[0]
    ndim_tail = (1,) * (x.ndim - 1)

    if loss == "ce":
        loss_fn = lambda lg: ce_loss_per_sample(lg, labels)
    elif loss == "dlr":
        loss_fn = lambda lg: dlr_loss(lg, labels)
    elif loss == "dlr-targeted":
        loss_fn = lambda lg: dlr_loss_targeted(lg, labels, targets)
    else:
        raise ValueError(loss)

    def loss_and_grad(x_adv):
        def total(xi):
            return loss_fn(logits_fn(variables, xi)).sum()

        if eot_iter == 1:
            g = jax.grad(total)(x_adv)
            per = loss_fn(logits_fn(variables, x_adv))
            return per, g
        # EOT: average gradients over eot_iter stochastic passes
        def body(i, acc):
            return acc + jax.grad(total)(x_adv)

        g = jax.lax.fori_loop(0, eot_iter, body, jnp.zeros_like(x_adv)) / eot_iter
        per = loss_fn(logits_fn(variables, x_adv))
        return per, g

    # --- init: random point in the ball (paper: x + eps*u/||u||) ---
    if norm == "Linf":
        u = jax.random.uniform(key, x.shape, x.dtype, -1.0, 1.0)
        x_adv = jnp.clip(x + eps * u, 0.0, 1.0)
    elif norm == "L1":
        k1, k2 = jax.random.split(key)
        mag = jax.random.exponential(k1, x.shape, x.dtype)
        sgn = jnp.sign(jax.random.uniform(k2, x.shape, x.dtype) - 0.5)
        u = mag * sgn
        u = u / _margin_flat(jnp.abs(u)).sum(1).reshape((-1,) + ndim_tail)
        x_adv = _project(x + 0.5 * eps * u, x, eps, norm)
    else:
        u = jax.random.normal(key, x.shape, x.dtype)
        x_adv = _project(x + eps * u / _l2n(u).reshape((-1,) + ndim_tail), x, eps, norm)

    f0, g0 = loss_and_grad(x_adv)
    step = jnp.full((b,) + ndim_tail, 2.0 * eps, x.dtype)

    # first step
    if norm == "Linf":
        x1 = _project(x_adv + step * jnp.sign(g0), x, eps, norm)
    elif norm == "L1":
        x1 = _project(
            _l1_sparse_step(x_adv, g0, step.reshape(b, -1)[:, 0]), x, eps, norm
        )
    else:
        x1 = _project(
            x_adv + step * g0 / _l2n(g0).reshape((-1,) + ndim_tail), x, eps, norm
        )
    f1, _ = loss_and_grad(x1)

    better = f1 > f0
    f_best = jnp.maximum(f0, f1)
    x_best = jnp.where(better.reshape((-1,) + ndim_tail), x1, x_adv)

    ckpt = jnp.asarray(checkpoint_mask(n_iter))
    alpha = 0.75

    carry = dict(
        x_k=x1,
        x_km1=x_adv,
        f_k=f1,
        x_best=x_best,
        f_best=f_best,
        step=step,
        improved_count=jnp.where(better, 1, 0),
        f_best_last_ckpt=f_best,
        step_last_ckpt=step,
        window=jnp.full((b,), 1),  # iterations since last checkpoint
    )

    def body(i, carry):
        f_k, g_k = loss_and_grad(carry["x_k"])
        if norm == "Linf":
            z = _project(carry["x_k"] + carry["step"] * jnp.sign(g_k), x, eps, norm)
        elif norm == "L1":
            z = _project(
                _l1_sparse_step(carry["x_k"], g_k,
                                carry["step"].reshape(b, -1)[:, 0]),
                x, eps, norm,
            )
        else:
            z = _project(
                carry["x_k"]
                + carry["step"] * g_k / _l2n(g_k).reshape((-1,) + ndim_tail),
                x, eps, norm,
            )
        x_next = _project(
            carry["x_k"]
            + alpha * (z - carry["x_k"])
            + (1 - alpha) * (carry["x_k"] - carry["x_km1"]),
            x, eps, norm,
        )
        f_next, _ = loss_and_grad(x_next)

        improved = f_next > carry["f_k"]
        improved_count = carry["improved_count"] + improved.astype(jnp.int32)
        new_best = f_next > carry["f_best"]
        f_best = jnp.where(new_best, f_next, carry["f_best"])
        x_best = jnp.where(new_best.reshape((-1,) + ndim_tail), x_next, carry["x_best"])

        # checkpoint handling (masked, per sample; iteration number = i + 2)
        is_ckpt = ckpt[jnp.minimum(i + 2, n_iter)]
        window = carry["window"] + 1
        cond1 = improved_count < jnp.ceil(rho * window).astype(jnp.int32)
        step_flat = carry["step"].reshape(b, -1)[:, 0]
        step_last_flat = carry["step_last_ckpt"].reshape(b, -1)[:, 0]
        cond2 = (step_last_flat == step_flat) & (
            carry["f_best_last_ckpt"] >= f_best
        )
        halve = is_ckpt & (cond1 | cond2)
        halve_t = halve.reshape((-1,) + ndim_tail)
        step = jnp.where(halve_t, carry["step"] / 2, carry["step"])
        # on halving, restart from the best point
        x_next = jnp.where(halve_t, x_best, x_next)
        f_next = jnp.where(halve, f_best, f_next)

        return dict(
            x_k=x_next,
            x_km1=carry["x_k"],
            f_k=f_next,
            x_best=x_best,
            f_best=f_best,
            step=step,
            improved_count=jnp.where(is_ckpt, 0, improved_count),
            f_best_last_ckpt=jnp.where(is_ckpt, f_best, carry["f_best_last_ckpt"]),
            step_last_ckpt=jnp.where(
                jnp.broadcast_to(is_ckpt, (b,)).reshape((-1,) + ndim_tail),
                step, carry["step_last_ckpt"],
            ),
            window=jnp.where(is_ckpt, 0, window),
        )

    carry = jax.lax.fori_loop(0, n_iter - 1, body, carry)
    return carry["x_best"], carry["f_best"]
