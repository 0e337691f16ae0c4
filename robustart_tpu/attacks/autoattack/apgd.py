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
``apgd_attack_largereps`` adds the reference's L1 ``use_largereps``
schedule (autopgd_base.py:489-569: three phases at 3ε→2ε→ε with warm
starts), which the reference's `standard` version enables for L1
(autoattack.py:258-262).
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


def _l0_norm(v: jax.Array) -> jax.Array:
    """Per-sample count of nonzero coordinates (reference other_utils.py:42)."""
    return (_margin_flat(v) != 0).sum(1).astype(jnp.float32)


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
    x_init: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """One APGD run. Returns (x_adv_best, best_loss_per_sample).

    ``loss``: 'ce' | 'dlr' | 'dlr-targeted' (requires ``targets``).
    Maximizes the loss within the eps-ball. ``x_init``, when given, replaces
    the random start (projected into the ball) — the warm-start hook the
    reference's decr_eps_pgd uses (autopgd_base.py:560-567).
    """
    b = x.shape[0]
    ndim_tail = (1,) * (x.ndim - 1)

    if norm == "L1":
        # L1 uses a structurally different algorithm (adaptive-sparsity
        # steps, no momentum — reference autopgd_base.py:296-460 L1
        # branches); keep the public (x_adv, f_best) contract: fooled
        # samples return their adversarial point, the rest the max-loss one
        x_best, f_best, x_fooled, fooled = apgd_attack_l1(
            logits_fn, variables, x, labels, key,
            eps=eps, loss=loss, n_iter=n_iter, targets=targets,
            eot_iter=eot_iter, x_init=x_init,
        )
        return (
            jnp.where(fooled.reshape((-1,) + ndim_tail), x_fooled, x_best),
            f_best,
        )

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
    if x_init is not None:
        x_adv = _project(x_init, x, eps, norm)
    elif norm == "Linf":
        u = jax.random.uniform(key, x.shape, x.dtype, -1.0, 1.0)
        x_adv = jnp.clip(x + eps * u, 0.0, 1.0)
    else:
        u = jax.random.normal(key, x.shape, x.dtype)
        x_adv = _project(x + eps * u / _l2n(u).reshape((-1,) + ndim_tail), x, eps, norm)

    f0, g0 = loss_and_grad(x_adv)
    step = jnp.full((b,) + ndim_tail, 2.0 * eps, x.dtype)

    # first step
    if norm == "Linf":
        x1 = _project(x_adv + step * jnp.sign(g0), x, eps, norm)
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


@functools.partial(
    jax.jit,
    static_argnames=("logits_fn", "loss", "n_iter", "eot_iter"),
)
def apgd_attack_l1(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    loss: str = "ce",
    n_iter: int = 100,
    targets: jax.Array | None = None,
    eot_iter: int = 1,
    x_init: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """L1-APGD (Croce & Hein, "Mind the box: l1-APGD for sparse adversarial
    attacks", ICML 2021) — the reference's L1 branch of attack_single_run
    (autopgd_base.py:221-224 init, 296-313 hyper-params, 350-365 step,
    429-441 adaptation), redesigned as one ``lax.fori_loop``:

    - sparse step: move only the coordinates whose |grad| is in the top
      ``topk`` fraction, spreading step mass over their sign pattern, then
      project onto the L1-ball∩box (bisection);
    - NO momentum term for L1 (the reference's a-mixing applies to Linf/L2
      only, autopgd_base.py:332-348 vs 350-361);
    - adaptive sparsity: every k = max(0.04·n_iter, 1) iterations, topk ←
      L0(x_best−x)/D/1.5; samples whose support shrank >5% reset their step
      to α·ε and restart from x_best, others divide step by 1.5 (clamped to
      [α·ε/10, α·ε]), with α = 1;
    - step size starts at α·ε = ε (Linf/L2 use 2ε, autopgd_base.py:296).

    Returns ``(x_best, f_best, x_fooled, ever_fooled)``: the max-loss point,
    its loss, the latest misclassified point per sample, and whether one was
    found (reference x_best_adv / acc).
    """
    b = x.shape[0]
    ndim_tail = (1,) * (x.ndim - 1)
    D = int(np.prod(x.shape[1:]))

    if loss == "ce":
        loss_fn = lambda lg: ce_loss_per_sample(lg, labels)
    elif loss == "dlr":
        loss_fn = lambda lg: dlr_loss(lg, labels)
    elif loss == "dlr-targeted":
        loss_fn = lambda lg: dlr_loss_targeted(lg, labels, targets)
    else:
        raise ValueError(loss)

    def loss_grad_logits(x_adv):
        def total(xi):
            lg = logits_fn(variables, xi)
            return loss_fn(lg).sum(), lg

        if eot_iter == 1:
            (_, lg), g = jax.value_and_grad(total, has_aux=True)(x_adv)
            return loss_fn(lg), g, lg

        def body(i, acc):
            return acc + jax.grad(total, has_aux=True)(x_adv)[0]

        g = jax.lax.fori_loop(0, eot_iter, body, jnp.zeros_like(x_adv))
        lg = logits_fn(variables, x_adv)
        return loss_fn(lg), g / eot_iter, lg

    # --- init (reference autopgd_base.py:221-224, 302-313) ---
    if x_init is None:
        t = jax.random.normal(key, x.shape, x.dtype)
        x_adv = l1_ball_box_projection(x, x + t, eps)
        topk = jnp.full((b,), 0.2, jnp.float32)
        sp_old = jnp.full((b,), float(D), jnp.float32)
    else:
        x_adv = l1_ball_box_projection(x, x_init, eps)
        sp_old = _l0_norm(x_adv - x)
        topk = sp_old / D / 1.5

    f0, g0, lg0 = loss_grad_logits(x_adv)
    fooled0 = jnp.argmax(lg0, 1) != labels
    alpha = 1.0  # L1 step-size multiplier (autopgd_base.py:296)
    k_adapt = max(int(0.04 * n_iter), 1)

    carry = dict(
        x_adv=x_adv,
        grad=g0,
        x_best=x_adv,
        grad_best=g0,
        f_best=f0,
        step=jnp.full((b,), alpha * eps, x.dtype),
        topk=topk,
        sp_old=sp_old,
        x_fooled=x_adv,
        ever_fooled=fooled0,
    )

    def body(i, carry):
        # sparse top-k step on the carried gradient
        gflat = jnp.abs(_margin_flat(carry["grad"]))
        order = jnp.sort(gflat, axis=1)  # ascending
        idx = jnp.clip(((1.0 - carry["topk"]) * D).astype(jnp.int32), 0, D - 1)
        thr = jnp.take_along_axis(order, idx[:, None], axis=1)
        sparse = carry["grad"] * (gflat >= thr).reshape(x.shape).astype(x.dtype)
        sgn = jnp.sign(sparse)
        denom = _margin_flat(jnp.abs(sgn)).sum(1) + 1e-10
        x_adv = carry["x_adv"] + (
            carry["step"] / denom
        ).reshape((-1,) + ndim_tail) * sgn
        x_adv = l1_ball_box_projection(x, x_adv, eps)

        f, g, lg = loss_grad_logits(x_adv)
        wrong = jnp.argmax(lg, 1) != labels
        x_fooled = jnp.where(
            wrong.reshape((-1,) + ndim_tail), x_adv, carry["x_fooled"]
        )
        improved = f > carry["f_best"]
        imp_t = improved.reshape((-1,) + ndim_tail)
        x_best = jnp.where(imp_t, x_adv, carry["x_best"])
        grad_best = jnp.where(imp_t, g, carry["grad_best"])
        f_best = jnp.maximum(f, carry["f_best"])

        # sparsity/step adaptation every k_adapt iterations
        is_adapt = ((i + 1) % k_adapt) == 0
        sp_curr = _l0_norm(x_best - x)
        fl_red = (sp_curr / carry["sp_old"]) < 0.95
        step_new = jnp.clip(
            jnp.where(fl_red, alpha * eps, carry["step"] / 1.5),
            alpha * eps / 10.0,
            alpha * eps,
        )
        restart = (is_adapt & fl_red).reshape((-1,) + ndim_tail)
        return dict(
            x_adv=jnp.where(restart, x_best, x_adv),
            grad=jnp.where(restart, grad_best, g),
            x_best=x_best,
            grad_best=grad_best,
            f_best=f_best,
            step=jnp.where(is_adapt, step_new, carry["step"]),
            topk=jnp.where(is_adapt, sp_curr / D / 1.5, carry["topk"]),
            sp_old=jnp.where(is_adapt, sp_curr, carry["sp_old"]),
            x_fooled=x_fooled,
            ever_fooled=carry["ever_fooled"] | wrong,
        )

    carry = jax.lax.fori_loop(0, n_iter, body, carry)
    return (
        carry["x_best"],
        carry["f_best"],
        carry["x_fooled"],
        carry["ever_fooled"],
    )


def apgd_attack_largereps(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    loss: str = "ce",
    n_iter: int = 100,
    targets: jax.Array | None = None,
    eot_iter: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """L1-APGD with the reference's ``use_largereps`` schedule.

    Three warm-started phases at shrinking radii 3ε → 2ε → ε with the
    iteration budget split 0.3/0.3/0.4 (reference autopgd_base.py:489-494,
    549-569). Each phase starts from the previous phase's best point
    projected into the smaller ball; the initial point is x + N(0,1)
    projected into the 3ε ball (decr_eps_pgd use_rs). The reference's
    `standard` AutoAttack version enables this for L1
    (autoattack.py:258-262). Returns (x_adv, f_best) at the target radius,
    with fooled samples carrying their adversarial point.
    """
    import math

    epss = [3.0 * eps, 2.0 * eps, 1.0 * eps]
    iters = [math.ceil(0.3 * n_iter), math.ceil(0.3 * n_iter)]
    iters.append(max(n_iter - sum(iters), 1))

    x_warm = x + jax.random.normal(key, x.shape, x.dtype)
    f_best = x_fooled = fooled = None
    for eps_i, niter in zip(epss, iters):
        key, sub = jax.random.split(key)
        x_warm, f_best, x_fooled, fooled = apgd_attack_l1(
            logits_fn, variables, x, labels, sub,
            eps=eps_i, loss=loss, n_iter=niter,
            targets=targets, eot_iter=eot_iter, x_init=x_warm,
        )
    # last phase ran at the target ε: prefer its misclassified points
    tail = (1,) * (x.ndim - 1)
    return jnp.where(fooled.reshape((-1,) + tail), x_fooled, x_warm), f_best
