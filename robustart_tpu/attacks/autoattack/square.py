"""Square Attack — black-box random-search attack with square perturbations.

TPU-native re-implementation of the Square attack of AutoAttack (vendored in
the reference at RobustART/noise/utils/adv/Attacks/autoattack/square.py:20-601;
algorithm: Andriushchenko et al., "Square Attack: a query-efficient black-box
adversarial attack via random search", ECCV 2020).

XLA design: the 5000-query loop is a ``lax.fori_loop`` whose body proposes
one random square per sample (vectorized via masked index arithmetic — no
dynamic shapes), evaluates the whole batch in one forward, and accepts
per-sample where the margin loss decreased. Already-successful samples keep
their perturbation (masked out of updates) — the reference's shrinking
worklist expressed as masking (SURVEY.md §7 hard-part #2).

Linf, L2 and L1 versions (matching the reference's three norm branches,
square.py:130-179 eta construction, :409-483 L1 loop).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

LogitsFn = Callable[[Any, jax.Array], jax.Array]


def p_selection(p_init: float, it: int, n_iters: int) -> float:
    """Piecewise p schedule (paper schedule, square.py p_selection)."""
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


def margin_and_ce(logits: jax.Array, labels: jax.Array):
    """margin = z_y - max_{k≠y} z_k (negative ⇔ misclassified)."""
    z_y = jnp.take_along_axis(logits, labels[:, None], axis=1)[:, 0]
    masked = logits.at[jnp.arange(logits.shape[0]), labels].set(-jnp.inf)
    margin = z_y - masked.max(axis=1)
    logp = jax.nn.log_softmax(logits)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return margin, ce


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "n_queries", "p_init")
)
def square_attack_linf(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
) -> jax.Array:
    """Returns x_adv (best found; equals a perturbed x even when unsuccessful)."""
    b, h, w, c = x.shape

    # init: vertical stripes of ±eps (paper init)
    k0, key = jax.random.split(key)
    stripes = (
        jax.random.rademacher(k0, (b, 1, w, c), dtype=jnp.int32).astype(x.dtype)
        * eps
    )
    x_adv = jnp.clip(x + stripes, 0.0, 1.0)
    logits = logits_fn(variables, x_adv)
    margin, loss = margin_and_ce(logits, labels)

    # static per-iteration square sizes
    sizes = np.zeros(n_queries, np.int32)
    for it in range(n_queries):
        p = p_selection(p_init, it, n_queries)
        s = int(round(np.sqrt(p * h * w / c)))
        sizes[it] = max(min(s, h - 1), 1)
    sizes = jnp.asarray(sizes)

    rows = jnp.arange(h).reshape(1, h, 1, 1)
    cols = jnp.arange(w).reshape(1, 1, w, 1)

    def body(it, carry):
        x_adv, margin, loss, key = carry
        key, k1, k2, k3 = jax.random.split(key, 4)
        s = sizes[it]
        vh = jax.random.randint(k1, (b, 1, 1, 1), 0, h - s + 1)
        vw = jax.random.randint(k2, (b, 1, 1, 1), 0, w - s + 1)
        new_vals = (
            jax.random.rademacher(k3, (b, 1, 1, c), dtype=jnp.int32).astype(x.dtype)
            * eps
        )
        in_square = (
            (rows >= vh) & (rows < vh + s) & (cols >= vw) & (cols < vw + s)
        )
        delta = x_adv - x
        cand_delta = jnp.where(in_square, new_vals, delta)
        x_cand = jnp.clip(x + jnp.clip(cand_delta, -eps, eps), 0.0, 1.0)

        logits = logits_fn(variables, x_cand)
        margin_c, loss_c = margin_and_ce(logits, labels)
        # accept where the margin loss decreased AND not already successful
        # (random search minimizes margin = z_y - max_other, square.py:loss)
        accept = (margin_c < margin) & (margin > 0)
        accept_t = accept.reshape(-1, 1, 1, 1)
        x_adv = jnp.where(accept_t, x_cand, x_adv)
        margin = jnp.where(accept, margin_c, margin)
        loss = jnp.where(accept, loss_c, loss)
        return x_adv, margin, loss, key

    x_adv, margin, loss, _ = jax.lax.fori_loop(
        0, n_queries, body, (x_adv, margin, loss, key)
    )
    return x_adv


def _eta_pyramid(s: int) -> np.ndarray:
    """The L2 'pyramid' bump η^(s): mass concentrated at the window center
    (square.py eta construction), L2-normalized."""
    center = (s - 1) / 2.0
    yy, xx = np.mgrid[0:s, 0:s]
    dist = np.maximum(np.abs(yy - center), np.abs(xx - center))
    eta = 1.0 / (dist + 1.0)
    return (eta / np.sqrt((eta**2).sum())).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "n_queries", "p_init")
)
def square_attack_l2(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
) -> jax.Array:
    """Square attack, L2 norm — single-window budget-recycling variant.

    Faithful to the paper's core mechanics (pyramidal η bump placed in a
    random square, perturbation renormalized to the ε sphere, margin-loss
    acceptance); the reference's two-window mass-transfer refinement
    (square.py L2 branch) improves query efficiency but not attack validity
    and is left for a later round.
    """
    b, h, w, c = x.shape

    def renorm(delta):
        n = jnp.sqrt(jnp.sum(delta.reshape(b, -1) ** 2, 1) + 1e-12)
        return delta * (eps / n).reshape(b, 1, 1, 1)

    k0, key = jax.random.split(key)
    init = jax.random.normal(k0, x.shape, x.dtype)
    x_adv = jnp.clip(x + renorm(init), 0.0, 1.0)
    logits = logits_fn(variables, x_adv)
    margin, loss = margin_and_ce(logits, labels)

    sizes = np.zeros(n_queries, np.int32)
    for it in range(n_queries):
        p = p_selection(p_init, it, n_queries)
        s = int(round(np.sqrt(p * h * w / c)))
        sizes[it] = max(min(s, h - 1), 3)
    uniq = sorted(set(sizes.tolist()))
    etas = {s: jnp.asarray(np.pad(_eta_pyramid(s), ((0, h - s), (0, w - s))))
            for s in uniq}
    eta_bank = jnp.stack([etas[s] for s in uniq])  # (U, h, w) top-left bumps
    size_to_bank = np.array([uniq.index(s) for s in sizes], np.int32)
    sizes_j = jnp.asarray(sizes)
    bank_idx = jnp.asarray(size_to_bank)

    rows = jnp.arange(h).reshape(1, h, 1, 1)
    cols = jnp.arange(w).reshape(1, 1, w, 1)

    def body(it, carry):
        x_adv, margin, loss, key = carry
        key, k1, k2, k3, k4 = jax.random.split(key, 5)
        s = sizes_j[it]
        eta = eta_bank[bank_idx[it]]  # (h, w), bump at top-left s×s
        vh = jax.random.randint(k1, (b,), 0, h - s + 1)
        vw = jax.random.randint(k2, (b,), 0, w - s + 1)
        # roll the top-left bump to each sample's window position
        eta_b = jnp.broadcast_to(eta, (b, h, w))
        eta_b = jax.vmap(lambda e, dy, dx: jnp.roll(e, (dy, dx), (0, 1)))(
            eta_b, vh, vw
        )[..., None]
        in_square = (
            (rows >= vh.reshape(-1, 1, 1, 1))
            & (rows < (vh + s).reshape(-1, 1, 1, 1))
            & (cols >= vw.reshape(-1, 1, 1, 1))
            & (cols < (vw + s).reshape(-1, 1, 1, 1))
        )
        sign = jax.random.rademacher(k3, (b, 1, 1, c), dtype=jnp.int32).astype(x.dtype)
        delta = x_adv - x
        # available budget = global leftover + the window's current mass
        win_mass = jnp.sum((delta * in_square) ** 2, axis=(1, 2, 3))
        total = jnp.sum(delta.reshape(b, -1) ** 2, 1)
        avail = jnp.sqrt(jnp.maximum(eps**2 - total + win_mass, 1e-12))
        new_win = sign * eta_b * avail.reshape(-1, 1, 1, 1)
        cand_delta = jnp.where(in_square, new_win, delta)
        x_cand = jnp.clip(x + renorm(cand_delta), 0.0, 1.0)

        logits = logits_fn(variables, x_cand)
        margin_c, loss_c = margin_and_ce(logits, labels)
        accept = (margin_c < margin) & (margin > 0)
        accept_t = accept.reshape(-1, 1, 1, 1)
        x_adv = jnp.where(accept_t, x_cand, x_adv)
        margin = jnp.where(accept, margin_c, margin)
        loss = jnp.where(accept, loss_c, loss)
        return x_adv, margin, loss, key

    x_adv, margin, loss, _ = jax.lax.fori_loop(
        0, n_queries, body, (x_adv, margin, loss, key)
    )
    return x_adv


# ---------------------------------------------------------------------------
# Square-L1
# ---------------------------------------------------------------------------

def _eta_rectangles_l1(xd: int, yd: int) -> np.ndarray:
    """Nested-rectangle bump, L1 flavor: increments 1/(counter+1)^4,
    normalized to unit L1 mass (reference square.py:143-171, L1 branch)."""
    delta = np.zeros((xd, yd), np.float64)
    x_c, y_c = xd // 2 + 1, yd // 2 + 1
    c2 = [x_c - 1, y_c - 1]
    for counter in range(max(x_c, y_c)):
        delta[
            max(c2[0], 0) : min(c2[0] + 2 * counter + 1, xd),
            max(0, c2[1]) : min(c2[1] + 2 * counter + 1, yd),
        ] += 1.0 / (counter + 1) ** 4
        c2[0] -= 1
        c2[1] -= 1
    return delta / np.abs(delta).sum()


def _eta_l1(s: int) -> np.ndarray:
    """η^(s) for L1: +bump on the top half, −bump on the bottom, unit L1
    (reference square.py:173-186; the per-call random transpose is applied
    per-sample in the loop body instead)."""
    delta = np.zeros((s, s), np.float64)
    delta[: s // 2] = _eta_rectangles_l1(s // 2, s)
    delta[s // 2 :] = -_eta_rectangles_l1(s - s // 2, s)
    return (delta / np.abs(delta).sum()).astype(np.float32)


@functools.partial(
    jax.jit, static_argnames=("logits_fn", "n_queries", "p_init")
)
def square_attack_l1(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float,
    n_queries: int = 5000,
    p_init: float = 0.8,
) -> jax.Array:
    """Square attack, L1 norm (reference square.py:409-483).

    Mechanics kept from the reference: 5×5 η-tile init projected into the
    L1 ball; per query, mass is moved from a second random window into the
    first, where a fresh η bump is blended with the (L1-normalized) old
    window content; budget = leftover ε-mass + the two windows' mass; the
    whole perturbation is re-projected onto the L1 ball ∩ box via the
    bisection projection (shared with APGD-L1). Windows and the η transpose
    are drawn per-sample (the reference draws one per batch — a
    vectorization-friendly strengthening, same query budget).
    """
    from robustart_tpu.attacks.autoattack.apgd import l1_ball_box_projection

    b, h, w, c = x.shape
    n_features = h * w * c
    eps_eff = eps * (1.0 - 1e-6)

    # --- init: 5×5 grid of η tiles with per-(sample,cell,channel) signs
    # (reference square.py:409-425)
    s0 = max(h // 5, 2)
    sp_init = (h - s0 * 5) // 2
    placements = []
    for gy in range(h // s0):
        for gx in range(w // s0):
            tile = np.zeros((h, w), np.float32)
            vh0, vw0 = sp_init + gy * s0, sp_init + gx * s0
            if vh0 + s0 <= h and vw0 + s0 <= w and vh0 >= 0 and vw0 >= 0:
                tile[vh0 : vh0 + s0, vw0 : vw0 + s0] = _eta_l1(s0)
            placements.append(tile)
    placement = jnp.asarray(np.stack(placements))  # (K, h, w)

    k0, key = jax.random.split(key)
    signs0 = jax.random.rademacher(
        k0, (b, placement.shape[0], c), dtype=jnp.int32
    ).astype(x.dtype)
    delta_init = jnp.einsum("khw,bkc->bhwc", placement, signs0)
    x_adv = l1_ball_box_projection(x, x + delta_init, eps_eff)
    logits = logits_fn(variables, x_adv)
    margin, loss = margin_and_ce(logits, labels)

    # --- static per-iteration square sizes (odd, ≥3; square.py:444-448)
    sizes = np.zeros(n_queries, np.int32)
    for it in range(n_queries):
        p = p_selection(p_init, it, n_queries)
        s = max(int(round(np.sqrt(p * n_features / c))), 3)
        if s % 2 == 0:
            s += 1
        sizes[it] = min(s, h - 1)
    uniq = sorted(set(sizes.tolist()))
    eta_bank = jnp.stack(
        [jnp.asarray(np.pad(_eta_l1(s), ((0, h - s), (0, w - s)))) for s in uniq]
    )  # (U, h, w) bumps at top-left
    bank_idx = jnp.asarray(np.array([uniq.index(s) for s in sizes], np.int32))
    sizes_j = jnp.asarray(sizes)

    rows = jnp.arange(h).reshape(1, h, 1, 1)
    cols = jnp.arange(w).reshape(1, 1, w, 1)

    def window_mask(vh, vw, s):
        return (
            (rows >= vh.reshape(-1, 1, 1, 1))
            & (rows < (vh + s).reshape(-1, 1, 1, 1))
            & (cols >= vw.reshape(-1, 1, 1, 1))
            & (cols < (vw + s).reshape(-1, 1, 1, 1))
        )

    def body(it, carry):
        x_adv, margin, loss, key = carry
        key, k1, k2, k3, k4, k5, k6 = jax.random.split(key, 7)
        s = sizes_j[it]
        eta = eta_bank[bank_idx[it]]  # (h, w), top-left
        # per-sample random transpose of η (reference eta(), square.py:186-188)
        flip = jax.random.bernoulli(k6, 0.5, (b,))
        eta_b = jnp.where(
            flip.reshape(-1, 1, 1), eta.T[None], eta[None]
        )  # (b, h, w)
        vh = jax.random.randint(k1, (b,), 0, h - s)
        vw = jax.random.randint(k2, (b,), 0, w - s)
        vh2 = jax.random.randint(k3, (b,), 0, h - s)
        vw2 = jax.random.randint(k4, (b,), 0, w - s)
        in1 = window_mask(vh, vw, s)
        in2 = window_mask(vh2, vw2, s)

        eta_pos = jax.vmap(lambda e, dy, dx: jnp.roll(e, (dy, dx), (0, 1)))(
            eta_b, vh, vw
        )[..., None]  # (b, h, w, 1)
        sign = jax.random.rademacher(k5, (b, 1, 1, c), dtype=jnp.int32).astype(
            x.dtype
        )

        delta = x_adv - x
        # per-channel L1 mass in window 1 / union (square.py:455-466)
        norms_window_1 = jnp.sum(
            jnp.abs(delta) * in1, axis=(1, 2), keepdims=True
        )  # (b,1,1,c)
        union = in1 | in2
        norms_windows = jnp.sum(
            jnp.abs(delta) * union, axis=(1, 2), keepdims=True
        )
        norms_image = jnp.sum(
            jnp.abs(delta), axis=(1, 2, 3), keepdims=True
        )  # (b,1,1,1)

        # fresh bump + direction of the old window content (square.py:467-474)
        old_dir = delta * in1 / (1e-12 + norms_window_1)
        new_win = eta_pos * sign + old_dir
        new_win_l1 = jnp.sum(jnp.abs(new_win) * in1, axis=(1, 2), keepdims=True)
        budget = (
            jnp.maximum(eps * jnp.ones_like(norms_image) - norms_image, 0.0) / c
            + norms_windows
        ) * c
        new_win = new_win / (1e-12 + new_win_l1) * budget

        cand_delta = jnp.where(in2, 0.0, delta)
        cand_delta = jnp.where(in1, new_win, cand_delta)
        x_cand = l1_ball_box_projection(x, x + cand_delta, eps_eff)

        logits = logits_fn(variables, x_cand)
        margin_c, loss_c = margin_and_ce(logits, labels)
        accept = (margin_c < margin) & (margin > 0)
        accept_t = accept.reshape(-1, 1, 1, 1)
        x_adv = jnp.where(accept_t, x_cand, x_adv)
        margin = jnp.where(accept, margin_c, margin)
        loss = jnp.where(accept, loss_c, loss)
        return x_adv, margin, loss, key

    x_adv, margin, loss, _ = jax.lax.fori_loop(
        0, n_queries, body, (x_adv, margin, loss, key)
    )
    return x_adv
