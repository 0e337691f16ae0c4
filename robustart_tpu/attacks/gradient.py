"""White-box gradient attacks: FGSM, PGD-{Linf,L2,L1}, MIM.

TPU-native re-implementation of the reference's attack wrappers
(reference RobustART/noise/utils/adv/attack.py:20-52 — foolbox PGD/FGSM, ART
PGD-L1, local MIM at Attacks/imfgsm_attack.py:62-93). Instead of wrapping
GPU libraries, every attack here is a pure function

    attack(logits_fn, variables, x01, labels, key, **hyper) -> x_adv

with the step loop expressed as ``lax.fori_loop`` so the whole
forward+backward chain jit-compiles into one XLA program. Inputs/outputs are
NHWC images in [0,1]; the classifier normalizes internally
(robustart_tpu.models.classifier). Default hyperparameters replicate the
reference registry (reference RobustART/noise/utils/add_noise_utils.py:9-18).

Semantics matched to the reference backends:

- ``fgsm``      = foolbox LinfFastGradientAttack: one signed-gradient step of
  size eps, clip to [0,1].
- ``pgd_linf``  = foolbox LinfProjectedGradientDescentAttack: uniform random
  start in the eps-ball, ``steps`` signed steps of ``rel_stepsize*eps``,
  project to the Linf ball then [0,1].
- ``pgd_l2``    = foolbox L2ProjectedGradientDescentAttack: random start
  uniform in the L2 ball, normalized-gradient steps, L2-ball projection.
- ``pgd_l1``    = ART ProjectedGradientDescentPyTorch(norm=1,
  num_random_init=1): L1-normalized gradient steps, rescale-projection onto
  the L1 ball (ART ``projection``), clip [0,1].
- ``mim_linf``  = reference ``_mim_whitebox``: mean-abs-normalized gradient,
  momentum accumulation, signed steps, Linf clamp (random start is NOT
  clipped to [0,1] before the first step, faithfully to the reference).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

LogitsFn = Callable[[Any, jax.Array], jax.Array]


def _ce_grad(logits_fn: LogitsFn, variables: Any, x: jax.Array, labels: jax.Array):
    """d/dx of mean cross-entropy. One fused forward+backward under jit."""

    def loss(img):
        logits = logits_fn(variables, img)
        return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()

    return jax.grad(loss)(x)


def _flat_sum(v: jax.Array, ord_fn) -> jax.Array:
    """Per-sample reduction over all non-batch axes, keepdims for broadcast."""
    return ord_fn(v, axis=tuple(range(1, v.ndim)), keepdims=True)


def _l2_norm(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return jnp.sqrt(_flat_sum(jnp.square(v), jnp.sum) + eps)


def _l1_norm(v: jax.Array, eps: float = 1e-12) -> jax.Array:
    return _flat_sum(jnp.abs(v), jnp.sum) + eps


def _uniform_l2_ball(key: jax.Array, shape, dtype) -> jax.Array:
    """Uniform sample from the unit L2 ball (normal direction, radius^(1/d))."""
    k1, k2 = jax.random.split(key)
    direction = jax.random.normal(k1, shape, dtype)
    direction = direction / _l2_norm(direction)
    d = 1
    for s in shape[1:]:
        d *= s
    radius = jax.random.uniform(k2, (shape[0],) + (1,) * (len(shape) - 1), dtype)
    return direction * radius ** (1.0 / d)


def _uniform_l1_ball(key: jax.Array, shape, dtype) -> jax.Array:
    """Approximately uniform sample from the unit L1 ball.

    Exponential-sign construction (matches ART ``random_sphere(norm=1)``):
    draw e_i ~ Exp(1) with random signs, normalize by the L1 norm, scale by
    U^(1/d).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    mag = jax.random.exponential(k1, shape, dtype)
    sign = jnp.sign(jax.random.uniform(k2, shape, dtype) - 0.5)
    v = mag * sign
    v = v / _l1_norm(v)
    d = 1
    for s in shape[1:]:
        d *= s
    radius = jax.random.uniform(k3, (shape[0],) + (1,) * (len(shape) - 1), dtype)
    return v * radius ** (1.0 / d)


# ---------------------------------------------------------------------------
# Attacks
# ---------------------------------------------------------------------------


def fgsm(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array | None = None,
    *,
    eps: float = 8 / 255,
) -> jax.Array:
    grad = _ce_grad(logits_fn, variables, x, labels)
    return jnp.clip(x + eps * jnp.sign(grad), 0.0, 1.0)


def pgd_linf(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float = 8 / 255,
    rel_stepsize: float = 3 / 40,
    steps: int = 20,
    random_start: bool = True,
) -> jax.Array:
    stepsize = rel_stepsize * eps
    if random_start:
        delta = jax.random.uniform(key, x.shape, x.dtype, -eps, eps)
        x_adv = jnp.clip(x + delta, 0.0, 1.0)
    else:
        x_adv = x

    def body(_, x_adv):
        grad = _ce_grad(logits_fn, variables, x_adv, labels)
        x_adv = x_adv + stepsize * jnp.sign(grad)
        x_adv = jnp.clip(x_adv, x - eps, x + eps)
        return jnp.clip(x_adv, 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, x_adv)


def pgd_l2(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float = 8.0,
    rel_stepsize: float = 3 / 40,
    steps: int = 20,
    random_start: bool = True,
) -> jax.Array:
    stepsize = rel_stepsize * eps
    if random_start:
        x_adv = jnp.clip(x + eps * _uniform_l2_ball(key, x.shape, x.dtype), 0.0, 1.0)
    else:
        x_adv = x

    def project(x_adv):
        delta = x_adv - x
        norm = _l2_norm(delta)
        factor = jnp.minimum(1.0, eps / norm)
        return x + delta * factor

    def body(_, x_adv):
        grad = _ce_grad(logits_fn, variables, x_adv, labels)
        grad = grad / _l2_norm(grad)
        x_adv = x_adv + stepsize * grad
        return jnp.clip(project(x_adv), 0.0, 1.0)

    return jax.lax.fori_loop(0, steps, body, x_adv)


def pgd_l1(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float = 1600.0,
    eps_step: float = 120.0,
    max_iter: int = 20,
    num_random_init: int = 1,
    input_size: int | None = None,  # accepted for reference-config parity
    batch_size: int | None = None,
) -> jax.Array:
    """ART-style PGD with L1 gradient normalization and rescale projection."""
    del input_size, batch_size

    def project_l1(x_adv):
        delta = x_adv - x
        norm = _l1_norm(delta)
        factor = jnp.minimum(1.0, eps / norm)
        return x + delta * factor

    if num_random_init > 0:
        x_adv = jnp.clip(x + eps * _uniform_l1_ball(key, x.shape, x.dtype), 0.0, 1.0)
    else:
        x_adv = x

    def body(_, x_adv):
        grad = _ce_grad(logits_fn, variables, x_adv, labels)
        # ART perturbation for norm=1: gradient scaled by its L1 norm
        grad = grad / _l1_norm(grad)
        x_adv = jnp.clip(x_adv + eps_step * grad, 0.0, 1.0)
        return jnp.clip(project_l1(x_adv), 0.0, 1.0)

    return jax.lax.fori_loop(0, max_iter, body, x_adv)


def mim_linf(
    logits_fn: LogitsFn,
    variables: Any,
    x: jax.Array,
    labels: jax.Array,
    key: jax.Array,
    *,
    eps: float = 8 / 255,
    num_steps: int = 20,
    step_size: float = 0.002,
    decay_factor: float = 1.0,
) -> jax.Array:
    """Momentum iterative FGSM (reference Attacks/imfgsm_attack.py:62-93)."""
    # reference adds uniform noise WITHOUT clipping to [0,1] before stepping
    x_adv = x + jax.random.uniform(key, x.shape, x.dtype, -eps, eps)
    momentum = jnp.zeros_like(x)

    def body(_, carry):
        x_adv, momentum = carry
        grad = _ce_grad(logits_fn, variables, x_adv, labels)
        grad = grad / _flat_sum(jnp.abs(grad), jnp.mean)
        momentum = decay_factor * momentum + grad
        x_adv = x_adv + step_size * jnp.sign(momentum)
        eta = jnp.clip(x_adv - x, -eps, eps)
        x_adv = jnp.clip(x + eta, 0.0, 1.0)
        return x_adv, momentum

    x_adv, _ = jax.lax.fori_loop(0, num_steps, body, (x_adv, momentum))
    return x_adv


def clip_l2_norm(cln_img: jax.Array, adv_img: jax.Array, eps: float) -> jax.Array:
    """Clip a perturbation to a global L2 budget (reference attack.py:10-17;
    note the reference clips the WHOLE tensor's norm, not per-sample)."""
    noise = adv_img - cln_img
    norm = jnp.sqrt(jnp.sum(noise**2))
    return jnp.where(norm > eps, cln_img + noise * eps / norm, adv_img)


# registry mirroring the reference's attack_list (attack.py:52)
ATTACKS: dict[str, Callable[..., jax.Array]] = {
    "fgsm": fgsm,
    "pgd_linf": pgd_linf,
    "pgd_l2": pgd_l2,
    "pgd_l1": pgd_l1,
    "mim_linf": mim_linf,
}
attack_list = ATTACKS  # reference alias (attack.py:52)


def make_attack_fn(
    name: str, logits_fn: LogitsFn, jit: bool = True, **config: Any
) -> Callable[[Any, jax.Array, jax.Array, jax.Array], jax.Array]:
    """Bind an attack to a model's logits_fn + config.

    Returns ``fn(variables, x01, labels, key) -> x_adv``, jitted end-to-end
    (donating the input image buffer — attack outputs replace inputs in HBM).
    """
    attack = ATTACKS[name]

    def fn(variables, x, labels, key):
        return attack(logits_fn, variables, x, labels, key, **config)

    if jit:
        fn = jax.jit(fn, donate_argnums=(1,))
    return fn
