"""Whole-block DenseNet Pallas kernel vs the XLA reference and the flax
module (robustart_tpu/ops/pallas_densenet.py, models/densenet.py mirror).
CPU via the TPU-semantics interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.pallas_densenet import (
    dense_block_pallas,
    dense_block_reference,
)


def _packed(c0, growth, n_layers, mid, seed=0):
    rng = np.random.default_rng(seed)
    s = sum(c0 + li * growth for li in range(n_layers))
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, (1, s)), jnp.float32)
    b1 = jnp.asarray(rng.normal(0, 0.1, (1, s)), jnp.float32)
    w1 = jnp.asarray(rng.normal(0, 0.05, (s, mid)), jnp.float32)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, (n_layers, mid)), jnp.float32)
    b2 = jnp.asarray(rng.normal(0, 0.1, (n_layers, mid)), jnp.float32)
    w2 = jnp.asarray(
        rng.normal(0, 0.05, (n_layers * 9 * mid, growth)), jnp.float32
    )
    return g1, b1, w1, g2, b2, w2


@pytest.mark.parametrize("b,h,w,c0,n_layers", [
    (2, 8, 8, 64, 3),   # ipb = 8 path (h*w = 64)
    (1, 16, 16, 32, 2),  # ipb = 2 path
    (2, 28, 28, 64, 2),  # ipb = 1 path
])
def test_block_matches_reference(b, h, w, c0, n_layers):
    growth, mid = 32, 128
    g1, b1, w1, g2, b2, w2 = _packed(c0, growth, n_layers, mid)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (b, h, w, c0)), jnp.float32)
    ref = dense_block_reference(x, g1, b1, w1, g2, b2, w2, c0=c0,
                                growth=growth, n_layers=n_layers, mid=mid)
    got = dense_block_pallas(x, g1, b1, w1, g2, b2, w2, c0=c0, growth=growth,
                             n_layers=n_layers, mid=mid, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_block_gradients():
    growth, mid, c0, n_layers = 32, 128, 32, 2
    g1, b1, w1, g2, b2, w2 = _packed(c0, growth, n_layers, mid, seed=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 8, c0)), jnp.float32)

    def loss(fn, *args):
        out = fn(*args)
        return jnp.sum(out * jnp.sin(out))

    kw = dict(c0=c0, growth=growth, n_layers=n_layers, mid=mid)
    gp = jax.grad(
        lambda *a: loss(
            lambda *z: dense_block_pallas(*z, interpret=True, **kw), *a
        ),
        argnums=tuple(range(7)),
    )(x, g1, b1, w1, g2, b2, w2)
    gr = jax.grad(
        lambda *a: loss(lambda *z: dense_block_reference(*z, **kw), *a),
        argnums=tuple(range(7)),
    )(x, g1, b1, w1, g2, b2, w2)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_fused_eval_forward_matches_module():
    """Full densenet121 mirror (stem/blocks/transitions/head from the
    variables tree) == flax module forward (models/densenet.py)."""
    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.densenet import fused_eval_forward

    clf = create_classifier("densenet121", rng=0, input_size=64)
    # jitter BN stats so folding is non-trivial
    rng = np.random.default_rng(4)

    def jitter(path, leaf):
        key = "/".join(str(p.key) for p in path)
        if key.endswith("mean"):
            return leaf + jnp.asarray(rng.normal(0, 0.1, leaf.shape), leaf.dtype)
        if key.endswith("var"):
            return leaf * jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
        return leaf

    stats = jax.tree_util.tree_map_with_path(
        jitter, clf.variables["batch_stats"]
    )
    clf.variables = {"params": clf.variables["params"], "batch_stats": stats}

    x01 = jnp.asarray(rng.uniform(0, 1, (2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got = np.asarray(fused_eval_forward(
        clf.module, clf.variables,
        normalize_01(x01, clf.mean, clf.std), interpret=True,
    ))
    assert got.shape == ref.shape
    np.testing.assert_allclose(
        got, ref, rtol=2e-3, atol=1e-5 * np.abs(ref).max()
    )
