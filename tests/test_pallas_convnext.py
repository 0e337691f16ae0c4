"""Fused ConvNeXt dwconv7×7+LN Pallas kernel vs the XLA reference:
forward parity, gradients (input AND parameters), and module-level
equivalence. Runs on CPU via the TPU-semantics interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.pallas_convnext import (
    dwconv_ln_pallas,
    dwconv_ln_reference,
)


def _data(n=2, h=8, w=8, c=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), jnp.float32)
    wk = jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    gamma = jnp.asarray(1.0 + rng.standard_normal(c) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, wk, b, gamma, beta


@pytest.mark.parametrize("h,c", [(8, 128), (7, 256), (14, 512)])
def test_forward_matches_reference(h, c):
    x, wk, b, gamma, beta = _data(n=2, h=h, w=h, c=c)
    ref = dwconv_ln_reference(x, wk, b, gamma, beta)
    got = dwconv_ln_pallas(x, wk, b, gamma, beta, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_forward_bf16():
    x, wk, b, gamma, beta = _data(n=1, h=8, w=8, c=128, seed=1)
    xb = x.astype(jnp.bfloat16)
    ref = dwconv_ln_reference(xb, wk, b, gamma, beta)
    got = dwconv_ln_pallas(xb, wk, b, gamma, beta, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gradients_match_reference():
    """Input and parameter cotangents through the fused forward equal the
    XLA reference's (custom VJP recomputes via jax.vjp)."""
    x, wk, b, gamma, beta = _data(n=1, h=8, w=8, c=128, seed=2)

    def loss(f, *args):
        out = f(*args)
        return jnp.sum(out * jnp.cos(out))

    gp = jax.grad(
        lambda *a: loss(lambda *z: dwconv_ln_pallas(*z, interpret=True), *a),
        argnums=(0, 1, 2, 3, 4),
    )(x, wk, b, gamma, beta)
    gr = jax.grad(
        lambda *a: loss(dwconv_ln_reference, *a), argnums=(0, 1, 2, 3, 4)
    )(x, wk, b, gamma, beta)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_convnext_module_pallas_matches_xla():
    """Module-level equivalence: tiny ConvNeXt with block_impl pallas
    (interpreted) vs xla, same params."""
    import robustart_tpu.models.convnext as cm

    module = cm.ConvNeXt(depths=(1, 1), dims=(32, 64), num_classes=10)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)

    ref = module.clone(block_impl="xla").apply(variables, x, train=False)
    orig = cm.dwconv_ln_pallas

    def interp(*args, interpret=False):
        return orig(*args, interpret=True)

    cm.dwconv_ln_pallas = interp
    try:
        got = module.clone(block_impl="pallas").apply(variables, x,
                                                      train=False)
    finally:
        cm.dwconv_ln_pallas = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_convnext_module_fused_mlp_matches_xla():
    """Fused-MLP path (mlp_impl pallas, interpreted) == xla path, incl.
    layer-scale + residual epilogue."""
    import robustart_tpu.models.convnext as cm

    module = cm.ConvNeXt(depths=(1, 1), dims=(32, 64), num_classes=10)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)

    ref = module.clone(mlp_impl="xla").apply(variables, x, train=False)
    orig = cm.mlp_pallas

    def interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    cm.mlp_pallas = interp
    try:
        got = module.clone(mlp_impl="pallas").apply(variables, x,
                                                    train=False)
    finally:
        cm.mlp_pallas = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_param_tree_unchanged():
    """The fused-path refactor must not change the checkpoint tree: dwconv
    kernel (7,7,1,C)+bias and norm scale/bias survive under the same names
    (converter contract, models/torch_convert.py ConvNeXt rules)."""
    from robustart_tpu.models.convnext import ConvNeXtBlock

    block = ConvNeXtBlock(32)
    v = block.init(jax.random.key(0), jnp.zeros((1, 8, 8, 32)))
    p = v["params"]
    assert p["dwconv"]["kernel"].shape == (7, 7, 1, 32)
    assert p["dwconv"]["bias"].shape == (32,)
    assert p["norm"]["scale"].shape == (32,)
    assert p["norm"]["bias"].shape == (32,)
    assert set(p) == {"dwconv", "norm", "pwconv1", "pwconv2", "gamma"}
