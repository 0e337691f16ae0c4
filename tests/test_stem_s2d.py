"""Space-to-depth ResNet stem == plain 7x7/2 stem (values and gradients).

stem_s2d (models/resnet.py::ResNet._stem) rewrites the 7x7 stride-2 stem
as a 4x4 stride-1 conv on a (H/2, W/2, 12) space-to-depth input — the
MLPerf TPU trick that quadruples stem MXU-lane utilization and, in the
backward pass, replaces the input-dilated stride-2 dgrad with a stride-1
one. The window pad is the symmetric (2,2) form with a static output
slice (the exact (2,1) attribute trips this XLA TPU build's
fusion-emitter assert in multi-forward programs). Same parameter tree —
checkpoints convert unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models.resnet import Bottleneck, ResNet


def _pair(h=64, w=64):
    plain = ResNet(block=Bottleneck, stage_sizes=[1, 1, 1, 1],
                   num_classes=10, stem_s2d=False)
    s2d = ResNet(block=Bottleneck, stage_sizes=[1, 1, 1, 1],
                 num_classes=10, stem_s2d=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, h, w, 3)), jnp.float32)
    variables = plain.init(jax.random.key(0), x, train=False)
    return plain, s2d, variables, x


def test_same_param_tree():
    plain, s2d, variables, x = _pair()
    v2 = s2d.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    assert (variables["params"]["conv1_kernel"].shape
            == v2["params"]["conv1_kernel"].shape == (7, 7, 3, 64))


def test_forward_equivalent():
    plain, s2d, variables, x = _pair()
    want = np.asarray(jax.jit(
        lambda v, x: plain.apply(v, x, train=False))(variables, x))
    got = np.asarray(jax.jit(
        lambda v, x: s2d.apply(v, x, train=False))(variables, x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_input_gradient_equivalent():
    """The dgrad path the rewrite exists for: same dL/dx either way."""
    plain, s2d, variables, x = _pair(32, 32)

    def loss(model):
        def f(xx):
            out = model.apply(variables, xx, train=False)
            return jnp.sum(out * out)
        return f

    gw = np.asarray(jax.jit(jax.grad(loss(plain)))(x))
    gg = np.asarray(jax.jit(jax.grad(loss(s2d)))(x))
    np.testing.assert_allclose(
        gg, gw, rtol=5e-3, atol=5e-4 * max(1.0, np.abs(gw).max()))


def test_odd_size_falls_back():
    """Odd spatial sizes can't space-to-depth — the plain conv runs."""
    plain, s2d, variables, _ = _pair()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (1, 63, 63, 3)), jnp.float32)
    want = np.asarray(plain.apply(variables, x, train=False))
    got = np.asarray(s2d.apply(variables, x, train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("train", [False, True])
def test_full_model_grad_compiles(train):
    """value_and_grad through the s2d stem traces and compiles on CPU."""
    plain, s2d, variables, x = _pair(32, 32)

    def loss_fn(v):
        out = s2d.apply(v, x, train=train,
                        mutable=["batch_stats"] if train else False)
        logits = out[0] if train else out
        return jnp.mean(logits ** 2)

    l, g = jax.jit(jax.value_and_grad(loss_fn))(variables)
    assert np.isfinite(float(l))
    assert np.isfinite(float(jnp.sum(g["params"]["conv1_kernel"])))
