"""Fused MLP Pallas kernel vs the XLA reference: forward (acts, gamma,
shortcut, F-chunking, row padding) and gradients. CPU via the
TPU-semantics interpreter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.pallas_mlp import mlp_pallas, mlp_reference


def _data(m=64, c=128, f=512, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((m, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((c, f)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(f) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((f, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


@pytest.mark.parametrize("act", ["gelu", "gelu_tanh", "quick_gelu", "relu"])
def test_forward_matches_reference(act):
    x, w1, b1, w2, b2 = _data()
    ref = mlp_reference(x, w1, b1, w2, b2, act=act)
    got = mlp_pallas(x, w1, b1, w2, b2, act=act, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_gamma_and_shortcut_epilogue():
    x, w1, b1, w2, b2 = _data(seed=1)
    rng = np.random.default_rng(2)
    gamma = jnp.asarray(rng.standard_normal(x.shape[1]) * 0.1, jnp.float32)
    short = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
    ref = mlp_reference(x, w1, b1, w2, b2, gamma, short)
    got = mlp_pallas(x, w1, b1, w2, b2, gamma, short, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_row_padding_and_3d_input():
    """M not divisible by the tile and leading batch dims."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 37, 128)), jnp.float32)
    _, w1, b1, w2, b2 = _data(seed=3)
    ref = mlp_reference(x.reshape(-1, 128), w1, b1, w2, b2).reshape(x.shape)
    got = mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_f_chunking_path():
    """F large enough to force >1 chunk (accumulation over grid dim)."""
    # force chunking by exceeding the 8 MB resident-pair budget:
    # 2*c*f*4B > 8MB with c=512, f=4096 → 16 MB → tf=2048, nf=2
    x, w1, b1, w2, b2 = _data(m=32, c=512, f=4096, seed=4)
    ref = mlp_reference(x, w1, b1, w2, b2)
    got = mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_gradients_match_reference():
    x, w1, b1, w2, b2 = _data(m=32, seed=5)
    rng = np.random.default_rng(5)
    gamma = jnp.asarray(1 + rng.standard_normal(x.shape[1]) * 0.1, jnp.float32)
    short = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def loss(fn, *args):
        out = fn(*args)
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(
        lambda *a: loss(
            lambda *z: mlp_pallas(*z, interpret=True), *a
        ),
        argnums=tuple(range(7)),
    )(x, w1, b1, w2, b2, gamma, short)
    gr = jax.grad(
        lambda *a: loss(mlp_reference, *a), argnums=tuple(range(7))
    )(x, w1, b1, w2, b2, gamma, short)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_bf16():
    x, w1, b1, w2, b2 = _data(seed=6, dtype=jnp.bfloat16)
    ref = mlp_reference(x, w1, b1, w2, b2)
    got = mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2,
    )


# ---------------------------------------------------------------------------
# token-mixing variant (MLP-Mixer): transpose-free token MLP
# ---------------------------------------------------------------------------


def _token_data(b=2, t=196, c=256, h=384, seed=7, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
    w1 = jnp.asarray(rng.standard_normal((t, h)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(h) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((h, t)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(t) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_token_mlp_reference_equals_swapaxes_oracle():
    from robustart_tpu.ops.pallas_mlp import token_mlp_reference

    x, w1, b1, w2, b2 = _token_data()
    y = jnp.swapaxes(x, 1, 2)
    hid = jax.nn.gelu(y @ w1 + b1, approximate=False)
    oracle = jnp.swapaxes(hid @ w2 + b2, 1, 2)
    got = token_mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=2e-5, atol=2e-5)


def test_token_mlp_forward_and_shortcut():
    from robustart_tpu.ops.pallas_mlp import (
        token_mlp_pallas,
        token_mlp_reference,
    )

    x, w1, b1, w2, b2 = _token_data(seed=8)
    short = jnp.asarray(
        np.random.default_rng(9).standard_normal(x.shape), jnp.float32
    )
    ref = token_mlp_reference(x, w1, b1, w2, b2, short)
    got = token_mlp_pallas(x, w1, b1, w2, b2, shortcut=short, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
    got2 = token_mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    ref2 = token_mlp_reference(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=3e-5, atol=3e-5)


def test_token_mlp_gradients():
    from robustart_tpu.ops.pallas_mlp import (
        token_mlp_pallas,
        token_mlp_reference,
    )

    x, w1, b1, w2, b2 = _token_data(b=1, c=128, seed=10)
    short = jnp.asarray(
        np.random.default_rng(11).standard_normal(x.shape), jnp.float32
    )

    def loss(fn, *args):
        out = fn(*args)
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(
        lambda *a: loss(
            lambda *z: token_mlp_pallas(
                z[0], z[1], z[2], z[3], z[4], shortcut=z[5], interpret=True
            ), *a
        ),
        argnums=tuple(range(6)),
    )(x, w1, b1, w2, b2, short)
    gr = jax.grad(
        lambda *a: loss(
            lambda *z: token_mlp_reference(z[0], z[1], z[2], z[3], z[4], z[5]),
            *a,
        ),
        argnums=tuple(range(6)),
    )(x, w1, b1, w2, b2, short)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_mixer_block_param_tree_and_forward_unchanged():
    """The transpose-free wiring keeps the exact param tree and (on CPU)
    bit-equal forward vs the explicit-swapaxes construction."""
    from robustart_tpu.models import create_classifier

    clf = create_classifier("mixer_b16_224", rng=0, input_size=224)
    p = clf.variables["params"]["block0"]
    assert set(p["mlp_tokens"]) == {"fc1", "fc2"}
    assert p["mlp_tokens"]["fc1"]["kernel"].shape == (196, 384)
    assert p["mlp_channels"]["fc1"]["kernel"].shape == (768, 3072)

    x = np.random.default_rng(0).uniform(0, 1, (1, 224, 224, 3)).astype(
        np.float32
    )
    logits = np.asarray(clf(x))
    assert np.isfinite(logits).all() and logits.shape == (1, 1000)


# ---------------------------------------------------------------------------
# in-kernel LayerNorm prologue + residual-of-input epilogue
# ---------------------------------------------------------------------------


def _ln_params(c, seed):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(1 + rng.standard_normal(c) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32))


def _ln_oracle(x, s, b, eps=1e-6):
    xf = np.asarray(x, np.float64)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return (xf - mu) / np.sqrt(var + eps) * np.asarray(s) + np.asarray(b)


def test_ln_prologue_forward():
    """LN runs inside the kernel on the pre-norm input; residual_input adds
    the raw x (models pass the SAME tensor for both roles)."""
    x, w1, b1, w2, b2 = _data(m=48, seed=12)
    lns, lnb = _ln_params(x.shape[1], 13)
    xn = jnp.asarray(_ln_oracle(x, lns, lnb), jnp.float32)
    oracle = mlp_reference(xn, w1, b1, w2, b2) + x
    got = mlp_pallas(x, w1, b1, w2, b2, ln=(lns, lnb), residual_input=True,
                     interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=3e-5, atol=3e-5)


def test_ln_prologue_gradients():
    """Input + LN-parameter gradients through the fused LN+MLP+residual
    match the composed reference (custom VJP)."""
    x, w1, b1, w2, b2 = _data(m=24, seed=14)
    lns, lnb = _ln_params(x.shape[1], 15)

    def loss_pallas(x, lns, lnb):
        out = mlp_pallas(x, w1, b1, w2, b2, ln=(lns, lnb),
                         residual_input=True, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(x, lns, lnb):
        from robustart_tpu.ops.pallas_mlp import _ln_f32

        xn = _ln_f32(x, lns, lnb, 1e-6).astype(x.dtype)
        out = mlp_reference(xn, w1, b1, w2, b2) + x
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, lns, lnb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, lns, lnb)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_token_mlp_ln_prologue_forward():
    from robustart_tpu.ops.pallas_mlp import (
        token_mlp_pallas,
        token_mlp_reference,
    )

    x, w1, b1, w2, b2 = _token_data(seed=16)
    lns, lnb = _ln_params(x.shape[2], 17)
    xn = jnp.asarray(_ln_oracle(x, lns, lnb), jnp.float32)
    oracle = token_mlp_reference(xn, w1, b1, w2, b2) + x
    got = token_mlp_pallas(x, w1, b1, w2, b2, ln=(lns, lnb),
                           residual_input=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(oracle),
                               rtol=3e-5, atol=3e-5)


def test_token_mlp_ln_prologue_gradients():
    from robustart_tpu.ops.pallas_mlp import (
        _ln_f32,
        token_mlp_pallas,
        token_mlp_reference,
    )

    x, w1, b1, w2, b2 = _token_data(b=1, c=128, seed=18)
    lns, lnb = _ln_params(128, 19)

    def loss_pallas(x, lns, lnb):
        out = token_mlp_pallas(x, w1, b1, w2, b2, ln=(lns, lnb),
                               residual_input=True, interpret=True)
        return jnp.sum(out * jnp.sin(out))

    def loss_ref(x, lns, lnb):
        xn = _ln_f32(x, lns, lnb, 1e-6).astype(x.dtype)
        out = token_mlp_reference(xn, w1, b1, w2, b2) + x
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, lns, lnb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, lns, lnb)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)


def test_mixer_block_eval_train_consistency():
    """Deterministic (fused-LN) and train-mode (explicit LN, drop_path=0)
    forwards agree — the fused block is the same math."""
    from robustart_tpu.models.mlp_mixer import MixerBlock

    rng = np.random.default_rng(20)
    x = jnp.asarray(rng.standard_normal((2, 196, 768)) * 0.5, jnp.float32)
    blk = MixerBlock(tokens_mlp_dim=384, channels_mlp_dim=3072, drop_path=0.0)
    variables = blk.init(jax.random.key(0), x, deterministic=True)
    a = blk.apply(variables, x, deterministic=True)
    b = blk.apply(variables, x, deterministic=False,
                  rngs={"dropout": jax.random.key(1)})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


def test_token_mlp_no_ln_wide_channels_multiblock():
    """c > 512 without LN streams channels in 512-wide blocks; the zero LN
    placeholder is a single block and must be indexed at (0, 0) for every
    grid step (regression: (0, j) read past the placeholder — the
    train-mode mixer_b16 shape, C=768)."""
    from robustart_tpu.ops.pallas_mlp import (
        token_mlp_pallas,
        token_mlp_reference,
    )

    x, w1, b1, w2, b2 = _token_data(b=1, t=32, c=768, h=64, seed=11)
    ref = token_mlp_reference(x, w1, b1, w2, b2)
    got = token_mlp_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_gradients_with_f_chunking():
    """F large enough to force nf>1: the grad-mode pre-activation residual
    is assembled from per-(row, chunk) blocks — a wrong u BlockSpec index
    map would scramble whole chunks."""
    x, w1, b1, w2, b2 = _data(m=16, c=512, f=4096, seed=20)

    def loss(fn, *args):
        out = fn(*args)
        return jnp.sum(out * jnp.sin(out))

    gp = jax.grad(
        lambda *a: loss(lambda *z: mlp_pallas(*z, interpret=True), *a),
        argnums=(0, 1, 3),
    )(x, w1, b1, w2, b2)
    gr = jax.grad(
        lambda *a: loss(mlp_reference, *a), argnums=(0, 1, 3)
    )(x, w1, b1, w2, b2)
    for a, r in zip(gp, gr):
        assert float(jnp.abs(r).max()) > 0.0
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-4, atol=2e-4)
