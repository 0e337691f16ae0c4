"""Fused Swin window-attention Pallas kernel vs the einsum reference:
forward equality (bias + shifted-window mask paths) and q/k/v gradients
(attacks differentiate through the fused eval forward).

Runs on CPU via the TPU-semantics interpreter (CLAUDE.md: plain interpret
lacks the pltpu primitives).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.pallas_attention import window_mha_pallas


def _reference(q, k, v, rel_bias, mask, num_windows):
    bnw, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = attn + rel_bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn.reshape(bnw // num_windows, num_windows, h, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bnw, h, n, n)
    p = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def _data(bnw=8, n=49, h=4, d=32, num_windows=4, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.standard_normal((bnw, n, h, d)), jnp.float32)
        for _ in range(3)
    )
    rel_bias = jnp.asarray(rng.standard_normal((h, n, n)) * 0.5, jnp.float32)
    mask = None
    if with_mask:
        m = np.zeros((num_windows, n, n), np.float32)
        blocked = rng.uniform(size=(num_windows, n, n)) < 0.3
        m[blocked] = -100.0
        mask = jnp.asarray(m)
    return q, k, v, rel_bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_window_attention_forward_matches_einsum(with_mask):
    q, k, v, rel_bias, mask = _data(with_mask=with_mask)
    ref = _reference(q, k, v, rel_bias, mask, 4)
    got = window_mha_pallas(
        q, k, v, rel_bias, mask, num_windows=4, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_mask_selected_per_window_position():
    """Window i must receive mask[i % num_windows] — a wrong index map would
    still pass a uniform-mask test."""
    bnw, n, h, d, nw = 8, 49, 2, 32, 4
    q, k, v, rel_bias, _ = _data(bnw, n, h, d, nw, with_mask=False, seed=1)
    rng = np.random.default_rng(2)
    # distinct mask per window position
    mask = jnp.asarray(
        np.where(rng.uniform(size=(nw, n, n)) < 0.4, -100.0, 0.0), jnp.float32
    )
    ref = _reference(q, k, v, rel_bias, mask, nw)
    got = window_mha_pallas(
        q, k, v, rel_bias, mask, num_windows=nw, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_window_attention_gradients_match():
    q, k, v, rel_bias, mask = _data(bnw=4, h=2, seed=3)

    def loss_pallas(q, k, v):
        out = window_mha_pallas(
            q, k, v, rel_bias, mask, num_windows=4, interpret=True
        )
        return jnp.sum(out * out)

    def loss_ref(q, k, v):
        out = _reference(q, k, v, rel_bias, mask, 4)
        return jnp.sum(out * out)

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_window_attention_bias_and_mask_gradients_match():
    """Parameter gradients through the fused forward are exact: rel_bias
    (and mask) cotangents match the einsum path — eval-mode fine-tuning or
    bias-table probing must not silently freeze the table (ADVICE r2)."""
    q, k, v, rel_bias, mask = _data(bnw=4, h=2, seed=4)

    def loss_pallas(rel_bias, mask):
        out = window_mha_pallas(
            q, k, v, rel_bias, mask, num_windows=4, interpret=True
        )
        return jnp.sum(out * out)

    def loss_ref(rel_bias, mask):
        out = _reference(q, k, v, rel_bias, mask, 4)
        return jnp.sum(out * out)

    gp = jax.grad(loss_pallas, argnums=(0, 1))(rel_bias, mask)
    gr = jax.grad(loss_ref, argnums=(0, 1))(rel_bias, mask)
    assert float(jnp.abs(gr[0]).max()) > 1e-3  # non-trivial gradient
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_swin_module_bias_table_param_grad_nonzero():
    """jax.grad w.r.t. params through the Pallas deterministic forward
    produces a live relative_position_bias_table gradient equal to the
    einsum path's."""
    from robustart_tpu.models.swin import SwinTransformer
    from robustart_tpu.models.classifier import init_classifier
    import robustart_tpu.ops.pallas_attention as pa

    module = SwinTransformer(
        embed_dim=24, depths=(2,), num_heads=(3,), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=56)
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)

    def loss(params, impl):
        out = module.clone(attention_impl=impl).apply(
            {"params": params}, xn, train=False
        )
        return jnp.sum(out * out)

    from tests.test_pallas_window_block import interp_pallas

    with interp_pallas(pa):
        g_pallas = jax.grad(loss)(clf.variables["params"], "pallas")
    g_ref = jax.grad(loss)(clf.variables["params"], "xla")

    flat_p = jax.tree_util.tree_leaves_with_path(g_pallas)
    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    checked = 0
    for key, gp_leaf in flat_p:
        ks = jax.tree_util.keystr(key)
        if "relative_position_bias_table" in ks:
            assert float(jnp.abs(gp_leaf).max()) > 0.0
            np.testing.assert_allclose(
                np.asarray(gp_leaf), np.asarray(flat_r[ks]),
                rtol=2e-3, atol=2e-3,
            )
            checked += 1
    assert checked == 2  # both blocks' tables


def test_swin_module_pallas_impl_matches_xla():
    """Module-level equivalence via the interpreter (small swin, both shift
    and no-shift blocks)."""
    from robustart_tpu.models.swin import SwinTransformer
    from robustart_tpu.models.classifier import init_classifier
    import robustart_tpu.ops.pallas_attention as pa

    module = SwinTransformer(
        embed_dim=24, depths=(2,), num_heads=(3,), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=56)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    xn = (x - jnp.asarray(clf.mean)) / jnp.asarray(clf.std)

    ref = module.clone(attention_impl="xla").apply(clf.variables, xn,
                                                   train=False)
    from tests.test_pallas_window_block import interp_pallas

    with interp_pallas(pa):
        got = module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=False
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
