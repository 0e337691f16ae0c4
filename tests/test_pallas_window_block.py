"""Fused Swin window-BLOCK Pallas kernel (LN + qkv + attention + proj +
residual in one VMEM program) vs the XLA reference: forward parity, wpb
batching, mask indexing, and exact gradients for every input.

Runs on CPU via the TPU-semantics interpreter (CLAUDE.md).
"""

import contextlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.pallas_attention import (
    window_block_pallas,
    window_block_reference,
)


def _data(bnw=8, n=49, h=4, d=32, num_windows=4, with_mask=True, seed=0):
    rng = np.random.default_rng(seed)
    c = h * d

    def arr(*shape, s=1.0):
        return jnp.asarray(rng.standard_normal(shape) * s, jnp.float32)

    x = arr(bnw, n, c)
    ln_scale = arr(c, s=0.2) + 1.0
    ln_bias = arr(c, s=0.1)
    ws = [arr(c, c, s=c ** -0.5) for _ in range(3)] + [arr(c, c, s=c ** -0.5)]
    bs = [arr(c, s=0.05) for _ in range(4)]
    rel_bias = arr(h, n, n, s=0.5)
    mask = None
    if with_mask:
        m = np.zeros((num_windows, n, n), np.float32)
        m[rng.uniform(size=(num_windows, n, n)) < 0.3] = -100.0
        mask = jnp.asarray(m)
    return (x, ln_scale, ln_bias, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2],
            ws[3], bs[3], rel_bias, mask)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("wpb", [1, 2, 4])
def test_window_block_forward_matches_reference(with_mask, wpb):
    args = _data(with_mask=with_mask)
    ref = window_block_reference(*args, num_windows=4)
    got = window_block_pallas(*args, num_windows=4, wpb=wpb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_window_block_paired_windows_bitwise_vs_unpaired(with_mask):
    """Even wpb at n ≤ 64 activates paired-window scores (two windows per
    MXU macro-op, cross-window quadrants at -1e30 via the paired bias).
    The extra contraction terms are exact zeros, but the p·v contraction
    runs at K=2n vs K=n, and a dot's reduction TREE may group the nonzero
    terms differently around the interleaved zeros — a few f32 ulps
    (measured ≤ 8e-7 in the interpreter). At the production bf16 block
    dtype the f32 ulps vanish in the output cast: bitwise there; allclose
    at ulp tolerance in f32."""
    args = _data(with_mask=with_mask)
    unpaired = window_block_pallas(*args, num_windows=4, wpb=1,
                                   interpret=True)
    paired = window_block_pallas(*args, num_windows=4, wpb=2,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(paired), np.asarray(unpaired),
                               rtol=2e-6, atol=2e-6)

    args_bf = [a.astype(jnp.bfloat16)
               if a is not None and a.ndim >= 2 and a.dtype == jnp.float32
               and a.shape[-1] != 49 else a for a in args]
    unpaired = window_block_pallas(*args_bf, num_windows=4, wpb=1,
                                   interpret=True)
    paired = window_block_pallas(*args_bf, num_windows=4, wpb=2,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(paired), np.asarray(unpaired))


def test_window_block_mask_indexed_per_window_position():
    """Each window must get mask[window_index % num_windows] — a uniform
    mask would hide a wrong BlockSpec index map."""
    nw = 4
    args = list(_data(bnw=8, num_windows=nw, with_mask=False, seed=1))
    rng = np.random.default_rng(2)
    n = args[0].shape[1]
    args[12] = jnp.asarray(
        np.where(rng.uniform(size=(nw, n, n)) < 0.4, -100.0, 0.0),
        jnp.float32,
    )
    ref = window_block_reference(*args, num_windows=nw)
    for wpb in (1, 2, 4):
        got = window_block_pallas(*args, num_windows=nw, wpb=wpb,
                                  interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)


def test_window_block_all_gradients_match():
    """custom VJP must produce exact cotangents for x, LN affine, all four
    weight/bias pairs, the bias table AND the mask (ADVICE r2: no silently
    frozen parameters)."""
    args = _data(bnw=4, h=2, seed=3)

    def loss_pallas(*a):
        out = window_block_pallas(*a, num_windows=4, wpb=2, interpret=True)
        return jnp.sum(out * out)

    def loss_ref(*a):
        out = window_block_reference(*a, num_windows=4)
        return jnp.sum(out * out)

    idx = tuple(range(13))
    gp = jax.grad(loss_pallas, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for i, (a, b) in enumerate(zip(gp, gr)):
        assert float(jnp.abs(b).max()) > 1e-6, f"trivial reference grad {i}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad argnum {i}")


def test_window_block_no_mask_grad_is_none_safe():
    args = _data(bnw=4, h=2, with_mask=False, seed=5)

    def loss(x):
        a = list(args)
        a[0] = x
        out = window_block_pallas(*a, num_windows=1, wpb=4, interpret=True)
        return jnp.sum(out * out)

    g = jax.grad(loss)(args[0])
    assert float(jnp.abs(g).max()) > 0.0


@contextlib.contextmanager
def interp_pallas(pa):
    """Patch ALL the transformer Pallas entry points (window attention,
    whole-block kernel, and the fused MLP — impl='pallas' routes the MLP
    half through mlp_pallas too) with interpret=True versions for CPU runs;
    restores them on exit. Shared with test_pallas_window_attention.py."""
    from robustart_tpu.ops import pallas_mlp as pm

    orig_mha, orig_blk = pa.window_mha_pallas, pa.window_block_pallas
    orig_mlp = pm.mlp_pallas

    def mha(q, k, v, rel_bias, mask=None, *, num_windows=1, interpret=False):
        return orig_mha(q, k, v, rel_bias, mask, num_windows=num_windows,
                        interpret=True)

    def blk(*a, **kw):
        kw["interpret"] = True
        return orig_blk(*a, **kw)

    def mlp(*a, **kw):
        kw["interpret"] = True
        return orig_mlp(*a, **kw)

    pa.window_mha_pallas, pa.window_block_pallas = mha, blk
    pm.mlp_pallas = mlp
    try:
        yield
    finally:
        pa.window_mha_pallas, pa.window_block_pallas = orig_mha, orig_blk
        pm.mlp_pallas = orig_mlp


def test_swin_module_fused_block_matches_xla():
    """Module-level: the fused block half (default pallas path at small C)
    matches the einsum forward, shift and no-shift blocks both."""
    from robustart_tpu.models.swin import SwinTransformer
    from robustart_tpu.models.classifier import init_classifier
    import robustart_tpu.ops.pallas_attention as pa

    # embed_dim 128: the fused path gates on lane-aligned C (C % 128 == 0)
    module = SwinTransformer(
        embed_dim=128, depths=(2,), num_heads=(4,), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=56)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    xn = (x - jnp.asarray(clf.mean)) / jnp.asarray(clf.std)

    ref = module.clone(attention_impl="xla").apply(clf.variables, xn,
                                                   train=False)
    with interp_pallas(pa):
        got = module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=False
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_swin_module_fused_block_param_grads_match_xla():
    """Full param-tree gradients through the fused deterministic forward
    equal the einsum path's (incl. LN affine, qkv/proj, bias tables)."""
    from robustart_tpu.models.swin import SwinTransformer
    from robustart_tpu.models.classifier import init_classifier
    import robustart_tpu.ops.pallas_attention as pa

    # embed_dim 128: the fused path gates on lane-aligned C (C % 128 == 0)
    module = SwinTransformer(
        embed_dim=128, depths=(2,), num_heads=(4,), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=56)
    rng = np.random.default_rng(1)
    xn = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)

    def loss(params, impl):
        out = module.clone(attention_impl=impl).apply(
            {"params": params}, xn, train=False
        )
        return jnp.sum(out * out)

    with interp_pallas(pa):
        g_pallas = jax.grad(loss)(clf.variables["params"], "pallas")
    g_ref = jax.grad(loss)(clf.variables["params"], "xla")

    flat_r = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(g_ref)}
    for key, gp_leaf in jax.tree_util.tree_leaves_with_path(g_pallas):
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(gp_leaf), np.asarray(flat_r[ks]),
            rtol=5e-3, atol=5e-3, err_msg=ks,
        )


def test_vit_module_fused_block_matches_xla():
    """ViT reuses the fused window-block kernel (one 197-token window per
    image, (H,1,1) broadcast-zero bias): module-level forward equivalence
    vs the einsum path, and input grads (attack path) agree."""
    from robustart_tpu.models.vit import VisionTransformer
    import robustart_tpu.ops.pallas_attention as pa
    from robustart_tpu.ops import pallas_mlp as pm

    # embed_dim 128: the fused path gates on lane-aligned C (C % 128 == 0)
    module = VisionTransformer(
        patch_size=8, embed_dim=128, depth=2, num_heads=4, num_classes=10,
        drop_path=0.0, attention_impl="xla",
    )
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.standard_normal((2, 32, 32, 3)) * 0.5, jnp.float32)
    v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
                    train=False)
    ref = module.apply(v, xn, train=False)
    g_ref = jax.grad(lambda xi: jnp.sum(
        module.apply(v, xi, train=False) ** 2))(xn)

    fused_mod = VisionTransformer(
        patch_size=8, embed_dim=128, depth=2, num_heads=4, num_classes=10,
        drop_path=0.0, attention_impl="pallas",
    )
    with interp_pallas(pa):
        got = fused_mod.apply(v, xn, train=False)
        g_got = jax.grad(lambda xi: jnp.sum(
            fused_mod.apply(v, xi, train=False) ** 2))(xn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("with_mask", [False, True])
@pytest.mark.parametrize("head_groups", [2, 4])
def test_window_block_head_grouped_matches_reference(with_mask, head_groups):
    """The head-grouped variant (weights streamed in G head slices, f32
    partial-proj accumulation) is numerically the same block."""
    args = _data(with_mask=with_mask)
    ref = window_block_reference(*args, num_windows=4)
    got = window_block_pallas(*args, num_windows=4, wpb=2,
                              head_groups=head_groups, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_window_block_head_grouped_vit_style_bias():
    """(H, 1, 1) broadcast-zero bias (the ViT/CLIP single-window use) under
    head grouping."""
    args = list(_data(bnw=4, with_mask=False, seed=9))
    args[11] = jnp.zeros((4, 1, 1), jnp.float32)  # rel_bias (H, 1, 1)
    ref = window_block_reference(*args, num_windows=1)
    got = window_block_pallas(*args, num_windows=1, wpb=2, head_groups=2,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)


def test_window_block_head_grouped_gradients():
    args = _data(bnw=4, h=2, seed=4)

    def loss_pallas(*a):
        out = window_block_pallas(*a, num_windows=4, wpb=2, head_groups=2,
                                  interpret=True)
        return jnp.sum(out * out)

    def loss_ref(*a):
        out = window_block_reference(*a, num_windows=4)
        return jnp.sum(out * out)

    idx = (0, 3, 9, 11)  # x, wq, wp, rel_bias — spot-check the VJP wiring
    gp = jax.grad(loss_pallas, argnums=idx)(*args)
    gr = jax.grad(loss_ref, argnums=idx)(*args)
    for i, (a, b) in enumerate(zip(gp, gr)):
        assert float(jnp.abs(b).max()) > 1e-6
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4,
                                   err_msg=f"grad argnum {idx[i]}")


def test_block_kernel_head_groups_policy():
    from robustart_tpu.ops.pallas_attention import block_kernel_head_groups

    # ViT-B bf16: 4·768²·2 = 4.5 MB fits → all heads resident
    assert block_kernel_head_groups(768, 12, 2) == 1
    # CLIP-L / ViT-L bf16 (C=1024, H=16): 8 MB → two groups of 8 heads
    assert block_kernel_head_groups(1024, 16, 2) == 2
    # Swin stage 3 bf16 (C=1024, H=32) → two groups of 16 heads
    assert block_kernel_head_groups(1024, 32, 2) == 2
    # f32 CLIP-L: 16 MB → four groups
    assert block_kernel_head_groups(1024, 16, 4) == 4
    # lane-misaligned C is never fused
    assert block_kernel_head_groups(192, 3, 4) is None


def test_window_block_head_grouped_lane_aligned_shape():
    """A CLIP-like configuration at reduced width: d=64 heads so the group
    column count (gc = (H/G)·64) is lane-aligned as it is on the real
    models (CLIP-L G=2 → gc=512), single 65-token window, wpb=1."""
    args = _data(bnw=2, n=65, h=8, d=64, num_windows=1, with_mask=False,
                 seed=12)
    args = list(args)
    args[11] = jnp.zeros((8, 1, 1), jnp.float32)  # ViT-style zero bias
    ref = window_block_reference(*args, num_windows=1)
    got = window_block_pallas(*args, num_windows=1, wpb=1, head_groups=2,
                              interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-5, atol=5e-5)


def test_broadcast_bias_cotangent_shape():
    """ViT passes a (H, 1, 1) broadcast-zeros bias table: its cotangent
    must be summed down to the primal's shape (custom_vjp does NOT check
    bwd output shapes — a full (H, N, N) return would silently mis-shape
    a trained bias) and equal the full-shape grad's broadcast-sum."""
    args = list(_data(bnw=4, h=2, with_mask=False, seed=7))
    h, n = 2, 49
    rb_small = jnp.asarray(
        np.random.default_rng(8).standard_normal((h, 1, 1)) * 0.3,
        jnp.float32)

    def loss(rb, full):
        a = list(args)
        a[11] = jnp.broadcast_to(rb, (h, n, n)) if full else rb
        out = window_block_pallas(*a, num_windows=1, wpb=4, interpret=True)
        return jnp.sum(out * out)

    g_small = jax.grad(loss)(rb_small, False)
    g_full = jax.grad(loss)(jnp.broadcast_to(rb_small, (h, n, n)), True)
    assert g_small.shape == (h, 1, 1)
    np.testing.assert_allclose(
        np.asarray(g_small),
        np.asarray(jnp.sum(g_full, axis=(1, 2), keepdims=True)),
        rtol=2e-4, atol=2e-4)
