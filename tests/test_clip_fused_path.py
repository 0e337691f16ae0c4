"""CLIP ViT fused TPU path (models/clip_vit.py): the pallas impl
(mha_pallas attention core + mlp_pallas LN2+MLP+residual, quick-gelu
in-kernel) matches the XLA einsum forward, module-level.

Runs on CPU via the TPU-semantics interpreter (CLAUDE.md) by patching the
ops entry points, same pattern as tests/test_pallas_window_block.py."""

import jax
import jax.numpy as jnp
import numpy as np

import robustart_tpu.ops.pallas_attention as pa
import robustart_tpu.ops.pallas_mlp as pm
from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.clip_vit import CLIPVisionClassifier


def _interp_patches():
    orig_mha, orig_mlp = pa.mha_pallas, pm.mlp_pallas

    def mha(q, k, v, interpret=False):
        return orig_mha(q, k, v, interpret=True)

    def mlp(*a, **kw):
        kw["interpret"] = True
        return orig_mlp(*a, **kw)

    return orig_mha, orig_mlp, mha, mlp


def _mini_clf():
    module = CLIPVisionClassifier(
        patch_size=14, width=64, depth=2, num_heads=4, embed_dim=32,
        num_classes=10,
    )
    return init_classifier("clip_mini", module, rng=0, input_size=56), module


def test_clip_module_fused_path_matches_xla():
    clf, module = _mini_clf()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    xn = (x - jnp.asarray(clf.mean)) / jnp.asarray(clf.std)

    ref = module.clone(attention_impl="xla").apply(clf.variables, xn,
                                                   train=False)
    orig_mha, orig_mlp, mha, mlp = _interp_patches()
    pa.mha_pallas, pm.mlp_pallas = mha, mlp
    try:
        got = module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=False
        )
    finally:
        pa.mha_pallas, pm.mlp_pallas = orig_mha, orig_mlp
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_clip_fused_path_input_grads_match_xla():
    """Whitebox attacks differentiate through the fused forward: input
    grads from the pallas path agree with the einsum path (both VJPs are
    exact recomputations)."""
    clf, module = _mini_clf()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    xn = (x - jnp.asarray(clf.mean)) / jnp.asarray(clf.std)
    labels = jnp.asarray([1, 2])

    def loss(impl, xin):
        logits = module.clone(attention_impl=impl).apply(
            clf.variables, xin, train=False
        )
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.sum(jax.nn.log_softmax(logits) * onehot)

    g_ref = jax.grad(lambda v: loss("xla", v))(xn)
    orig_mha, orig_mlp, mha, mlp = _interp_patches()
    pa.mha_pallas, pm.mlp_pallas = mha, mlp
    try:
        g_got = jax.grad(lambda v: loss("pallas", v))(xn)
    finally:
        pa.mha_pallas, pm.mlp_pallas = orig_mha, orig_mlp
    assert float(jnp.abs(g_ref).max()) > 0.0
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-5)


def test_clip_block_kernel_path_matches_xla():
    """Lane-aligned widths route the attention half through the whole-block
    window kernel (one 257-token window; CLIP-L additionally streams the
    weights in head groups — grouped parity is covered at ops level in
    test_pallas_window_block.py)."""
    import robustart_tpu.ops.pallas_attention as pa
    from tests.test_pallas_window_block import interp_pallas

    module = CLIPVisionClassifier(
        patch_size=14, width=256, depth=2, num_heads=2, embed_dim=32,
        num_classes=10,
    )
    clf = init_classifier("clip_mini_block", module, rng=0, input_size=56)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(0, 1, (2, 56, 56, 3)), jnp.float32)
    xn = (x - jnp.asarray(clf.mean)) / jnp.asarray(clf.std)

    ref = module.clone(attention_impl="xla").apply(clf.variables, xn,
                                                   train=False)
    calls = {"blk": 0}
    orig_blk = pa.window_block_pallas

    def counting_blk(*a, **kw):
        calls["blk"] += 1
        return orig_blk(*a, **kw)

    pa.window_block_pallas = counting_blk
    try:
        with interp_pallas(pa):
            got = module.clone(attention_impl="pallas").apply(
                clf.variables, xn, train=False
            )
    finally:
        pa.window_block_pallas = orig_blk
    assert calls["blk"] == 2  # one per depth-2 block
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
