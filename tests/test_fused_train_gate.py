"""Zero-rate training forwards use the fused kernels (VERDICT r2 weak-6).

When dropout/attention_dropout/drop_path are all 0, a train=True forward is
mathematically deterministic, so ViT/Swin route through the fused Pallas
block kernels (models/vit.py EncoderBlock, models/swin.py SwinBlock) and the
reference adv-train recipes (exprs/nips_benchmark/new_adv_train) train at
fused speed. Verified on CPU via the TPU-semantics interpreter by patching
the ops entry points (pattern from tests/test_pallas_window_block.py)."""

import jax
import jax.numpy as jnp
import numpy as np

import robustart_tpu.ops.pallas_attention as pa
import robustart_tpu.ops.pallas_mlp as pm
from robustart_tpu.models.classifier import init_classifier


def _patch_interpret():
    originals = (pa.window_block_pallas, pa.window_mha_pallas, pa.mha_pallas,
                 pm.mlp_pallas)
    calls = {"block": 0, "wmha": 0, "mha": 0, "mlp": 0}

    def wrap(fn, key):
        def inner(*a, **kw):
            calls[key] += 1
            kw["interpret"] = True
            return fn(*a, **kw)

        return inner

    def wrap_mha(fn):
        def inner(q, k, v, interpret=False):
            calls["mha"] += 1
            return fn(q, k, v, interpret=True)

        return inner

    def wrap_wmha(fn):
        def inner(q, k, v, rel_bias, mask=None, *, num_windows=1,
                  interpret=False):
            calls["wmha"] += 1
            return fn(q, k, v, rel_bias, mask, num_windows=num_windows,
                      interpret=True)

        return inner

    pa.window_block_pallas = wrap(originals[0], "block")
    pa.window_mha_pallas = wrap_wmha(originals[1])
    pa.mha_pallas = wrap_mha(originals[2])
    pm.mlp_pallas = wrap(originals[3], "mlp")
    return originals, calls


def _unpatch(originals):
    (pa.window_block_pallas, pa.window_mha_pallas, pa.mha_pallas,
     pm.mlp_pallas) = originals


def test_vit_zero_rate_train_forward_is_fused_and_matches_eval():
    from robustart_tpu.models.vit import VisionTransformer

    module = VisionTransformer(
        patch_size=16, embed_dim=128, depth=2, num_heads=4, num_classes=10,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
    )
    clf = init_classifier("vit_mini", module, rng=0, input_size=32)
    rng = np.random.default_rng(0)
    xn = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    ref = module.clone(attention_impl="xla").apply(
        clf.variables, xn, train=False
    )
    originals, calls = _patch_interpret()
    try:
        got_train = module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=True,
            rngs={"dropout": jax.random.key(0)},
        )
    finally:
        _unpatch(originals)
    assert calls["block"] > 0 and calls["mlp"] > 0, calls
    np.testing.assert_allclose(np.asarray(got_train), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_swin_zero_droppath_train_forward_is_fused_and_matches_eval():
    from robustart_tpu.models.swin import SwinTransformer

    module = SwinTransformer(
        embed_dim=128, depths=(2,), num_heads=(4,), window_size=7,
        num_classes=10, drop_path=0.0,
    )
    clf = init_classifier("swin_mini", module, rng=0, input_size=56)
    rng = np.random.default_rng(1)
    xn = jnp.asarray(rng.normal(0, 1, (2, 56, 56, 3)), jnp.float32)

    ref = module.clone(attention_impl="xla").apply(
        clf.variables, xn, train=False
    )
    originals, calls = _patch_interpret()
    try:
        got_train = module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=True,
            rngs={"dropout": jax.random.key(0)},
        )
    finally:
        _unpatch(originals)
    assert calls["block"] > 0 and calls["mlp"] > 0, calls
    np.testing.assert_allclose(np.asarray(got_train), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_vit_nonzero_rates_keep_the_einsum_train_path():
    """dropout > 0 must NOT fuse in train mode (the block fusions bake the
    residual add and skip the dropout sites). Note drop_path alone would not
    do here: the timm schedule gives block 0 rate 0, which legitimately
    fuses."""
    from robustart_tpu.models.vit import VisionTransformer

    module = VisionTransformer(
        patch_size=16, embed_dim=128, depth=2, num_heads=4, num_classes=10,
        dropout=0.1, drop_path=0.1,
    )
    clf = init_classifier("vit_mini_dp", module, rng=0, input_size=32)
    rng = np.random.default_rng(2)
    xn = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    originals, calls = _patch_interpret()
    try:
        module.clone(attention_impl="pallas").apply(
            clf.variables, xn, train=True,
            rngs={"dropout": jax.random.key(0)},
        )
    finally:
        _unpatch(originals)
    # the BLOCK fusions (which bake the residual add and skip the dropout
    # sites) must stay off; the stochasticity-free attention core
    # (mha_pallas — attention_dropout is 0) remains legal
    assert calls["block"] == 0 and calls["mlp"] == 0, calls
