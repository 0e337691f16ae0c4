"""ConvNeXt / Swin / CLIP model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier, model_meta, model_names


def _params(clf):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(clf.variables["params"]))


def test_names_registered():
    names = set(model_names())
    for n in ["convnext_base", "convnextv2_base", "convnext_base_cvst",
              "swin_tiny", "swin_small", "swin_base", "vit_base_cvst",
              "clip_vit_l_14", "clip_vit_l_14_fare2_clip",
              "clip_vit_l_14_tecoa2_clip"]:
        assert n in names, n


def test_convnext_base_param_parity():
    # official ConvNeXt-Base: 88,591,464 params
    clf = create_classifier("convnext_base", rng=0, input_size=64)
    assert _params(clf) == 88_591_464


def test_convnextv2_forward():
    clf = create_classifier("convnextv2_base", rng=0, input_size=64,
                            num_classes=10)
    out = clf(jnp.ones((1, 64, 64, 3)) * 0.5)
    assert out.shape == (1, 10) and bool(jnp.isfinite(out).all())


def test_swin_tiny_param_parity_and_forward():
    # official Swin-T: 28,288,354 params
    clf = create_classifier("swin_tiny", rng=0, input_size=224)
    assert _params(clf) == 28_288_354
    out = clf(jnp.ones((1, 224, 224, 3)) * 0.5)
    assert out.shape == (1, 1000) and bool(jnp.isfinite(out).all())


def test_swin_shifted_windows_differ_from_unshifted():
    from robustart_tpu.models.swin import shift_attn_mask

    mask = shift_attn_mask(14, 14, 7, 3)
    assert mask.shape == (4, 49, 49)
    assert (mask == -100.0).any() and (mask == 0.0).any()


def test_clip_meta_and_forward():
    meta = model_meta("clip_vit_l_14")
    assert abs(meta["mean"][0] - 0.48145466) < 1e-6
    clf = create_classifier("clip_vit_l_14", rng=0, input_size=224,
                            num_classes=10)
    out = clf(jnp.ones((1, 224, 224, 3)) * 0.5)
    assert out.shape == (1, 10) and bool(jnp.isfinite(out).all())


def test_swin_base_384_uses_window_12():
    """swin_base_384 (reference swin/config.yaml:10 eval_list) must build
    with window 12 (upstream swin_base_patch4_window12_384): 384/4 = 96
    spatial is not divisible by the 224-variant's window 7 — found by a
    cls_solver --evaluate run over the reference eval_list."""
    from robustart_tpu.models import get_model
    from robustart_tpu.models.swin import SwinTransformer

    m = get_model("swin_base_384")
    assert m.window_size == 12
    assert model_meta("swin_base_384")["input_size"] == 384
    # scaled-down 384-geometry forward: 96² input -> 24 spatial, window 12
    mini = SwinTransformer(embed_dim=24, depths=(2, 2), num_heads=(3, 6),
                           window_size=12, num_classes=10, drop_path=0.0)
    v = mini.init(jax.random.key(0), jnp.zeros((1, 96, 96, 3)), train=False)
    out = mini.apply(v, jnp.ones((1, 96, 96, 3)) * 0.5, train=False)
    assert out.shape == (1, 10) and bool(jnp.isfinite(out).all())
