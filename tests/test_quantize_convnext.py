"""int8 ConvNeXt PTQ eval path (robustart_tpu/models/quantize_convnext.py):
float-graph exactness (V1 + V2) + int8-vs-float agreement."""

import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.convnext import ConvNeXt
from robustart_tpu.models.quantize_convnext import _forward, quantize_convnext


def _mini_clf(use_grn=False):
    module = ConvNeXt(
        depths=(1, 1), dims=(32, 64), num_classes=10, drop_path=0.0,
        use_grn=use_grn,
    )
    name = "convnextv2_mini" if use_grn else "convnext_mini"
    return init_classifier(name, module, rng=0, input_size=32)


@pytest.mark.parametrize("use_grn", [False, True])
def test_calib_graph_matches_flax_forward(use_grn):
    clf = _mini_clf(use_grn)
    qclf = quantize_convnext(
        clf, np.zeros((1, 32, 32, 3), np.uint8), calib_batch_size=1
    )
    # rebuild float-weight params (quantize_convnext mutated entries and
    # folded LayerScale into pwconv2)
    p = clf.variables["params"]
    qp = dict(qclf.qparams)
    for si, depth in enumerate((1, 1)):
        if si > 0:
            qp[f"downsample_conv{si}"] = {
                "w": np.asarray(p[f"downsample_conv{si}"]["kernel"]),
                "b": np.asarray(p[f"downsample_conv{si}"]["bias"]),
            }
        for di in range(depth):
            blk = p[f"stage{si}_block{di}"]
            pre = f"stage{si}_block{di}"
            qp[f"{pre}/pwconv1"] = {
                "w": np.asarray(blk["pwconv1"]["kernel"]),
                "b": np.asarray(blk["pwconv1"]["bias"]),
            }
            w2 = np.asarray(blk["pwconv2"]["kernel"])
            b2 = np.asarray(blk["pwconv2"]["bias"])
            if not use_grn:
                g = np.asarray(blk["gamma"])
                w2, b2 = w2 * g[None, :], b2 * g
            qp[f"{pre}/pwconv2"] = {"w": w2, "b": b2}

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(clf.apply_fn(clf.variables, jnp.asarray(x), train=False))

    from robustart_tpu.models.layers import normalize_01

    got, _ = _forward(
        qp, ((1, 1), use_grn),
        normalize_01(jnp.asarray(x), clf.mean, clf.std), mode="calib",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_int8_convnext_agrees_with_float():
    clf = _mini_clf()
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    qclf = quantize_convnext(clf, calib, calib_batch_size=32)

    images = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))
    got = np.asarray(qclf(jnp.asarray(images)))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, f"logit cosine too low: {cos.min()}"
    # assert argmax only where the float top-2 margin exceeds the int8
    # noise floor (random-init logits cluster tightly)
    top2 = np.sort(ref, -1)
    decided = (top2[:, -1] - top2[:, -2]) > 0.05
    assert decided.sum() >= 10, "mini model produced too few decided samples"
    agree = (ref[decided].argmax(-1) == got[decided].argmax(-1)).mean()
    assert agree == 1.0, f"argmax agreement on decided samples: {agree}"


def test_uint8_and_float01_inputs_equal():
    clf = _mini_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    qclf = quantize_convnext(clf, calib, calib_batch_size=32)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    a = np.asarray(qclf(jnp.asarray(images)))
    b = np.asarray(qclf(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_array_equal(a, b)


def test_solver_dispatch_builds_quantized_convnext():
    """build_quantized routes ConvNeXt to quantize_convnext
    (solvers/base.py::build_quantized)."""
    from robustart_tpu.models.quantize_convnext import QuantizedConvNeXt
    from robustart_tpu.solvers.base import Solver

    clf = _mini_clf()
    rng = np.random.default_rng(3)
    calib = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    solver = Solver.__new__(Solver)
    solver.classifier = clf
    q = solver.build_quantized(calib)
    assert isinstance(q, QuantizedConvNeXt)
