"""int8 Swin PTQ eval path (robustart_tpu/models/quantize_swin.py):
float-graph exactness (incl. a shifted-window block) + int8-vs-float
agreement."""

import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.quantize_swin import _forward, quantize_swin
from robustart_tpu.models.swin import SwinTransformer


def _mini_clf():
    # stage0 res 8 > ws 4 → block di=1 exercises the shifted-window path
    module = SwinTransformer(
        embed_dim=32, depths=(2, 1), num_heads=(2, 4), window_size=4,
        num_classes=10, drop_path=0.0,
    )
    return init_classifier("swin_mini", module, rng=0, input_size=32)


def test_calib_graph_matches_flax_forward():
    clf = _mini_clf()
    qclf = quantize_swin(
        clf, np.zeros((1, 32, 32, 3), np.uint8), calib_batch_size=1,
        pallas=False,
    )
    # rebuild float-weight params (quantize_swin mutated dense entries)
    p = clf.variables["params"]
    qp = dict(qclf.qparams)
    qp["merge_reduction1"] = {
        "w": np.asarray(p["merge_reduction1"]["kernel"]), "b": None,
    }
    for si, depth in enumerate((2, 1)):
        for di in range(depth):
            blk = p[f"stage{si}_block{di}"]
            pre = f"stage{si}_block{di}"
            for sub, node in (
                ("attn/qkv", blk["attn"]["qkv"]),
                ("attn/proj", blk["attn"]["proj"]),
                ("mlp_fc1", blk["mlp_fc1"]),
                ("mlp_fc2", blk["mlp_fc2"]),
            ):
                qp[f"{pre}/{sub}"] = {
                    "w": np.asarray(node["kernel"]),
                    "b": np.asarray(node["bias"]),
                }

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(clf.apply_fn(clf.variables, jnp.asarray(x), train=False))

    from robustart_tpu.models.layers import normalize_01

    got, _ = _forward(
        qp, (32, (2, 1), (2, 4), 4),
        normalize_01(jnp.asarray(x), clf.mean, clf.std),
        mode="calib", pallas=False,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_int8_swin_agrees_with_float():
    clf = _mini_clf()
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    qclf = quantize_swin(clf, calib, calib_batch_size=32, pallas=False)

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
    qclf = quantize_swin(clf, calib, calib_batch_size=32, pallas=False)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    a = np.asarray(qclf(jnp.asarray(images)))
    b = np.asarray(qclf(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_array_equal(a, b)


def test_solver_dispatch_builds_quantized_swin():
    """build_quantized routes SwinTransformer to quantize_swin
    (solvers/base.py::build_quantized). Swin is a fused-bf16-kernel
    family, so the route REFUSES without model.quantize_force (measured
    slower on chip — benchmarks/RESULTS.md) and builds when forced."""
    import pytest

    from robustart_tpu.core.config import Config
    from robustart_tpu.models.quantize_swin import QuantizedSwin
    from robustart_tpu.solvers.base import Solver

    clf = _mini_clf()
    rng = np.random.default_rng(3)
    calib = rng.integers(0, 256, (8, 32, 32, 3), np.uint8)
    solver = Solver.__new__(Solver)
    solver.classifier = clf
    solver.cfg = Config({"model": {}})
    with pytest.raises(ValueError, match="refused"):
        solver.build_quantized(calib)
    solver.cfg = Config({"model": {"quantize_force": True}})
    q = solver.build_quantized(calib)
    assert isinstance(q, QuantizedSwin)
