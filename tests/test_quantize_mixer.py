"""int8 MLP-Mixer PTQ eval path (robustart_tpu/models/quantize_mixer.py):
float-graph exactness + int8-vs-float agreement."""

import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.mlp_mixer import MlpMixer
from robustart_tpu.models.quantize_mixer import _forward, quantize_mixer


def _mini_clf():
    module = MlpMixer(
        patch_size=8, embed_dim=64, depth=2, tokens_mlp_dim=32,
        channels_mlp_dim=128, num_classes=10, drop_path=0.0,
    )
    return init_classifier("mixer_mini", module, rng=0, input_size=32)


def test_calib_graph_matches_flax_forward():
    clf = _mini_clf()
    qclf = quantize_mixer(
        clf, np.zeros((1, 32, 32, 3), np.uint8), calib_batch_size=1
    )
    # rebuild float-weight params (quantize_mixer mutated block entries)
    p = clf.variables["params"]
    qp = dict(qclf.qparams)
    for i in range(2):
        blk = p[f"block{i}"]
        for sub, mlp in (("tok", "mlp_tokens"), ("ch", "mlp_channels")):
            for fc in ("fc1", "fc2"):
                qp[f"block{i}/{sub}/{fc}"] = {
                    "w": np.asarray(blk[mlp][fc]["kernel"]),
                    "b": np.asarray(blk[mlp][fc]["bias"]),
                }

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(clf.apply_fn(clf.variables, jnp.asarray(x), train=False))

    from robustart_tpu.models.layers import normalize_01

    got, _ = _forward(
        qp, (2, (8, 8)), normalize_01(jnp.asarray(x), clf.mean, clf.std),
        mode="calib",
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_int8_mixer_agrees_with_float():
    clf = _mini_clf()
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    qclf = quantize_mixer(clf, calib, calib_batch_size=32)

    images = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))
    got = np.asarray(qclf(jnp.asarray(images)))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    assert cos.min() > 0.999, f"logit cosine too low: {cos.min()}"
    # the random-init mean-pooled head clusters logits within the int8
    # noise floor, so assert argmax only where the float top-2 margin
    # exceeds it (max |Δlogit| measures ≈0.013 on this mini model)
    top2 = np.sort(ref, -1)
    decided = (top2[:, -1] - top2[:, -2]) > 0.05
    assert decided.sum() >= 10, "mini model produced too few decided samples"
    agree = (ref[decided].argmax(-1) == got[decided].argmax(-1)).mean()
    assert agree == 1.0, f"argmax agreement on decided samples: {agree}"


def test_uint8_and_float01_inputs_equal():
    clf = _mini_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    qclf = quantize_mixer(clf, calib, calib_batch_size=32)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    a = np.asarray(qclf(jnp.asarray(images)))
    b = np.asarray(qclf(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_array_equal(a, b)


def test_solver_dispatch_builds_quantized_mixer():
    """build_quantized routes MlpMixer to quantize_mixer
    (solvers/base.py::build_quantized). Mixer is a fused-bf16-kernel
    family, so the route REFUSES without model.quantize_force (measured
    slower on chip — benchmarks/RESULTS.md) and builds when forced."""
    import pytest

    from robustart_tpu.core.config import Config
    from robustart_tpu.models.quantize_mixer import QuantizedMixer
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
    assert isinstance(q, QuantizedMixer)
