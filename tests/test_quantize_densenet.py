"""int8 PTQ for DenseNet (pre-activation scheme): calib-graph exactness +
int8-vs-float agreement (robustart_tpu/models/quantize_densenet.py)."""

import jax.numpy as jnp
import numpy as np

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize_densenet import (
    _collect,
    _forward,
    quantize_densenet,
)


def _make_clf():
    import jax

    clf = create_classifier("densenet121", rng=0, input_size=64)
    rng = np.random.default_rng(1)

    def jitter(path, leaf):
        key = "/".join(str(p.key) for p in path)
        if key.endswith("mean"):
            return leaf + jnp.asarray(rng.normal(0, 0.1, leaf.shape), leaf.dtype)
        if key.endswith("var"):
            return leaf * jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
        return leaf

    stats = jax.tree_util.tree_map_with_path(
        jitter, clf.variables["batch_stats"]
    )
    clf.variables = {"params": clf.variables["params"], "batch_stats": stats}
    return clf


def test_calib_graph_matches_flax_forward():
    """The float calibration graph (stem fold + BN-affine/relu prologues)
    reproduces the flax eval forward exactly (models/densenet.py:60-91)."""
    clf = _make_clf()
    qp, units = _collect(clf.variables, clf.module)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got, amax = _forward(
        qp, units, normalize_01(x01, clf.mean, clf.std), mode="calib"
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)
    needed = {"stem"} | {
        u.site for g in units for u in g[1:] if u is not None
    }
    assert needed <= set(amax), needed - set(amax)


def test_int8_agrees_with_float():
    clf = _make_clf()
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (32, 64, 64, 3), np.uint8)
    qclf = quantize_densenet(clf, calib, calib_batch_size=16)

    images = rng.integers(0, 256, (16, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))
    got = np.asarray(qclf(jnp.asarray(images)))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    assert cos.min() > 0.98, f"logit cosine too low: {cos.min()}"
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"


def test_solver_dispatch_includes_densenet(tmp_path):
    """Solver.build_quantized routes DenseNet to the int8 path."""
    import yaml

    cfg = {
        "model": {"type": "densenet121",
                  "kwargs": {"num_classes": 10},
                  "quantize": "int8", "quantize_calib_batches": 1},
        "data": {"type": "imagenet", "read_from": "fake", "fake_size": 16,
                 "fake_num_classes": 10, "batch_size": 8, "input_size": 64,
                 "num_workers": 0,
                 "test": {"evaluator": {"type": "imagenet",
                                        "kwargs": {"topk": [1, 5]}}}},
        "saver": {"save_dir": str(tmp_path / "ck"),
                  "results_path": str(tmp_path / "results.txt.all")},
        "lr_scheduler": {"type": "CosineEpoch", "kwargs": {"max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from robustart_tpu.solvers.cls_solver import main

    metrics = main(["--config", cfg_path, "--evaluate"])
    assert "top1" in metrics
    assert sum(1 for _ in open(tmp_path / "results.txt.all")) == 16
