"""int8 PTQ for MobileNetV3: calib-graph exactness + int8-vs-float
agreement (robustart_tpu/models/quantize_mobilenet_v3.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize_mobilenet_v3 import (
    _fold_all,
    _forward,
    quantize_mobilenet_v3,
)


def _make_clf(name="mobilenet_v3_large_x1_0"):
    import jax

    clf = create_classifier(name, rng=0, input_size=64)
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


@pytest.mark.parametrize(
    "name", ["mobilenet_v3_large_x1_0", "mobilenet_v3_small_x1_0"]
)
def test_calib_graph_matches_flax_forward(name):
    """The folded-float calibration graph reproduces the flax eval forward
    exactly (BN fold is exact; SE/hardswish ordering mirror
    models/mobilenet.py:136-217), for both the large and small tables."""
    clf = _make_clf(name)
    folded, blocks, head_site = _fold_all(clf.variables, clf.module)
    qp = dict(folded)
    p = clf.variables["params"]
    qp["pre_classifier"] = {
        "w": np.asarray(p["pre_classifier"]["kernel"]),
        "b": np.asarray(p["pre_classifier"]["bias"]),
    }
    qp["classifier"] = {
        "w": np.asarray(p["classifier"]["kernel"]),
        "b": np.asarray(p["classifier"]["bias"]),
    }
    for blk in blocks:
        if not blk.use_se:
            continue
        se = p[blk.name]["SqueezeExcite_0"]
        qp[f"{blk.name}/se"] = {
            "rw": np.asarray(se["fc1"]["kernel"]),
            "rb": np.asarray(se["fc1"]["bias"]),
            "ew": np.asarray(se["fc2"]["kernel"]),
            "eb": np.asarray(se["fc2"]["bias"]),
        }
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got, amax = _forward(
        qp, blocks, head_site, normalize_01(x01, clf.mean, clf.std),
        mode="calib",
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)
    needed = (
        {"stem"}
        | {cv.site_in for b in blocks for cv in b.convs}
        | {b.site_out for b in blocks}
    )
    assert needed <= set(amax), needed - set(amax)


def test_int8_agrees_with_float():
    clf = _make_clf()
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (64, 64, 64, 3), np.uint8)
    qclf = quantize_mobilenet_v3(clf, calib, calib_batch_size=32)

    images = rng.integers(0, 256, (32, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))
    got = np.asarray(qclf(jnp.asarray(images)))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    assert cos.min() > 0.98, f"logit cosine too low: {cos.min()}"
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"


def test_solver_dispatch_includes_mobilenet_v3(tmp_path):
    """Solver.build_quantized routes MobileNetV3 to the int8 path."""
    import yaml

    cfg = {
        "model": {"type": "mobilenet_v3_large_x1_0",
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
