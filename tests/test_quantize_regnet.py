"""int8 PTQ for RegNetX/Y: calib-graph exactness + int8-vs-float agreement
(robustart_tpu/models/quantize_regnet.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize_regnet import (
    _fold_all,
    _forward,
    quantize_regnet,
)


def _make_clf(name="regnetx_400m"):
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


@pytest.mark.parametrize("name", ["regnetx_400m", "regnety_200m"])
def test_calib_graph_matches_flax_forward(name):
    """BN fold + SE ordering reproduce the flax eval forward exactly
    (models/regnet.py XBlock; regnety exercises the SE branch)."""
    clf = _make_clf(name)
    qp, blocks = _setup_qp(clf)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got, amax = _forward(
        qp, blocks, normalize_01(x01, clf.mean, clf.std), mode="calib",
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)
    needed = {"stem"} | {b.site_out for b in blocks} | {
        f"{b.name}.a1" for b in blocks
    } | {f"{b.name}.a2" for b in blocks}
    assert needed <= set(amax), needed - set(amax)


def _setup_qp(clf):
    qp, blocks = _fold_all(clf.variables, clf.module)
    p = clf.variables["params"]
    qp["fc"] = {
        "w": np.asarray(p["fc"]["kernel"]),
        "b": np.asarray(p["fc"]["bias"]),
    }
    for blk in blocks:
        if blk.has_se:
            b = p[blk.name]
            qp[f"{blk.name}/se"] = {
                "rw": np.asarray(b["se_reduce"]["kernel"]),
                "rb": np.asarray(b["se_reduce"]["bias"]),
                "ew": np.asarray(b["se_expand"]["kernel"]),
                "eb": np.asarray(b["se_expand"]["bias"]),
            }
    return qp, blocks


def test_int8_agrees_with_float():
    clf = _make_clf()
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (64, 64, 64, 3), np.uint8)
    qclf = quantize_regnet(clf, calib, calib_batch_size=32)

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


def test_solver_dispatch_includes_regnet(tmp_path):
    import yaml

    cfg = {
        "model": {"type": "regnetx_400m",
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
