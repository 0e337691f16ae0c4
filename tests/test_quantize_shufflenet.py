"""int8 PTQ for ShuffleNetV2: calib-graph exactness + int8-vs-float
agreement (robustart_tpu/models/quantize_shufflenet.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize_shufflenet import (
    _fold_all,
    _forward,
    _spec,
    quantize_shufflenet,
)


def _make_clf(name="shufflenet_v2_x0_5"):
    clf = create_classifier(name, rng=0, input_size=64)
    rng = np.random.default_rng(1)

    def jitter(path, leaf):
        key = "/".join(str(p.key) for p in path)
        if key.endswith("mean"):
            return leaf + jnp.asarray(rng.normal(0, 0.1, leaf.shape), leaf.dtype)
        if key.endswith("var"):
            return leaf * jnp.asarray(rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype)
        return leaf

    stats = jax.tree_util.tree_map_with_path(jitter, clf.variables["batch_stats"])
    clf.variables = {"params": clf.variables["params"], "batch_stats": stats}
    return clf


def test_calib_graph_matches_flax_forward():
    """BN fold + the split/concat/shuffle walk reproduce the flax eval
    forward exactly (models/shufflenet.py ShuffleUnit, both strides)."""
    clf = _make_clf()
    folded = _fold_all(clf.variables, clf.module)
    units = _spec(clf.module)
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got, amax = _forward(folded, units, normalize_01(x01, clf.mean, clf.std))
    np.testing.assert_allclose(
        np.asarray(got), ref, rtol=2e-3, atol=1e-5 * np.abs(ref).max()
    )
    needed = {"stem", "conv5"} | {u.name for u in units}
    assert needed <= set(amax), needed - set(amax)


def test_int8_agrees_with_float():
    clf = _make_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    q = quantize_shufflenet(clf, calib, calib_batch_size=4)
    assert q.name.endswith("@int8")

    images = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf(x01))
    got = np.asarray(q(images))
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree >= 0.75, agree
    cos = np.sum(got * ref, -1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() > 0.98, cos


def test_solver_dispatch():
    """model.quantize: int8 on a shufflenet config swaps the eval fn
    (solvers/base.py::build_quantized)."""
    from robustart_tpu.core.config import Config
    from robustart_tpu.data import build_dataloader
    from robustart_tpu.solvers.cls_solver import ClsSolver

    cfg = Config({
        "model": {"type": "shufflenet_v2_x0_5", "kwargs": {},
                  "quantize": "int8", "quantize_calib_batches": 1},
        "data": {
            "type": "imagenet", "read_from": "fake", "batch_size": 4,
            "num_workers": 0, "input_size": 64, "test_resize": 72,
            "train": {"sampler": {"type": "distributed_iteration"}},
            "test": {"limit_samples": 8},
        },
        "saver": {"print_freq": 1, "val_freq": 100},
        "lr_scheduler": {"type": "CosineEpoch", "kwargs": {
            "base_lr": 0.1, "warmup_lr": 0.1, "warmup_epoch": 0,
            "max_epoch": 1, "min_lr": 0.0}},
        "optimizer": {"type": "SGD", "kwargs": {"momentum": 0.9}},
    })
    solver = ClsSolver(cfg, evaluate_only=True)
    solver.build_model(seed=0)
    loader = build_dataloader(cfg.data, "test", 0, 1, seed=0)
    assert solver.maybe_quantize(loader)
    batch = next(iter(loader))
    logits = solver.eval_fn()(solver.classifier.variables,
                              jnp.asarray(np.asarray(batch.image)))
    assert logits.shape[-1] == 1000
