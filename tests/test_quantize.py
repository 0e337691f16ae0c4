"""int8 PTQ eval path: BN-folding exactness + int8-vs-float agreement.

Golden semantics: the folded float network must reproduce the eval-mode
Flax forward exactly (same math, reassociated); the int8 network must agree
with the float network on argmax for the overwhelming majority of inputs
and keep high logit cosine similarity. Reference has no quantized path —
this is a TPU-native addition (see robustart_tpu/models/quantize.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize import (
    _calib_forward,
    _fold_all,
    _resnet_spec,
    quantize_classifier,
)


def _make_clf(name="resnet18_official", size=64):
    clf = create_classifier(name, rng=0, input_size=size)
    # randomize BN stats so folding is non-trivial (init is mean=0, var=1)
    rng = np.random.default_rng(1)

    def jitter(path, leaf):
        key = "/".join(str(p.key) for p in path)
        if key.endswith("mean"):
            return leaf + jnp.asarray(
                rng.normal(0, 0.1, leaf.shape), leaf.dtype
            )
        if key.endswith("var"):
            return leaf * jnp.asarray(
                rng.uniform(0.5, 2.0, leaf.shape), leaf.dtype
            )
        return leaf

    stats = jax.tree_util.tree_map_with_path(
        jitter, clf.variables["batch_stats"]
    )
    clf.variables = {"params": clf.variables["params"], "batch_stats": stats}
    return clf


def test_fold_matches_bn_forward():
    clf = _make_clf()
    folded, blocks, head_site = _fold_all(clf.variables, clf.module)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0

    ref_logits = clf.apply_fn(clf.variables, x01, train=False)

    from robustart_tpu.models.layers import normalize_01

    feats, _ = _calib_forward(
        folded, blocks, head_site, normalize_01(x01, clf.mean, clf.std)
    )
    fc = clf.variables["params"]["fc"]
    logits = jnp.mean(feats, axis=(1, 2)) @ fc["kernel"] + fc["bias"]
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-3, atol=2e-4)


@pytest.mark.parametrize("name", ["resnet18_official", "resnet50_official"])
def test_int8_agrees_with_float(name):
    clf = _make_clf(name)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (64, 64, 64, 3), np.uint8)
    qclf = quantize_classifier(clf, calib, calib_batch_size=32)

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


def test_float01_input_equals_uint8_input():
    clf = _make_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (32, 64, 64, 3), np.uint8)
    qclf = quantize_classifier(clf, calib, calib_batch_size=32)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    a = np.asarray(qclf(jnp.asarray(images)))
    b = np.asarray(qclf(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_array_equal(a, b)


def test_solver_int8_eval_via_config(tmp_path):
    """``model.quantize: int8`` swaps the eval forward through the solver
    surface (base.Solver.maybe_quantize) and produces a valid result file."""
    import yaml

    cfg = {
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10},
                  "quantize": "int8", "quantize_calib_batches": 1},
        "data": {"type": "imagenet", "read_from": "fake", "fake_size": 16,
                 "fake_num_classes": 10, "batch_size": 8, "input_size": 64,
                 "num_workers": 0,
                 "test": {"evaluator": {"type": "imagenet",
                                        "kwargs": {"topk": [1, 5]}}}},
        "saver": {"save_dir": str(tmp_path / "ck"),
                  "results_path": str(tmp_path / "results.txt.all"),
                  "val_freq": 1000},
        "lr_scheduler": {"type": "CosineEpoch", "kwargs": {"max_epoch": 1}},
        "optimizer": {"type": "SGD", "kwargs": {}},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    from robustart_tpu.solvers.cls_solver import main

    metrics = main(["--config", cfg_path, "--evaluate"])
    assert "top1" in metrics
    lines = open(tmp_path / "results.txt.all").read().splitlines()
    assert len(lines) == 16


def test_online_imagenet_c_int8_via_config(tmp_path):
    """``model.quantize: int8`` through the ONLINE ImageNet-C path:
    on-device corruption feeds the int8 stem grid directly."""
    from robustart_tpu.core.config import Config
    from robustart_tpu.solvers.multi_eval_solver import MultiEvalSolver

    cfg = Config({
        "model": {"type": "resnet18", "kwargs": {"num_classes": 10},
                  "quantize": "int8", "quantize_calib_batches": 1},
        "seed": 0,
        "data": {"read_from": "fake", "fake_size": 16, "fake_num_classes": 10,
                 "batch_size": 8, "num_workers": 1, "input_size": 32,
                 "test": {"sampler": {"type": "distributed"},
                           "transforms": {"type": "JUSTNORM"},
                           "imagenet_c_online": True,
                           "corruptions": ["gaussian_noise",
                                            "jpeg_compression"],
                           "severities": [1],
                           "evaluator": {"type": "imagenetc",
                                          "kwargs": {"topk": [1, 5]}}}},
        "saver": {"results_dir": str(tmp_path / "c")},
    })
    summary = MultiEvalSolver(cfg).evaluate()
    assert set(summary["top1_per_corruption"]) == {
        "gaussian_noise", "jpeg_compression"
    }
    res = tmp_path / "c" / "gaussian_noise" / "1" / "results.txt.all"
    assert sum(1 for _ in open(res)) == 16


def test_int8_refused_for_fused_transformer_families(tmp_path):
    """maybe_quantize REFUSES int8 for ViT/Swin/Mixer (the fused bf16 block
    kernels are measured faster on chip — VERDICT r4 task 6) unless
    model.quantize_force is set."""
    import pytest
    import yaml

    def make_cfg(force):
        cfg = {
            "model": {"type": "deit_tiny_b16_224",
                      "kwargs": {"num_classes": 10, "input_size": 64},
                      "quantize": "int8", "quantize_calib_batches": 1},
            "data": {"type": "imagenet", "read_from": "fake",
                     "fake_size": 8, "fake_num_classes": 10,
                     "batch_size": 8, "input_size": 64, "num_workers": 0,
                     "test": {"evaluator": {"type": "imagenet",
                                            "kwargs": {"topk": [1, 5]}}}},
            "saver": {"save_dir": str(tmp_path / "ck"),
                      "results_path": str(tmp_path / "results.txt.all"),
                      "val_freq": 1000},
            "lr_scheduler": {"type": "CosineEpoch",
                             "kwargs": {"max_epoch": 1}},
            "optimizer": {"type": "SGD", "kwargs": {}},
        }
        if force:
            cfg["model"]["quantize_force"] = True
        p = str(tmp_path / f"cfg_{force}.yaml")
        with open(p, "w") as f:
            yaml.safe_dump(cfg, f)
        return p

    from robustart_tpu.core.config import load_config
    from robustart_tpu.data import build_dataloader
    from robustart_tpu.solvers.cls_solver import ClsSolver

    solver = ClsSolver(load_config(make_cfg(False)))
    solver.build_model(seed=0)
    loader = build_dataloader(solver.cfg.data, "test", 0, 1, seed=0)
    with pytest.raises(ValueError, match="refused"):
        solver.maybe_quantize(loader)

    solver = ClsSolver(load_config(make_cfg(True)))
    solver.build_model(seed=0)
    loader = build_dataloader(solver.cfg.data, "test", 0, 1, seed=0)
    assert solver.maybe_quantize(loader)
