"""int8 PTQ + deploy-form eval for RepVGG
(robustart_tpu/models/quantize_repvgg.py, repvgg.py::deploy_classifier)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.models import create_classifier
from robustart_tpu.models.quantize_repvgg import (
    _calib_forward,
    _repvgg_spec,
    quantize_repvgg,
)
from robustart_tpu.models.repvgg import deploy_classifier, reparameterize_params


def _make_clf(name="repvgg_A0", input_size=64):
    clf = create_classifier(name, rng=0, input_size=input_size)
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


def test_deploy_classifier_matches_train_form():
    """Re-parameterized deploy classifier reproduces train-form logits
    (repvgg.py:103 fold; upstream RepVGG deployment conversion)."""
    clf = _make_clf()
    dep = deploy_classifier(clf)
    assert dep.module.deploy and dep.name.endswith("@deploy")
    rng = np.random.default_rng(0)
    x01 = jnp.asarray(rng.uniform(0, 1, (3, 64, 64, 3)), jnp.float32)
    ref = np.asarray(clf(x01))
    got = np.asarray(dep(x01))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)
    # idempotent on an already-deployed classifier
    assert deploy_classifier(dep) is dep


def test_calib_graph_matches_flax_forward():
    """Fused-float calib graph == flax train-form forward; amax recorded at
    every relu site (quantize_repvgg.py::_calib_forward)."""
    clf = _make_clf()
    fused = reparameterize_params(clf.variables)["params"]
    blocks, head_site = _repvgg_spec(clf.module)
    fp = {
        n: {"w": jnp.asarray(b["fused"]["kernel"]), "b": jnp.asarray(b["fused"]["bias"])}
        for n, b in fused.items() if n != "linear"
    }
    fp["fc"] = {
        "kernel": jnp.asarray(fused["linear"]["kernel"]),
        "bias": jnp.asarray(fused["linear"]["bias"]),
    }
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))

    from robustart_tpu.models.layers import normalize_01

    got, amax = _calib_forward(fp, blocks, head_site, normalize_01(x01, clf.mean, clf.std))
    # random-init + jittered stats blow logits up to ~1e4; the fold is
    # float-exact so only accumulation-order rounding remains
    np.testing.assert_allclose(
        np.asarray(got), ref, rtol=2e-3, atol=1e-5 * np.abs(ref).max()
    )
    assert {"stage0"} | {b.name for b in blocks} <= set(amax)
    assert head_site == blocks[-1].name


@pytest.mark.parametrize("form", ["train", "deploy"])
def test_int8_agrees_with_float(form):
    """int8 forward tracks the float model: argmax agreement + logit cosine
    (same bar as the other six families)."""
    clf = _make_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
    src = deploy_classifier(clf) if form == "deploy" else clf
    q = quantize_repvgg(src, calib, calib_batch_size=4)
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


def test_int8_uint8_and_float_inputs_match():
    """[0,1] float inputs round onto the uint8 grid (the corruption
    pipeline's grid) and produce identical logits."""
    clf = _make_clf()
    rng = np.random.default_rng(3)
    calib = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
    q = quantize_repvgg(clf, calib, calib_batch_size=4)
    images = rng.integers(0, 256, (2, 64, 64, 3), np.uint8)
    a = np.asarray(q(jnp.asarray(images)))
    b = np.asarray(q(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_solver_deploy_and_int8_dispatch():
    """maybe_quantize on a RepVGG config deploys the fused form and swaps
    in the int8 path (solvers/base.py::maybe_deploy/build_quantized)."""
    from robustart_tpu.core.config import Config
    from robustart_tpu.solvers.cls_solver import ClsSolver

    cfg = Config({
        "model": {"type": "repvgg_A0", "kwargs": {}, "quantize": "int8",
                  "quantize_calib_batches": 1},
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
    from robustart_tpu.data import build_dataloader

    loader = build_dataloader(cfg.data, "test", 0, 1, seed=0)
    assert solver.maybe_quantize(loader)
    assert solver.classifier.module.deploy  # maybe_deploy ran first
    batch = next(iter(loader))
    logits = solver.eval_fn()(solver.classifier.variables,
                              jnp.asarray(np.asarray(batch.image)))
    assert logits.shape[-1] == 1000
