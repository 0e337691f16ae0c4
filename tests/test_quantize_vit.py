"""int8 ViT PTQ eval path (robustart_tpu/models/quantize_vit.py):
float-graph exactness + int8-vs-float agreement."""

import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.classifier import init_classifier
from robustart_tpu.models.quantize_vit import _forward, quantize_vit
from robustart_tpu.models.vit import VisionTransformer


def _mini_clf():
    module = VisionTransformer(
        patch_size=8, embed_dim=64, depth=2, num_heads=4, num_classes=10,
        dropout=0.0, attention_dropout=0.0, drop_path=0.0,
    )
    return init_classifier("vit_mini", module, rng=0, input_size=32)


def test_calib_graph_matches_flax_forward():
    clf = _mini_clf()
    qclf = quantize_vit(
        clf, np.zeros((1, 32, 32, 3), np.uint8), calib_batch_size=1
    )
    # rebuild float-weight params (quantize_vit mutated block entries)
    p = clf.variables["params"]
    qp = dict(qclf.qparams)
    for i in range(2):
        blk = p[f"block{i}"]
        qp[f"block{i}/attn/qkv"] = {
            "w": np.asarray(blk["attn"]["qkv"]["kernel"]),
            "b": np.asarray(blk["attn"]["qkv"]["bias"]),
        }
        qp[f"block{i}/attn/proj"] = {
            "w": np.asarray(blk["attn"]["proj"]["kernel"]),
            "b": np.asarray(blk["attn"]["proj"]["bias"]),
        }
        qp[f"block{i}/mlp/fc1"] = {
            "w": np.asarray(blk["mlp"]["fc1"]["kernel"]),
            "b": np.asarray(blk["mlp"]["fc1"]["bias"]),
        }
        qp[f"block{i}/mlp/fc2"] = {
            "w": np.asarray(blk["mlp"]["fc2"]["kernel"]),
            "b": np.asarray(blk["mlp"]["fc2"]["bias"]),
        }

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    ref = np.asarray(clf.apply_fn(clf.variables, jnp.asarray(x), train=False))

    from robustart_tpu.models.layers import normalize_01

    got, _ = _forward(
        qp, (2, 4, (8, 8)), normalize_01(jnp.asarray(x), clf.mean, clf.std),
        mode="calib", pallas=False,
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=1e-4)


def test_int8_vit_agrees_with_float():
    clf = _mini_clf()
    rng = np.random.default_rng(1)
    calib = rng.integers(0, 256, (64, 32, 32, 3), np.uint8)
    qclf = quantize_vit(clf, calib, calib_batch_size=32)

    images = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    x01 = jnp.asarray(images, jnp.float32) / 255.0
    ref = np.asarray(clf.apply_fn(clf.variables, x01, train=False))
    got = np.asarray(qclf(jnp.asarray(images)))

    cos = np.sum(ref * got, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(got, axis=-1) + 1e-12
    )
    assert cos.min() > 0.98, f"logit cosine too low: {cos.min()}"
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree >= 0.9, f"argmax agreement {agree}"


def test_uint8_and_float01_inputs_equal():
    clf = _mini_clf()
    rng = np.random.default_rng(2)
    calib = rng.integers(0, 256, (32, 32, 32, 3), np.uint8)
    qclf = quantize_vit(clf, calib, calib_batch_size=32)
    images = rng.integers(0, 256, (4, 32, 32, 3), np.uint8)
    a = np.asarray(qclf(jnp.asarray(images)))
    b = np.asarray(qclf(jnp.asarray(images, jnp.float32) / 255.0))
    np.testing.assert_array_equal(a, b)
