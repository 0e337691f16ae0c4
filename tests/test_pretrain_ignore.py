"""saver.pretrain warm-start semantics (reference resnet50/config.yaml:69-79):
per-tensor skip patterns (ignore.model) and shape-mismatch tolerance."""

import numpy as np
import pytest

from robustart_tpu.models import create_classifier
from robustart_tpu.solvers.base import (
    apply_pretrain,
    load_pretrain_into,
    save_checkpoint,
)
from robustart_tpu.core.config import Config


def test_apply_pretrain_basic_and_ignore():
    variables = {
        "params": {
            "conv": {"kernel": np.zeros((3, 3))},
            "fc": {"kernel": np.zeros((4, 10)), "bias": np.zeros(10)},
        }
    }
    ckpt = {
        "params": {
            "conv": {"kernel": np.ones((3, 3))},
            "fc": {"kernel": np.ones((4, 10)), "bias": np.ones(10)},
        }
    }
    out = apply_pretrain(variables, ckpt, ignore_model=["fc"])
    assert np.all(np.asarray(out["params"]["conv"]["kernel"]) == 1)
    # fc skipped -> keeps init zeros (class-count-change use case)
    assert np.all(np.asarray(out["params"]["fc"]["kernel"]) == 0)


def test_apply_pretrain_shape_mismatch_tolerated():
    variables = {"params": {"fc": {"kernel": np.zeros((4, 10))}}}
    ckpt = {"params": {"fc": {"kernel": np.ones((4, 21841))}}}  # 21k head
    out = apply_pretrain(variables, ckpt)
    assert out["params"]["fc"]["kernel"].shape == (4, 10)
    assert np.all(np.asarray(out["params"]["fc"]["kernel"]) == 0)


def test_load_pretrain_into_via_saver_config(tmp_path):
    src = create_classifier("resnet18", rng=1, input_size=32, num_classes=10)
    ckpt_path = str(tmp_path / "pre.msgpack")
    save_checkpoint(ckpt_path, src.variables)

    dst = create_classifier("resnet18", rng=2, input_size=32, num_classes=10)
    before = np.asarray(dst.variables["params"]["fc"]["kernel"]).copy()
    load_pretrain_into(
        dst,
        Config({"pretrain": {"path": ckpt_path, "ignore": {"model": ["fc"]}}}),
    )
    # conv weights loaded from src
    np.testing.assert_array_equal(
        np.asarray(dst.variables["params"]["conv1_kernel"]),
        np.asarray(src.variables["params"]["conv1_kernel"]),
    )
    # fc kept at dst's init (ignored)
    np.testing.assert_array_equal(
        np.asarray(dst.variables["params"]["fc"]["kernel"]), before
    )
