"""Grad-CAM / attention rollout tool tests."""

import numpy as np
import pytest
from PIL import Image

from robustart_tpu.models import create_classifier
from robustart_tpu.tools.inference import attention_rollout, grad_cam, overlay


def test_grad_cam_resnet():
    clf = create_classifier("resnet18", rng=0, input_size=64, num_classes=10)
    x01 = np.random.default_rng(0).uniform(0, 1, (64, 64, 3)).astype(np.float32)
    cam = grad_cam(clf, x01)
    assert cam.ndim == 2
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6
    assert cam.max() > 0  # non-degenerate


def test_attention_rollout_vit():
    clf = create_classifier("deit_tiny_b16_224", rng=0, input_size=224,
                            num_classes=10)
    x01 = np.random.default_rng(0).uniform(0, 1, (224, 224, 3)).astype(np.float32)
    cam = attention_rollout(clf, x01)
    assert cam.shape == (14, 14)
    assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6


def test_overlay_shapes():
    img = np.zeros((64, 64, 3), np.uint8)
    cam = np.random.default_rng(0).uniform(0, 1, (7, 7)).astype(np.float32)
    out = overlay(img, cam)
    assert out.shape == img.shape and out.dtype == np.uint8


def test_inference_cli(tmp_path):
    import yaml

    from robustart_tpu.tools.inference import main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (80, 80, 3), np.uint8)
    ).save(img_dir / "a.png")
    cfg = {"model": {"type": "resnet18", "kwargs": {"num_classes": 10}}}
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"
    main(["--config", str(cfg_path), "-i", str(img_dir), "-o", str(out_dir)])
    assert (out_dir / "a_cam.npy").exists()
    assert (out_dir / "a_overlay.png").exists()


def test_bench_watchdog_emits_error_line_on_hang(monkeypatch, capsys):
    """bench.py's watchdog must print ONE structured zero-value JSON line
    (not hang) when the TPU path never completes (WORKLOG wedge mode)."""
    import json as _json
    import os
    import sys
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    monkeypatch.setattr(bench, "main", lambda: time.sleep(30))
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench._main_with_watchdog(budget_s=0.3)
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and exits == [1]
    row = _json.loads(out[0])
    assert row["value"] == 0 and "error" in row and row["vs_baseline"] == 0


def test_bench_watchdog_reports_exception(monkeypatch, capsys):
    import json as _json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench

    def boom():
        raise RuntimeError("relay 413")

    monkeypatch.setattr(bench, "main", boom)
    exits = []
    monkeypatch.setattr(os, "_exit", lambda code: exits.append(code))
    bench._main_with_watchdog(budget_s=5.0)
    row = _json.loads(capsys.readouterr().out.strip())
    assert row["value"] == 0 and "relay 413" in row["error"]
    assert exits == [1]
