"""Offline evaluator CLI (``python -m robustart_tpu.metrics ...``).

The reference evaluators expose ``add_subparser``/``from_args`` subcommand
hooks for offline metric computation (reference
RobustART/metrics/imagenetc_evaluator.py:77-94); these tests drive every
subcommand from fixture result files and assert the metric JSON output.
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from robustart_tpu.metrics.__main__ import main as metrics_main


def _write_cls_results(path, scores, labels):
    with open(path, "w") as f:
        for s, l in zip(scores, labels):
            f.write(
                json.dumps({"score": list(map(float, s)), "label": int(l)})
                + "\n"
            )


@pytest.fixture
def cls_res(tmp_path):
    res_file = str(tmp_path / "results.txt.all")
    scores = np.eye(10)[np.arange(10)]
    labels = np.arange(10)
    labels[0] = 1  # one wrong -> 90% top1
    _write_cls_results(res_file, scores, labels)
    return res_file


def test_cli_imagenet(cls_res, capsys):
    out = metrics_main(["imagenet", "--res_file", cls_res])
    assert out[cls_res]["top1"] == 90.0
    printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert printed[cls_res]["top1"] == 90.0


def test_cli_imagenet_c_writes_metric_file(cls_res, tmp_path):
    out = metrics_main(["imagenet-c", "--res_file", cls_res])
    assert out[cls_res]["top1"] == 90.0
    metric_file = tmp_path / "metric"
    assert metric_file.exists()
    assert json.load(open(metric_file))["top1"] == 90.0


def test_cli_config_kwargs(cls_res, tmp_path):
    """--config feeds evaluator kwargs (reference from_args reads
    data.evaluator.kwargs, imagenetc_evaluator.py:88-94)."""
    import yaml

    cfg = str(tmp_path / "c.yaml")
    with open(cfg, "w") as f:
        yaml.safe_dump(
            {"data": {"evaluator": {"type": "imagenet",
                                    "kwargs": {"topk": [1, 3]}}}}, f
        )
    out = metrics_main(["imagenet", "--config", cfg, "--res_file", cls_res])
    assert set(out[cls_res]) == {"top1", "top3"}


def test_cli_imagenet_a_mean(cls_res):
    out = metrics_main(
        ["imagenet-a", "--res_file", cls_res, "--res_file", cls_res]
    )
    assert out["Mean"] == 90.0


def test_cli_imagenet_o(tmp_path):
    f_in = str(tmp_path / "in.txt")
    f_out = str(tmp_path / "out.txt")
    # perfectly separable confidences -> AUPR 100
    with open(f_in, "w") as f:
        f.write(json.dumps({"confidence": [0.9, 0.95], "correct": [1, 1],
                            "num_correct": 2}) + "\n")
    with open(f_out, "w") as f:
        f.write(json.dumps({"confidence": [0.1, 0.2], "correct": [0, 0],
                            "num_correct": 0}) + "\n")
    out = metrics_main(
        ["imagenet-o", "--res_file_in", f_in, "--res_file_out", f_out]
    )
    assert out["AUPR"] == pytest.approx(100.0)


def test_cli_imagenet_p(tmp_path):
    res_file = str(tmp_path / "p.txt")
    with open(res_file, "w") as f:
        f.write(json.dumps({"predictions": [1, 1, 2, 2]}) + "\n")
        f.write(json.dumps({"predictions": [3, 3, 3, 3]}) + "\n")
    out = metrics_main(
        ["imagenet-p", "--res_file", res_file,
         "--perturbation", "gaussian_blur"]
    )
    assert out["gaussian_blur"] == pytest.approx((1 / 3) / 2)
    assert out["Mean"] == pytest.approx((1 / 3) / 2)


def test_cli_imagenet_s(cls_res):
    out = metrics_main(
        ["imagenet-s",
         "--res_file", cls_res, "--decoder_type", "pil",
         "--resize_type", "pil-bilinear"]
    )
    assert out["pil/pil-bilinear"] == 90.0
    assert out["Mean"] == 90.0
    assert out["Std."] == 0.0


def _write_parse_lines(path, preds, labels):
    # AR parser format: first two ':'-values per line (AR_evaluator.py:13-21)
    with open(path, "w") as f:
        for p, l in zip(preds, labels):
            f.write(json.dumps({"prediction": int(p), "label": int(l)}) + "\n")


def test_cli_ar_and_wcar(tmp_path):
    clean = str(tmp_path / "clean.txt")
    adv1 = str(tmp_path / "adv1.txt")
    adv2 = str(tmp_path / "adv2.txt")
    labels = [0, 1, 2, 3]
    _write_parse_lines(clean, [0, 1, 2, 9], labels)   # 3 correct
    _write_parse_lines(adv1, [0, 1, 9, 9], labels)    # 2 of those survive
    _write_parse_lines(adv2, [0, 9, 2, 9], labels)    # 2 survive; both: 1
    out = metrics_main(["ar", "--clean_path", clean, "--adv_path", adv1])
    assert out["AR"] == pytest.approx(2 / 3 * 100)
    out = metrics_main(["wcar", "--clean_path", clean,
                        "--adv_path", adv1, "--adv_path", adv2])
    assert out["WCAR"] == pytest.approx(1 / 3 * 100)


def test_cli_subprocess_entry(cls_res):
    """The module is runnable as ``python -m robustart_tpu.metrics``."""
    proc = subprocess.run(
        [sys.executable, "-m", "robustart_tpu.metrics", "imagenet",
         "--res_file", cls_res],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    printed = json.loads(proc.stdout.strip().splitlines()[-1])
    assert printed[cls_res]["top1"] == 90.0
