"""Leaderboard aggregation test over a synthetic results tree."""

import json

import numpy as np

from robustart_tpu.tools.leaderboard import build_table, to_markdown


def _cls_results(path, n=10, correct=8, n_classes=5):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as f:
        for i in range(n):
            label = i % n_classes
            pred = label if i < correct else (label + 1) % n_classes
            score = [0.0] * n_classes
            score[pred] = 1.0
            f.write(json.dumps({"score": score, "label": label}) + "\n")


def _pred_results(path, preds, labels):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as f:
        for p, l in zip(preds, labels):
            f.write(json.dumps({"prediction": int(p), "label": int(l)}) + "\n")


def test_build_table(tmp_path):
    m = tmp_path / "resnet50"
    # clean results
    _cls_results(m / "clean" / "results.txt.all", correct=9)
    # imagenet-c summary
    (m / "imagenet-c").mkdir(parents=True)
    (m / "imagenet-c" / "summary.json").write_text(
        json.dumps({"mCE": 76.5, "mean_top1": 50.1})
    )
    # imagenet-a
    _cls_results(m / "imagenet-a_o" / "imagenet-a" / "results.txt.all", correct=3)
    # imagenet-p
    p = m / "imagenet-p" / "gaussian_noise" / "results.txt.all"
    p.parent.mkdir(parents=True)
    with p.open("w") as f:
        f.write(json.dumps({"predictions": [1, 1, 2]}) + "\n")
    # adversarial
    labels = list(range(10))
    _pred_results(m / "adv" / "r50_to_r50" / "clean" / "results.txt.all",
                  labels, labels)
    _pred_results(m / "adv" / "r50_to_r50" / "fgsm_8" / "results.txt.all",
                  [0] * 10, labels)

    table = build_table(str(tmp_path))
    row = table["resnet50"]
    assert row["clean_top1"] == 90.0
    assert row["mCE"] == 76.5
    assert row["imagenet_a_top1"] == 30.0
    assert abs(row["mFR"] - 0.5) < 1e-9
    assert row["AR"]["fgsm_8"] == 10.0  # only label 0 survives
    assert row["WCAR"] == 10.0

    md = to_markdown(table)
    assert "resnet50" in md and "76.50" in md
