"""Evaluator tests with golden values computed from the reference formulas."""

import json
import os

import numpy as np
import pytest

from robustart_tpu.metrics import (
    AdvRobustEvaluator,
    ImageNetCEvaluator,
    ImageNetEvaluator,
    ImageNetOEvaluator,
    ImageNetPEvaluator,
    ImageNetSEvaluator,
    WorstCaseAdvRobustEvaluator,
    calibration_tools,
    mean_corruption_error,
    topk_accuracy,
)


def _write_cls_results(path, scores, labels):
    with open(path, "w") as f:
        for s, l in zip(scores, labels):
            f.write(json.dumps({"score": list(map(float, s)), "label": int(l)}) + "\n")


def test_topk_accuracy_golden():
    scores = np.array(
        [
            [0.1, 0.9, 0.0, 0.0],  # pred 1
            [0.8, 0.1, 0.05, 0.05],  # pred 0
            [0.2, 0.3, 0.4, 0.1],  # pred 2
            [0.25, 0.25, 0.2, 0.3],  # pred 3
        ]
    )
    labels = [1, 1, 2, 0]
    acc = topk_accuracy(scores, labels, topk=(1, 2))
    assert acc["top1"] == 50.0
    # top2 preds: {1,0},{0,1},{2,1},{3,0} -> correct: 1,1,2? yes, 0 in {3,0}
    assert acc["top2"] == 100.0


def test_imagenet_c_evaluator_writes_metric(tmp_path):
    res_file = str(tmp_path / "results.txt.all")
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(20, 10))
    labels = np.argmax(scores, axis=1)
    labels[:5] = (labels[:5] + 1) % 10  # 5 wrong -> 75% top1
    _write_cls_results(res_file, scores, labels)

    metric = ImageNetCEvaluator(topk=[1, 5]).eval(res_file)
    assert metric.metric["top1"] == 75.0
    assert metric.cmp_key == "top1"
    metric_file = str(tmp_path / "metric")
    assert os.path.exists(metric_file)
    assert json.load(open(metric_file))["top1"] == 75.0


def test_imagenet_evaluator(tmp_path):
    res_file = str(tmp_path / "r.txt")
    scores = np.eye(10)[np.arange(10)]
    _write_cls_results(res_file, scores, np.arange(10))
    m = ImageNetEvaluator().eval(res_file)
    assert m.metric["top1"] == 100.0 and m.metric["top5"] == 100.0


def test_imagenet_p_flip_rate(tmp_path):
    res_file = str(tmp_path / "p.txt")
    with open(res_file, "w") as f:
        f.write(json.dumps({"predictions": [1, 1, 2, 2]}) + "\n")  # 1 flip / 3
        f.write(json.dumps({"predictions": [3, 3, 3, 3]}) + "\n")  # 0 flips
    ev = ImageNetPEvaluator()
    out = ev.eval(res_file, perturbation="gaussian_blur")
    assert out["gaussian_blur"] == pytest.approx((1 / 3 + 0) / 2)

    # 'noise' perturbations: every frame compared to frame 0
    out2 = ev.eval(res_file, perturbation="gaussian_noise")
    assert out2["gaussian_noise"] == pytest.approx((2 / 3 + 0) / 2)
    assert ev.get_mean()["Mean"] == pytest.approx((1 / 3 / 2 + 2 / 3 / 2) / 2)


def test_imagenet_s_mean_std(tmp_path):
    ev = ImageNetSEvaluator()
    for i, (dec, rt) in enumerate([("pil", "pil-bilinear"), ("opencv", "opencv-area")]):
        res_file = str(tmp_path / f"s{i}.txt")
        scores = np.eye(4)[np.arange(4)]
        labels = np.arange(4)
        if i == 1:
            labels = (labels + 1) % 4  # 0% accuracy
        _write_cls_results(res_file, scores, labels)
        ev.eval(res_file, decoder_type=dec, resize_type=rt)
    assert ev.get_mean()["Mean"] == 50.0
    assert ev.get_std()["Std."] == 50.0


def test_imagenet_o_aupr(tmp_path):
    fin = str(tmp_path / "in.txt")
    fout = str(tmp_path / "out.txt")
    rng = np.random.default_rng(0)
    with open(fin, "w") as f:
        conf = list(rng.uniform(0.8, 1.0, size=50))
        f.write(json.dumps({"confidence": conf, "correct": [1] * 50,
                            "num_correct": 50}) + "\n")
    with open(fout, "w") as f:
        conf = list(rng.uniform(0.0, 0.4, size=50))
        f.write(json.dumps({"confidence": conf, "correct": [0] * 50,
                            "num_correct": 0}) + "\n")
    res = ImageNetOEvaluator().eval(res_file_in=fin, res_file_out=fout)
    # perfectly separated -> AUPR = 100
    assert res["AUPR"] == pytest.approx(100.0)


def _write_pred_label(path, preds, labels):
    with open(path, "w") as f:
        for p, l in zip(preds, labels):
            f.write(json.dumps({"prediction": int(p), "label": int(l)}) + "\n")


def test_ar_evaluator(tmp_path):
    clean = str(tmp_path / "clean.txt")
    adv = str(tmp_path / "adv.txt")
    labels = [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]
    clean_preds = [0, 1, 2, 3, 4, 5, 6, 7, 0, 0]  # 8 correct
    adv_preds = [0, 1, 2, 3, 0, 0, 0, 0, 0, 0]  # 4 of those survive
    _write_pred_label(clean, clean_preds, labels)
    _write_pred_label(adv, adv_preds, labels)
    ar = AdvRobustEvaluator().eval(clean, adv, num_samples=10)
    assert ar == pytest.approx(50.0)


def test_wcar_evaluator(tmp_path):
    clean = str(tmp_path / "clean.txt")
    a1 = str(tmp_path / "a1.txt")
    a2 = str(tmp_path / "a2.txt")
    labels = [0, 1, 2, 3]
    _write_pred_label(clean, [0, 1, 2, 3], labels)  # all correct
    _write_pred_label(a1, [0, 1, 0, 0], labels)  # 2 survive
    _write_pred_label(a2, [0, 0, 2, 0], labels)  # 2 survive, only idx0 in both
    wcar = WorstCaseAdvRobustEvaluator().eval(clean, [a1, a2], num_samples=4)
    assert wcar == pytest.approx(25.0)


def test_calibration_tools():
    rng = np.random.default_rng(0)
    n = 1000
    conf = rng.uniform(0.5, 1.0, n)
    correct = (rng.uniform(0, 1, n) < conf).astype(float)  # well calibrated
    err_calibrated = calibration_tools.calib_err(conf, correct, p="2")
    err_off = calibration_tools.calib_err(conf, np.zeros(n), p="2")
    assert err_calibrated < 0.1 < err_off

    assert 0.0 <= calibration_tools.aurra(conf, correct) <= 1.0

    # temperature tuning: logits scaled by 2 should tune T near 2
    logits = rng.normal(size=(500, 10))
    labels = np.argmax(logits + rng.normal(scale=2.0, size=(500, 10)), axis=1)
    t1 = calibration_tools.tune_temp(logits, labels)
    t2 = calibration_tools.tune_temp(logits * 2.0, labels)
    assert t2 > t1  # hotter logits need more cooling


def test_get_measures_separated():
    pos = np.linspace(0.6, 1.0, 100)
    neg = np.linspace(0.0, 0.4, 100)
    auroc, aupr, fpr = calibration_tools.get_measures(pos, neg)
    assert auroc == 1.0 and aupr == 1.0 and fpr == 0.0


def test_mce_normalization():
    per_corr = {"gaussian_noise": 50.0, "fog": 50.0}
    mce = mean_corruption_error(per_corr, normalize_alexnet=True)
    expected = np.mean([0.5 / 0.886428, 0.5 / 0.819324]) * 100
    assert mce == pytest.approx(expected)
    assert mean_corruption_error(per_corr, normalize_alexnet=False) == 50.0
