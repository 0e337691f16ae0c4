"""CIFAR-10-C evaluation CLI (reference cifar10/code/test_cifar_c.py).

Protocol: per-corruption .npy of shape (50000, 32, 32, 3) — 5 severities ×
10000 — plus labels.npy; per-severity error rate, per-corruption average, and
final mean corruption error over 15 standard (+4 extra) corruptions
(reference test_cifar_c.py:157-270).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

from robustart_tpu.cifar10.eval_utils import build_model, predict_dataset
from robustart_tpu.core.logging import get_logger

logger = get_logger("robustart.cifar_c")

CORRUPTIONS = [
    "gaussian_noise", "shot_noise", "impulse_noise",
    "defocus_blur", "glass_blur", "motion_blur", "zoom_blur",
    "snow", "frost", "fog", "brightness",
    "contrast", "elastic_transform", "pixelate", "jpeg_compression",
]
EXTRA_CORRUPTIONS = ["gaussian_blur", "saturate", "spatter", "speckle_noise"]


def evaluate_corruption(logits_fn, variables, data, labels, batch_size):
    preds = predict_dataset(logits_fn, variables, data, batch_size)
    acc = float((preds == labels).mean())
    return 1.0 - acc, acc


def run(args) -> dict:
    _, variables, logits_fn = build_model(args.model, args.dataset, args.checkpoint)
    labels = np.load(osp.join(args.data_dir, "labels.npy"))
    per_sev = len(labels) // 5

    error_rates = []
    results = {}
    sets = [(args.data_dir, CORRUPTIONS)]
    extra_dir = osp.join(args.data_dir, "extra")
    if osp.exists(extra_dir):
        sets.append((extra_dir, EXTRA_CORRUPTIONS))
    for directory, names in sets:
        for corruption in names:
            path = osp.join(directory, f"{corruption}.npy")
            if not osp.exists(path):
                logger.warning("%s not found, skipping", path)
                continue
            data = np.load(path)
            severity_errors = []
            for severity in range(1, 6):
                lo, hi = (severity - 1) * per_sev, severity * per_sev
                err, _ = evaluate_corruption(
                    logits_fn, variables, data[lo:hi], labels[lo:hi],
                    args.batch_size,
                )
                severity_errors.append(err)
            avg = float(np.mean(severity_errors))
            error_rates.append(avg)
            results[corruption] = {
                "severity_errors": severity_errors, "avg_error": avg,
            }
            logger.info("%s: avg error %.2f%%", corruption, 100 * avg)
    mce = float(np.mean(error_rates)) if error_rates else float("nan")
    logger.info("Mean Corruption Error (mCE): %.2f%%", 100 * mce)
    summary = {"results": results, "mCE": mce}
    if args.output:
        os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser(description="CIFAR-10-C evaluation")
    parser.add_argument("--model", default="ResNet18")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./CIFAR-10-C")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--output", default=None)
    parser.add_argument("--device", default="tpu")  # CLI parity; unused
    return run(parser.parse_args(argv))


if __name__ == "__main__":
    main()
