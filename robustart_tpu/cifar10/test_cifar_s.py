"""CIFAR-10-S system-noise evaluation CLI (reference
cifar10/code/test_cifar_s.py).

Protocol: the clean test set re-processed by resize round-trips — 3
interpolation methods (PIL bilinear / nearest / cubic) × 4 intermediate sizes
(plus the identity path), accuracy per method, and cross-method prediction
stability (flip rate + Zipf ranking distance against the identity path,
reference test_cifar_s.py:244-330).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np
from PIL import Image

from robustart_tpu.cifar10.data import DATASET_STATS, load_dataset
from robustart_tpu.cifar10.eval_utils import build_model, logits_dataset
from robustart_tpu.cifar10.test_cifar_p import dist
from robustart_tpu.core.logging import get_logger

logger = get_logger("robustart.cifar_s")

INTERPOLATIONS = {
    "bilinear": Image.BILINEAR,
    "nearest": Image.NEAREST,
    "cubic": Image.BICUBIC,
}
RESIZE_SIZES = [24, 28, 36, 40]


def process_images(images_u8: np.ndarray, interp: int, size: int) -> np.ndarray:
    """Resize 32 → size → 32 with one interpolation (system noise)."""
    out = np.empty_like(images_u8)
    for i, img in enumerate(images_u8):
        pil = Image.fromarray(img).resize((size, size), interp)
        out[i] = np.asarray(pil.resize((32, 32), interp))
    return out


def evaluate_processing_method(logits_fn, variables, images, labels,
                               batch_size, num_classes=10):
    logits = logits_dataset(logits_fn, variables, images, batch_size)
    preds = logits.argmax(-1)
    acc = float((preds == labels).mean())
    order = (-logits).argsort(-1)
    ranks = np.empty_like(order)
    rows = np.arange(len(logits))[:, None]
    ranks[rows, order] = np.arange(1, num_classes + 1)
    return acc, preds, ranks


def run(args) -> dict:
    _, variables, logits_fn = build_model(args.model, args.dataset, args.checkpoint)
    (_, _), (test_x, test_y) = load_dataset(args.dataset, args.data_dir)
    if args.limit:
        test_x, test_y = test_x[: args.limit], test_y[: args.limit]

    acc0, preds0, ranks0 = evaluate_processing_method(
        logits_fn, variables, test_x, test_y, args.batch_size
    )
    results = {"identity": {"accuracy": acc0}}
    accs = [acc0]
    flips, zipfs = [], []
    for name, interp in INTERPOLATIONS.items():
        for size in RESIZE_SIZES:
            proc = process_images(test_x, interp, size)
            acc, preds, ranks = evaluate_processing_method(
                logits_fn, variables, proc, test_y, args.batch_size
            )
            flip = float((preds != preds0).mean())
            zipf = float(
                np.mean(
                    [
                        dist(ranks[i][np.argsort(ranks0[i])], mode="zipf")
                        for i in range(len(ranks))
                    ]
                )
            )
            key = f"{name}_{size}"
            results[key] = {"accuracy": acc, "flip_vs_identity": flip,
                            "zipf_vs_identity": zipf}
            accs.append(acc)
            flips.append(flip)
            zipfs.append(zipf)
            logger.info("%s: acc %.2f%% flip %.4f zipf %.4f",
                        key, 100 * acc, flip, zipf)
    summary = {
        "results": results,
        "mean_accuracy": float(np.mean(accs)),
        "std_accuracy": float(np.std(accs)),
        "mean_flip": float(np.mean(flips)),
        "mean_zipf": float(np.mean(zipfs)),
    }
    logger.info(
        "CIFAR-10-S: mean acc %.2f%% (std %.2f) mean flip %.4f",
        100 * summary["mean_accuracy"], 100 * summary["std_accuracy"],
        summary["mean_flip"],
    )
    if args.output:
        os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser(description="CIFAR-10-S evaluation")
    parser.add_argument("--model", default="ResNet18")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--output", default=None)
    return run(parser.parse_args(argv))


if __name__ == "__main__":
    main()
