"""CIFAR-10-P evaluation CLI (reference cifar10/code/test_cifar_p.py).

Protocol: per-perturbation .npy of video sequences (n_vids, n_frames, 32, 32,
3); metrics = flip probability (reference test_cifar_p.py:155-174) and Zipf /
top5 ranking distance (:116-152), with 'noise' perturbations anchored to
frame 0. Videos are flattened (B, F, …) → (B·F, …) for one batched forward —
the efficient shape noted in SURVEY.md §3.5.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp

import numpy as np

from robustart_tpu.cifar10.eval_utils import build_model, logits_dataset
from robustart_tpu.core.logging import get_logger

logger = get_logger("robustart.cifar_p")

PERTURBATIONS = [
    "gaussian_noise", "shot_noise", "motion_blur", "zoom_blur", "snow",
    "brightness", "translate", "rotate", "tilt", "scale",
]


def dist(sigma, mode="top5", num_classes=10):
    """Ranking distance kernel (reference test_cifar_p.py:116-127)."""
    identity = np.asarray(range(1, num_classes + 1))
    if mode == "top5":
        cum_sum_top5 = np.cumsum(
            np.asarray([0] + [1] * 5 + [0] * (num_classes - 1 - 5))
        )
        return np.sum(np.abs(cum_sum_top5[:5] - cum_sum_top5[sigma - 1][:5]))
    if mode == "zipf":
        recip = 1.0 / identity
        return np.sum(np.abs(recip - recip[sigma - 1]) * recip)
    raise ValueError(f"Unknown mode: {mode}")


def ranking_dist(ranks, noise_perturbation=False, mode="top5", num_classes=10):
    result = 0.0
    step_size = 1
    for vid_ranks in ranks:
        result_for_vid = []
        for i in range(step_size):
            perm1 = vid_ranks[i]
            perm1_inv = np.argsort(perm1)
            for rank in vid_ranks[i::step_size][1:]:
                perm2 = rank
                result_for_vid.append(dist(perm2[perm1_inv], mode, num_classes))
                if not noise_perturbation:
                    perm1 = perm2
                    perm1_inv = np.argsort(perm1)
        if result_for_vid:
            result += np.mean(result_for_vid) / len(ranks)
    return result


def flip_prob(predictions, noise_perturbation=False):
    result = 0.0
    step_size = 1
    for vid_preds in predictions:
        result_for_vid = []
        for i in range(step_size):
            prev_pred = vid_preds[i]
            for pred in vid_preds[i::step_size][1:]:
                result_for_vid.append(int(prev_pred != pred))
                if not noise_perturbation:
                    prev_pred = pred
        if result_for_vid:
            result += np.mean(result_for_vid) / len(predictions)
    return result


def evaluate_perturbation(logits_fn, variables, videos, batch_size=64,
                          num_classes=10):
    """(n_vids, n_frames, 32, 32, 3) → per-video predictions + rank arrays."""
    n_vids, n_frames = videos.shape[0], videos.shape[1]
    flat = videos.reshape((-1,) + videos.shape[2:])
    logits = logits_dataset(logits_fn, variables, flat, batch_size)
    preds = logits.argmax(-1).reshape(n_vids, n_frames)
    # rank vector per frame: class rank order (1-indexed ranks by logit)
    order = (-logits).argsort(-1)
    ranks = np.empty_like(order)
    rows = np.arange(logits.shape[0])[:, None]
    ranks[rows, order] = np.arange(1, num_classes + 1)
    ranks = ranks.reshape(n_vids, n_frames, num_classes)
    return preds, ranks


def run(args) -> dict:
    _, variables, logits_fn = build_model(args.model, args.dataset, args.checkpoint)
    results = {}
    fps, zipfs, t5ds = [], [], []
    for pert in args.perturbations:
        path = osp.join(args.data_dir, f"{pert}.npy")
        if not osp.exists(path):
            logger.warning("%s not found, skipping", path)
            continue
        videos = np.load(path)
        noise = "noise" in pert
        preds, ranks = evaluate_perturbation(
            logits_fn, variables, videos, args.batch_size
        )
        fp = flip_prob(preds, noise)
        zd = ranking_dist(ranks, noise, mode="zipf")
        t5 = ranking_dist(ranks, noise, mode="top5")
        results[pert] = {"flip_prob": fp, "zipf_dist": zd, "top5_dist": t5}
        fps.append(fp), zipfs.append(zd), t5ds.append(t5)
        logger.info("%s: FP %.4f zipf %.4f top5 %.4f", pert, fp, zd, t5)
    summary = {
        "results": results,
        "mFP": float(np.mean(fps)) if fps else float("nan"),
        "mZipf": float(np.mean(zipfs)) if zipfs else float("nan"),
        "mT5D": float(np.mean(t5ds)) if t5ds else float("nan"),
    }
    logger.info("mFP %.4f mT5D %.4f", summary["mFP"], summary["mT5D"])
    if args.output:
        os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    parser = argparse.ArgumentParser(description="CIFAR-10-P evaluation")
    parser.add_argument("--model", default="ResNet18")
    parser.add_argument("--checkpoint", default=None)
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./CIFAR-10-P")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--perturbations", nargs="+", default=PERTURBATIONS)
    parser.add_argument("--output", default=None)
    return run(parser.parse_args(argv))


if __name__ == "__main__":
    main()
