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
    """Ranking distance kernel: per-position displacement cost of the
    composed permutation ``sigma`` (reference test_cifar_p.py:116-127
    formulas, restated vectorized; ``sigma`` may be a batch ``(..., nc)``)."""
    sigma = np.asarray(sigma)
    if mode == "top5":
        # cumulative top-5 membership: cs = [0,1,2,3,4,5,5,...]
        cs = np.cumsum([0] + [1] * 5 + [0] * (num_classes - 1 - 5))
        return np.abs(cs[:5] - cs[sigma[..., :5] - 1]).sum(axis=-1)
    if mode == "zipf":
        recip = 1.0 / np.arange(1, num_classes + 1)
        return (np.abs(recip - recip[sigma - 1]) * recip).sum(axis=-1)
    raise ValueError(f"Unknown mode: {mode}")


def ranking_dist(ranks, noise_perturbation=False, mode="top5", num_classes=10):
    """mT5D-style ranking instability over perturbation videos.

    ``ranks``: (n_vids, n_frames, num_classes) class→rank arrays. For each
    frame pair, compose the later frame's ranks with the anchor frame's
    ranking order (``perm2[argsort(perm1)]``) and sum displacement costs;
    ``noise_perturbation`` anchors every comparison at frame 0 (reference
    test_cifar_p.py:130-152 semantics, vectorized over frames and videos).
    """
    ranks = np.asarray(ranks)
    inv = np.argsort(ranks, axis=-1)
    anchor_inv = inv[:, :1] if noise_perturbation else inv[:, :-1]
    later = ranks[:, 1:]
    anchor_inv = np.broadcast_to(anchor_inv, later.shape)
    sigma = np.take_along_axis(later, anchor_inv, axis=-1)
    d = dist(sigma, mode, num_classes)  # (n_vids, n_frames-1)
    return float(d.mean(axis=1).mean()) if d.size else 0.0


def flip_prob(predictions, noise_perturbation=False):
    """Flip probability: fraction of frame pairs whose top-1 prediction
    changes; ``noise_perturbation`` compares every frame against frame 0
    (reference test_cifar_p.py:155-174 semantics, vectorized)."""
    p = np.asarray(predictions)
    anchor = p[:, :1] if noise_perturbation else p[:, :-1]
    flips = p[:, 1:] != anchor
    return float(flips.mean(axis=1).mean()) if flips.size else 0.0


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
