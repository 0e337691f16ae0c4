"""Generate CIFAR-10-C / CIFAR-10-P style datasets with the on-device kernels.

The reference *consumes* the published CIFAR-10-C/-P .npy archives
(cifar10/code/test_cifar_c.py:200-214, test_cifar_p.py) but ships no way to
produce them. This tool synthesizes both layouts from the clean test set
using robustart_tpu's batched corruption kernels — storage- and
download-free:

- C: per corruption, an (5·N, 32, 32, 3) uint8 .npy (severities stacked) +
  labels.npy — the exact layout test_cifar_c.py expects.
- P: per perturbation, an (N, n_frames, 32, 32, 3) uint8 .npy of sequences
  with progressively increasing severity parameter (noise perturbations:
  independent draws per frame; others: smoothly increasing strength).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import numpy as np

from robustart_tpu.cifar10.data import load_dataset
from robustart_tpu.core.logging import get_logger
from robustart_tpu.noise.corruptions import (
    CORRUPTION_ORDER,
    corrupt_batch,
    jpeg_compression_batch,
)

logger = get_logger("robustart.gen_cifar_c")

C_CORRUPTIONS = CORRUPTION_ORDER[:15]
EXTRA = CORRUPTION_ORDER[15:]
P_PERTURBATIONS = ("gaussian_noise", "shot_noise", "brightness", "zoom_blur")


def _apply(images_u8: np.ndarray, name: str, severity: int, seed: int,
           batch: int = 256) -> np.ndarray:
    if name == "jpeg_compression":
        return jpeg_compression_batch(images_u8, severity)
    out = np.empty_like(images_u8)
    key = jax.random.key(seed)
    for lo in range(0, len(images_u8), batch):
        x01 = images_u8[lo : lo + batch].astype(np.float32) / 255.0
        res = corrupt_batch(x01, jax.random.fold_in(key, lo), name, severity)
        out[lo : lo + batch] = np.floor(np.asarray(res) * 255.0).astype(np.uint8)
    return out


def generate_c(out_dir: str, images: np.ndarray, labels: np.ndarray,
               corruptions, seed: int = 0, batch: int = 256) -> None:
    os.makedirs(out_dir, exist_ok=True)
    n = len(images)
    np.save(osp.join(out_dir, "labels.npy"), np.tile(labels, 5))
    for name in corruptions:
        stacked = np.concatenate(
            [_apply(images, name, sev, seed + sev, batch) for sev in range(1, 6)]
        )
        np.save(osp.join(out_dir, f"{name}.npy"), stacked)
        logger.info("CIFAR-10-C %s: %s", name, stacked.shape)
    del n


def generate_p(out_dir: str, images: np.ndarray, perturbations,
               n_frames: int = 10, seed: int = 0, batch: int = 256) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in perturbations:
        frames = [images]
        for f in range(1, n_frames):
            # severity sweeps 1..5 smoothly across the sequence
            sev = 1 + min(4, (f * 5) // n_frames)
            frames.append(_apply(images, name, sev, seed + f * 997, batch))
        vids = np.stack(frames, axis=1)
        np.save(osp.join(out_dir, f"{name}.npy"), vids)
        logger.info("CIFAR-10-P %s: %s", name, vids.shape)


def main(argv=None):
    parser = argparse.ArgumentParser(description="generate CIFAR-10-C/P")
    parser.add_argument("--dataset", default="cifar10")
    parser.add_argument("--data_dir", default="./data")
    parser.add_argument("--out_c", default=None, help="CIFAR-10-C output dir")
    parser.add_argument("--out_p", default=None, help="CIFAR-10-P output dir")
    parser.add_argument("--corruptions", nargs="+", default=list(C_CORRUPTIONS))
    parser.add_argument("--perturbations", nargs="+",
                        default=list(P_PERTURBATIONS))
    parser.add_argument("--n_frames", type=int, default=10)
    parser.add_argument("--limit", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    (_, _), (test_x, test_y) = load_dataset(args.dataset, args.data_dir)
    if args.limit:
        test_x, test_y = test_x[: args.limit], test_y[: args.limit]
    if args.out_c:
        generate_c(args.out_c, test_x, test_y, args.corruptions, args.seed)
    if args.out_p:
        generate_p(args.out_p, test_x, args.perturbations, args.n_frames,
                   args.seed)


if __name__ == "__main__":
    main()
