"""CIFAR suite utilities (reference cifar10/code/utils.py parity).

``normalize(x, mode, dataset)`` — the denorm/renorm helper every reference
attack call wraps around the model (utils.py:135-152); ``progress_bar`` — the
TTY training meter (utils.py:60-101); ``get_mean_and_std``; ``init_params``
is Flax-init territory and intentionally absent.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from robustart_tpu.cifar10.data import DATASET_STATS


def normalize(x, mode: str = "normal", dataset: str = "cifar10"):
    """NHWC [0,1] ↔ normalized, per-dataset stats (utils.py:135-152)."""
    mean, std, _ = DATASET_STATS[dataset]
    mean = np.asarray(mean, dtype=np.float32).reshape(1, 1, 1, 3)
    std = np.asarray(std, dtype=np.float32).reshape(1, 1, 1, 3)
    if mode == "normal":
        return (x - mean) / std
    if mode == "inv":
        return x * std + mean
    raise ValueError(f"mode must be 'normal' or 'inv', got {mode!r}")


def get_mean_and_std(images_u8: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-channel mean/std of a uint8 NHWC dataset (utils.py get_mean_and_std)."""
    x = images_u8.astype(np.float64) / 255.0
    return x.mean(axis=(0, 1, 2)), x.std(axis=(0, 1, 2))


_bar_state = {"t0": None}
TOTAL_BAR_LENGTH = 30.0


def progress_bar(current: int, total: int, msg: str | None = None) -> None:
    """TTY progress meter (reference utils.py:60-101)."""
    if current == 0 or _bar_state["t0"] is None:
        _bar_state["t0"] = time.time()
    cur_len = int(TOTAL_BAR_LENGTH * (current + 1) / total)
    rest_len = int(TOTAL_BAR_LENGTH - cur_len)
    elapsed = time.time() - _bar_state["t0"]
    line = (
        f" [{'=' * cur_len}>{'.' * rest_len}]"
        f" Tot: {elapsed:.1f}s"
        + (f" | {msg}" if msg else "")
        + f" {current + 1}/{total}"
    )
    end = "\n" if current >= total - 1 else "\r"
    sys.stdout.write(line + end)
    sys.stdout.flush()
