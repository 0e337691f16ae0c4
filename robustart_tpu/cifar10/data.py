"""CIFAR-10/100 data loading (reference cifar10/code/dataloader.py).

Reads the standard CIFAR python-pickle batches from ``--data_dir`` (the
``cifar-10-batches-py`` / ``cifar-100-python`` layouts). ``dataset=fake``
synthesizes a small deterministic set for tests (no download — this
environment has zero egress).

Transforms: train = pad-4 random crop + horizontal flip + optional
AutoAugment/RandAugment; test = identity. Normalization happens on device
(mean/std per dataset, reference utils.py:135-152).
"""

from __future__ import annotations

import os
import os.path as osp
import pickle
import random

import numpy as np
from PIL import Image

from robustart_tpu.cifar10.aug import CIFAR10Policy, RandAugment

DATASET_STATS = {
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010), 10),
    "cifar100": ((0.5070, 0.4865, 0.4409), (0.2673, 0.2564, 0.2761), 100),
    "imagenette": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225), 10),
    "fake": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25), 10),
}


def _load_cifar10(data_dir):
    base = osp.join(data_dir, "cifar-10-batches-py")
    xs, ys = [], []
    for i in range(1, 6):
        with open(osp.join(base, f"data_batch_{i}"), "rb") as f:
            d = pickle.load(f, encoding="bytes")
        xs.append(d[b"data"])
        ys += list(d[b"labels"])
    train_x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    with open(osp.join(base, "test_batch"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    test_x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return (train_x, np.array(ys)), (test_x, np.array(d[b"labels"]))


def _load_cifar100(data_dir):
    base = osp.join(data_dir, "cifar-100-python")
    with open(osp.join(base, "train"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    train_x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    train_y = np.array(d[b"fine_labels"])
    with open(osp.join(base, "test"), "rb") as f:
        d = pickle.load(f, encoding="bytes")
    test_x = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return (train_x, train_y), (test_x, np.array(d[b"fine_labels"]))


def _fake(n_train=256, n_test=64, num_classes=10, seed=0):
    rng = np.random.default_rng(seed)
    def make(n, off):
        y = np.arange(n) % num_classes
        x = np.zeros((n, 32, 32, 3), np.uint8)
        for i in range(n):
            r = np.random.default_rng(seed * 100003 + off + i)
            small = r.integers(0, 256, (4, 4, 3), np.uint8)
            x[i] = np.asarray(Image.fromarray(small).resize((32, 32), Image.BILINEAR))
        return x, y
    return make(n_train, 0), make(n_test, 10**6)


def load_dataset(dataset: str, data_dir: str = "./data"):
    if dataset == "cifar10":
        return _load_cifar10(data_dir)
    if dataset == "cifar100":
        return _load_cifar100(data_dir)
    if dataset == "fake":
        return _fake()
    raise ValueError(f"unsupported dataset {dataset!r} (no download possible)")


def augment_batch(images_u8: np.ndarray, aug: str, rng: random.Random) -> np.ndarray:
    """pad-4 random crop + flip (+ policy aug) per image, host-side."""
    out = np.empty_like(images_u8)
    policy = None
    if aug == "autoaug":
        policy = CIFAR10Policy(seed=rng.randint(0, 2**31))
    elif aug == "randaug":
        policy = RandAugment(seed=rng.randint(0, 2**31))
    for i, img in enumerate(images_u8):
        padded = np.pad(img, ((4, 4), (4, 4), (0, 0)), mode="reflect")
        y0 = rng.randint(0, 8)
        x0 = rng.randint(0, 8)
        crop = padded[y0 : y0 + 32, x0 : x0 + 32]
        if rng.random() < 0.5:
            crop = crop[:, ::-1]
        if policy is not None:
            crop = np.asarray(policy(Image.fromarray(crop)))
        out[i] = crop
    return out


def iterate_batches(x, y, batch_size, shuffle=False, seed=0, epoch=0,
                    aug=None):
    n = len(x)
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(np.random.SeedSequence([seed, epoch])).shuffle(idx)
    rng = random.Random((seed + 1) * (epoch + 1))
    for lo in range(0, n - (n % batch_size if shuffle else 0), batch_size):
        sel = idx[lo : lo + batch_size]
        xb = x[sel]
        if aug and aug != "none":
            xb = augment_batch(xb, aug, rng)
        yield xb, y[sel]
