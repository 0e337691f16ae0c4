"""AutoAugment + RandAugment policies (host-side, PIL).

Re-implements the reference's vendored augmentation policies
(reference cifar10/code/aug/autoaugment.py — ``CIFAR10Policy`` /
``ImageNetPolicy`` — and aug/randomaug.py ``RandAugment(n, m)``): the same op
vocabulary (shear/translate/rotate/color/posterize/solarize/contrast/
sharpness/brightness/autocontrast/equalize/invert) with the published
per-policy (op, probability, magnitude) pairs.
"""

from __future__ import annotations

import random

import numpy as np
from PIL import Image, ImageEnhance, ImageOps

_MAX_LEVEL = 10


def _shear_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, mag, 0, 0, 1, 0))


def _shear_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, mag, 1, 0))


def _translate_x(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, mag * img.size[0], 0, 1, 0))


def _translate_y(img, mag):
    return img.transform(img.size, Image.AFFINE, (1, 0, 0, 0, 1, mag * img.size[1]))


def _rotate(img, mag):
    return img.rotate(mag)


OPS = {
    "shearX": (_shear_x, 0.3),
    "shearY": (_shear_y, 0.3),
    "translateX": (_translate_x, 150 / 331),
    "translateY": (_translate_y, 150 / 331),
    "rotate": (_rotate, 30),
    "color": (lambda im, m: ImageEnhance.Color(im).enhance(1 + m), 0.9),
    "posterize": (lambda im, m: ImageOps.posterize(im, max(1, int(m))), 4),
    "solarize": (lambda im, m: ImageOps.solarize(im, 256 - int(m)), 256),
    "contrast": (lambda im, m: ImageEnhance.Contrast(im).enhance(1 + m), 0.9),
    "sharpness": (lambda im, m: ImageEnhance.Sharpness(im).enhance(1 + m), 0.9),
    "brightness": (lambda im, m: ImageEnhance.Brightness(im).enhance(1 + m), 0.9),
    "autocontrast": (lambda im, m: ImageOps.autocontrast(im), 0),
    "equalize": (lambda im, m: ImageOps.equalize(im), 0),
    "invert": (lambda im, m: ImageOps.invert(im), 0),
}


def _apply(img, name, prob, level, rng):
    if rng.random() > prob:
        return img
    fn, max_mag = OPS[name]
    mag = level / _MAX_LEVEL * max_mag
    if name in ("shearX", "shearY", "translateX", "translateY", "rotate",
                "color", "contrast", "sharpness", "brightness"):
        if rng.random() > 0.5:
            mag = -mag
    return fn(img, mag)


# (op, prob, level) pairs per sub-policy — published CIFAR-10 AutoAugment
CIFAR10_SUBPOLICIES = [
    [("invert", 0.1, 7), ("contrast", 0.2, 6)],
    [("rotate", 0.7, 2), ("translateX", 0.3, 9)],
    [("sharpness", 0.8, 1), ("sharpness", 0.9, 3)],
    [("shearY", 0.5, 8), ("translateY", 0.7, 9)],
    [("autocontrast", 0.5, 8), ("equalize", 0.9, 2)],
    [("shearY", 0.2, 7), ("posterize", 0.3, 7)],
    [("color", 0.4, 3), ("brightness", 0.6, 7)],
    [("sharpness", 0.3, 9), ("brightness", 0.7, 9)],
    [("equalize", 0.6, 5), ("equalize", 0.5, 1)],
    [("contrast", 0.6, 7), ("sharpness", 0.6, 5)],
    [("color", 0.7, 7), ("translateX", 0.5, 8)],
    [("equalize", 0.3, 7), ("autocontrast", 0.4, 8)],
    [("translateY", 0.4, 3), ("sharpness", 0.2, 6)],
    [("brightness", 0.9, 6), ("color", 0.2, 8)],
    [("solarize", 0.5, 2), ("invert", 0.0, 3)],
    [("equalize", 0.2, 0), ("autocontrast", 0.6, 0)],
    [("equalize", 0.2, 8), ("equalize", 0.6, 4)],
    [("color", 0.9, 9), ("equalize", 0.6, 6)],
    [("autocontrast", 0.8, 4), ("solarize", 0.2, 8)],
    [("brightness", 0.1, 3), ("color", 0.7, 0)],
    [("solarize", 0.4, 5), ("autocontrast", 0.9, 3)],
    [("translateY", 0.9, 9), ("translateY", 0.7, 9)],
    [("autocontrast", 0.9, 2), ("solarize", 0.8, 3)],
    [("equalize", 0.8, 8), ("invert", 0.1, 3)],
    [("translateY", 0.7, 9), ("autocontrast", 0.9, 1)],
]


class CIFAR10Policy:
    """AutoAugment policy found on CIFAR-10 (reference autoaugment.py:59)."""

    def __init__(self, seed: int | None = None):
        self.rng = random.Random(seed) if seed is not None else random

    def __call__(self, img: Image.Image) -> Image.Image:
        sub = self.rng.choice(CIFAR10_SUBPOLICIES)
        for op, prob, level in sub:
            img = _apply(img, op, prob, level, self.rng)
        return img


class RandAugment:
    """RandAugment(n, m): n random ops at magnitude m
    (reference randomaug.py:252)."""

    def __init__(self, n: int = 2, m: int = 14, seed: int | None = None):
        self.n = n
        self.m = m
        self.rng = random.Random(seed) if seed is not None else random

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = self.rng.sample(list(OPS), k=self.n)
        for op in ops:
            img = _apply(img, op, 1.0, self.m, self.rng)
        return img
