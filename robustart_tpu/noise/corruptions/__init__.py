"""ImageNet-C corruption suite: reference-compatible dispatcher + TPU batch API.

Mirrors the reference package surface (reference
RobustART/noise/utils/imagenet_c/__init__.py:5-37):

- ``corruption_tuple`` / ``corruption_dict`` — 15 standard + 4 validation
  corruptions in the reference order.
- ``corrupt(x, severity, corruption_name, corruption_number)`` — single-image
  entry point taking a PIL image or (H, W, 3) uint8 array, returning uint8.

Plus the TPU-native fast path the reference lacks:

- ``corrupt_batch(x, key, name, severity)`` — jitted, vmapped over the batch,
  runs fully on device (robustart_tpu.noise.corruptions.jax_kernels).

All 19 corruptions run on device, including ``jpeg_compression`` (bit-exact
integer libjpeg transcode, robustart_tpu.noise.corruptions.jpeg_jax). The
PIL host path is kept as ``jpeg_compression_host`` — it is the oracle the
device kernel is asserted bitwise-equal against (tests/test_jpeg_jax.py) and
matches the reference exactly (corruptions.py:374-380).
"""

from __future__ import annotations

import io

import jax
import numpy as np
from PIL import Image

from robustart_tpu.noise.corruptions.jax_kernels import (
    CORRUPTION_ORDER,
    CORRUPTIONS,
    corrupt_batch,
)

__all__ = [
    "corruption_tuple",
    "corruption_dict",
    "corrupt",
    "corrupt_batch",
    "jpeg_compression_host",
    "CORRUPTION_ORDER",
]


def jpeg_compression_host(x: np.ndarray, severity: int = 1) -> np.ndarray:
    """JPEG round-trip at reference quality levels (corruptions.py:374-380)."""
    quality = [25, 18, 15, 10, 7][severity - 1]
    img = Image.fromarray(np.asarray(x, dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return np.asarray(Image.open(buf), dtype=np.uint8)


def jpeg_compression_batch(x: np.ndarray, severity: int = 1) -> np.ndarray:
    """Host-side batched JPEG (B, H, W, 3) uint8 → uint8."""
    return np.stack([jpeg_compression_host(img, severity) for img in x])


_rng = np.random.default_rng()


def corrupt(
    x,
    severity: int = 1,
    corruption_name: str | None = None,
    corruption_number: int = -1,
    seed: int | None = None,
) -> np.ndarray:
    """Single-image corruption with the reference call signature.

    :param x: PIL image or (H, W, 3) uint8/float array.
    :param severity: 1-5.
    :param corruption_name: one of ``corruption_tuple`` names.
    :param corruption_number: index into the reference order (0-18).
    :param seed: optional RNG seed for reproducibility (extension — the
        reference uses the global numpy RNG state).
    :return: (H, W, 3) uint8 array.
    """
    if corruption_name is None:
        if corruption_number == -1:
            raise ValueError(
                "Either corruption_name or corruption_number must be passed"
            )
        corruption_name = CORRUPTION_ORDER[corruption_number]
    if corruption_name not in CORRUPTION_ORDER:
        raise KeyError(f"unknown corruption {corruption_name!r}")

    arr = np.asarray(x)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)

    if corruption_name == "jpeg_compression":
        return jpeg_compression_host(arr, severity)

    x01 = arr.astype(np.float32) / 255.0
    key = jax.random.key(int(seed) if seed is not None else int(_rng.integers(2**31)))
    out = corrupt_batch(x01[None], key, corruption_name, severity)[0]
    # reference returns np.uint8(result) — a truncating cast from [0,255]
    return np.asarray(np.floor(np.asarray(out) * 255.0), dtype=np.uint8)


def _make_named(name: str):
    def fn(x, severity: int = 1):
        return corrupt(x, severity=severity, corruption_name=name)

    fn.__name__ = name
    return fn


corruption_tuple = tuple(_make_named(n) for n in CORRUPTION_ORDER)
corruption_dict = {fn.__name__: fn for fn in corruption_tuple}
