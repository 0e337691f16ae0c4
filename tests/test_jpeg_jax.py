"""On-device JPEG transcode: bitwise parity vs PIL's real codec.

The reference corruption (reference corruptions.py:374-380) is a PIL JPEG
save/load at quality [25,18,15,10,7]. Entropy coding is lossless, so parity
vs PIL here IS parity vs the reference — no formula golden values needed:
the oracle is the actual libjpeg codec.
"""

import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from robustart_tpu.noise.corruptions import jpeg_compression_host
from robustart_tpu.noise.corruptions.jax_kernels import CORRUPTIONS, corrupt_batch
from robustart_tpu.noise.corruptions.jpeg_jax import (
    QUALITY_BY_SEVERITY,
    jpeg_compression,
    jpeg_roundtrip_u8,
)


def _pil_roundtrip(arr: np.ndarray, quality: int) -> np.ndarray:
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=quality)
    return np.asarray(Image.open(buf))


@pytest.mark.parametrize("severity", [1, 2, 3, 4, 5])
def test_bitwise_parity_224(severity):
    rng = np.random.default_rng(severity)
    a = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
    q = QUALITY_BY_SEVERITY[severity - 1]
    ref = _pil_roundtrip(a, q)
    got = np.asarray(jpeg_roundtrip_u8(jnp.asarray(a, jnp.int32), q))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize(
    "shape", [(36, 52), (33, 47), (17, 31), (224, 300), (50, 70), (41, 90)]
)
def test_bitwise_parity_unaligned_sizes(shape):
    """Non-multiple-of-16 sizes exercise every MCU edge-padding convention."""
    rng = np.random.default_rng(hash(shape) % 2**31)
    a = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    for q in (25, 7, 75):
        ref = _pil_roundtrip(a, q)
        got = np.asarray(jpeg_roundtrip_u8(jnp.asarray(a, jnp.int32), q))
        np.testing.assert_array_equal(got, ref, err_msg=f"quality={q}")


def test_batched_matches_host_path():
    """corrupt_batch('jpeg_compression') == the host PIL batch, bitwise."""
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 256, (4, 64, 64, 3), dtype=np.uint8)
    for severity in (1, 3, 5):
        ref = np.stack(
            [jpeg_compression_host(img, severity) for img in batch]
        )
        x01 = batch.astype(np.float32) / 255.0
        out = corrupt_batch(
            jnp.asarray(x01), jax.random.key(0), "jpeg_compression", severity
        )
        got = np.floor(np.clip(np.asarray(out), 0.0, 1.0) * 255.0).astype(
            np.uint8
        )
        np.testing.assert_array_equal(got, ref, err_msg=f"severity={severity}")


def test_registered_as_device_kernel():
    assert CORRUPTIONS["jpeg_compression"] is jpeg_compression


def test_float_boundary_is_exact():
    """u8 -> /255 f32 -> kernel round/floor boundary loses nothing."""
    u = np.arange(256, dtype=np.uint8)
    f = u.astype(np.float32) / np.float32(255.0)
    assert (np.round(f * np.float32(255.0)) == u).all()
    assert (np.floor(f * np.float32(255.0)) == u).all()


def test_gray_content_roundtrip():
    """Flat/structured content (not just noise) — catches DC-path bugs."""
    x, y = np.meshgrid(np.arange(96), np.arange(96))
    a = np.stack(
        [(x * 2) % 256, (y * 3) % 256, ((x + y) * 5) % 256], axis=-1
    ).astype(np.uint8)
    for q in QUALITY_BY_SEVERITY:
        ref = _pil_roundtrip(a, q)
        got = np.asarray(jpeg_roundtrip_u8(jnp.asarray(a, jnp.int32), q))
        np.testing.assert_array_equal(got, ref, err_msg=f"quality={q}")
