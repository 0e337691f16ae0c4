"""Deeper numeric parity: JAX corruption helpers vs the actual scipy/numpy
reference formulas at realistic sizes (SURVEY.md §7 hard-part #1)."""

import numpy as np
import pytest
from scipy.ndimage import zoom as scizoom

from robustart_tpu.noise.corruptions.jax_kernels import (
    _scizoom_2d,
    clipped_zoom,
)


@pytest.fixture(scope="module")
def img224():
    rng = np.random.default_rng(0)
    from PIL import Image

    small = rng.integers(0, 255, (16, 16, 3), np.uint8)
    return (
        np.asarray(Image.fromarray(small).resize((224, 224), Image.BILINEAR))
        .astype(np.float32) / 255.0
    )


def _ref_clipped_zoom(img, zoom_factor):
    """Reference clipped_zoom re-typed from its formula
    (corruptions.py:105-115) using the real scipy zoom."""
    h = img.shape[0]
    ch = int(np.ceil(h / float(zoom_factor)))
    top = (h - ch) // 2
    out = scizoom(
        img[top : top + ch, top : top + ch],
        (zoom_factor, zoom_factor, 1), order=1,
    )
    trim = (out.shape[0] - h) // 2
    return out[trim : trim + h, trim : trim + h]


@pytest.mark.parametrize("z", [1.01, 1.06, 1.11, 1.21, 1.31])
def test_clipped_zoom_matches_scipy(img224, z):
    ours = np.asarray(clipped_zoom(img224, z))
    ref = _ref_clipped_zoom(img224, z)
    assert ours.shape == ref.shape == img224.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_scizoom_2d_matches_scipy(img224):
    crop = img224[:100, :100]
    ours = np.asarray(_scizoom_2d(crop, 111, 111))
    ref = scizoom(crop, (1.11, 1.11, 1), order=1)
    # scipy rounds output size int(round(100*1.11)) = 111
    assert ref.shape[0] == 111
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_zoom_blur_matches_reference_formula(img224):
    from robustart_tpu.noise.corruptions.jax_kernels import zoom_blur

    factors = np.arange(1, 1.11, 0.01)  # severity 1
    ref = img224.copy()
    acc = np.zeros_like(img224)
    for z in factors:
        acc += _ref_clipped_zoom(img224, float(z))
    ref = np.clip((img224 + acc) / (len(factors) + 1), 0, 1)
    ours = np.asarray(zoom_blur(img224, None, severity=1))
    np.testing.assert_allclose(ours, ref, atol=3e-3)


def test_impulse_matches_skimage_formula(img224):
    """skimage random_noise('s&p') semantics check on marginal rates."""
    import jax

    from robustart_tpu.noise.corruptions.jax_kernels import impulse_noise

    out = np.asarray(impulse_noise(img224, jax.random.key(0), severity=5))
    c = 0.27
    frac_salt = (out == 1.0).mean()
    frac_pepper = (out == 0.0).mean()
    base_salt = (img224 >= 1.0).mean()
    base_pepper = (img224 <= 0.0).mean()
    assert abs(frac_salt - base_salt - c / 2) < 0.01
    assert abs(frac_pepper - base_pepper - c / 2) < 0.01
