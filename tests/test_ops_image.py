"""Parity tests of on-device image ops vs PIL / OpenCV / scipy ground truth."""

import cv2
import numpy as np
import pytest
from PIL import Image
from scipy.ndimage import gaussian_filter

from robustart_tpu.ops.image import (
    disk_kernel,
    filter2d_same,
    gaussian_blur,
    hsv_to_rgb,
    motion_blur,
    resize,
    rgb_to_hsv,
)

PIL_MODES = {
    "pil-bilinear": Image.BILINEAR,
    "pil-nearest": Image.NEAREST,
    "pil-box": Image.BOX,
    "pil-hamming": Image.HAMMING,
    "pil-cubic": Image.BICUBIC,
    "pil-lanczos": Image.LANCZOS,
}
CV_MODES = {
    "opencv-nearest": cv2.INTER_NEAREST,
    "opencv-bilinear": cv2.INTER_LINEAR,
    "opencv-area": cv2.INTER_AREA,
    "opencv-cubic": cv2.INTER_CUBIC,
    "opencv-lanczos": cv2.INTER_LANCZOS4,
}


@pytest.fixture(scope="module")
def img(request):
    rng = np.random.default_rng(0)
    return rng.uniform(0, 255, size=(64, 48, 3)).astype(np.float32)


@pytest.mark.parametrize("method", sorted(PIL_MODES))
@pytest.mark.parametrize("out_size", [(32, 24), (96, 72), (224, 224)])
def test_resize_matches_pil(img, method, out_size):
    # PIL resizes float32 images ('F' mode) channel by channel
    ours = np.asarray(resize(img, out_size, method))
    ref = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, c], mode="F").resize(
                    (out_size[1], out_size[0]), PIL_MODES[method]
                )
            )
            for c in range(3)
        ],
        axis=-1,
    )
    # PIL uses fixed-point intermediate precision; tolerance covers it
    np.testing.assert_allclose(ours, ref, atol=2e-2, rtol=1e-4)


@pytest.mark.parametrize("method", ["opencv-bilinear", "opencv-area", "opencv-cubic"])
@pytest.mark.parametrize("out_size", [(32, 24), (96, 72)])
def test_resize_close_to_opencv(img, method, out_size):
    ours = np.asarray(resize(img, out_size, method))
    ref = cv2.resize(
        img, (out_size[1], out_size[0]), interpolation=CV_MODES[method]
    )
    # OpenCV uses fixed-point bilinear taps and vectorized variants; allow a
    # small pixel-value tolerance (images are 0..255 floats)
    assert np.mean(np.abs(ours - ref)) < 0.5
    assert np.max(np.abs(ours - ref)) < 8.0


def test_resize_nearest_exact_opencv(img):
    ours = np.asarray(resize(img, (32, 24), "opencv-nearest"))
    ref = cv2.resize(img, (24, 32), interpolation=cv2.INTER_NEAREST)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("sigma", [0.7, 1.0, 2.0, 4.0])
def test_gaussian_blur_matches_scipy(img, sigma):
    x = img / 255.0
    ours = np.asarray(gaussian_blur(x, sigma))
    ref = np.stack(
        [gaussian_filter(x[:, :, c], sigma, mode="nearest") for c in range(3)],
        axis=-1,
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_filter2d_matches_cv2(img):
    x = img / 255.0
    k = disk_kernel(3, 0.1)
    ours = np.asarray(filter2d_same(x, k))
    ref = np.stack(
        [cv2.filter2D(x[:, :, c], -1, k) for c in range(3)], axis=-1
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_hsv_roundtrip(img):
    x = img / 255.0
    back = np.asarray(hsv_to_rgb(rgb_to_hsv(x)))
    np.testing.assert_allclose(back, x, atol=1e-5)


def test_hsv_matches_colorsys(img):
    import colorsys

    x = (img[:4, :4] / 255.0).astype(np.float64)
    ours = np.asarray(rgb_to_hsv(x))
    for i in range(4):
        for j in range(4):
            h, s, v = colorsys.rgb_to_hsv(*x[i, j])
            np.testing.assert_allclose(ours[i, j], [h, s, v], atol=1e-5)


def test_motion_blur_basic_properties(img):
    x = img / 255.0
    out = np.asarray(motion_blur(x, radius=10, sigma=3, angle_deg=30))
    assert out.shape == x.shape
    # energy approximately preserved (weights sum to 1, replicate edges)
    assert abs(out.mean() - x.mean()) < 0.02
    # blurring reduces variance
    assert out.var() < x.var()
