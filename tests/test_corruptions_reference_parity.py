"""Head-to-head corruption cross-validation against the reference's own
``corruptions.py`` (RobustART/noise/utils/imagenet_c/corruptions.py),
imported from /root/reference as a runnable oracle.

The reference module imports wand (ImageMagick) and skimage at module top;
neither is installed here. Wand is stubbed inert (only motion_blur/snow
touch it at call time — those are NOT tested head-to-head). skimage's
``filters.gaussian`` is stubbed FAITHFULLY: for float input in [0, 1] it is
exactly ``scipy.ndimage.gaussian_filter`` with mode='nearest',
truncate=4.0 applied per channel (that is what skimage itself does), so
gaussian_blur remains a true oracle. ``sk.color``/``sk.util`` are NOT
stubbed — brightness/saturate/impulse_noise are excluded rather than risk
oracle drift.

Tested head-to-head (deterministic, dependency-complete): gaussian_blur,
defocus_blur, zoom_blur, contrast, pixelate, jpeg_compression — across
severities. RNG-bearing corruptions (noise families, glass_blur, fog,
elastic, spatter) are covered by the distributional/formula tests in
tests/test_corruptions.py instead.
"""

import os
import sys
import types

import numpy as np
import pytest
from PIL import Image

REF_C = "/root/reference/RobustART/noise/utils/imagenet_c"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(REF_C, "corruptions.py")),
    reason="reference corruptions not available",
)


@pytest.fixture(scope="module")
def ref_corruptions():
    import scipy.ndimage as ndi

    # --- wand stubs (module-import only; motion_blur/snow untested) ---
    wand = types.ModuleType("wand")
    wand_image = types.ModuleType("wand.image")

    class _WandImage:  # must be subclassable (MotionImage extends it)
        def __init__(self, *a, **k):
            raise RuntimeError("wand is stubbed — motion_blur untestable")

    wand_image.Image = _WandImage
    wand_api = types.ModuleType("wand.api")

    class _Fn:  # accepts .argtypes assignment (corruptions.py:42-47)
        argtypes = None

    wand_api.library = types.SimpleNamespace(MagickMotionBlurImage=_Fn())
    wand_color = types.ModuleType("wand.color")
    for name, mod in (("wand", wand), ("wand.image", wand_image),
                      ("wand.api", wand_api), ("wand.color", wand_color)):
        sys.modules.setdefault(name, mod)

    # --- faithful skimage.filters.gaussian ---
    def sk_gaussian(image, sigma=1.0, multichannel=False):
        # skimage.filters.gaussian == scipy gaussian_filter with
        # mode='nearest', truncate=4.0; multichannel → sigma 0 on channels.
        # Input here is always float in [0,1] (img_as_float is identity).
        image = np.asarray(image, np.float64)
        if multichannel:
            sig = (sigma, sigma, 0)
        else:
            sig = sigma
        return ndi.gaussian_filter(image, sigma=sig, mode="nearest",
                                   truncate=4.0)

    skimage = types.ModuleType("skimage")
    sk_filters = types.ModuleType("skimage.filters")
    sk_filters.gaussian = sk_gaussian
    skimage.filters = sk_filters
    sys.modules.setdefault("skimage", skimage)
    sys.modules.setdefault("skimage.filters", sk_filters)

    # modern scipy removed scipy.ndimage.interpolation (corruptions.py:18)
    interp = types.ModuleType("scipy.ndimage.interpolation")
    interp.map_coordinates = ndi.map_coordinates
    sys.modules.setdefault("scipy.ndimage.interpolation", interp)

    # setuptools >= 81 removed pkg_resources (corruptions.py:21 — only
    # frost's asset lookup uses it; frost is untested here)
    pkg_res = types.ModuleType("pkg_resources")
    pkg_res.resource_filename = lambda *a: ""
    sys.modules.setdefault("pkg_resources", pkg_res)

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_corruptions_mod", os.path.join(REF_C, "corruptions.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_corruptions_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def image224():
    rng = np.random.default_rng(0)
    # smooth-ish synthetic image (pure noise is unkind to JPEG comparisons)
    yy, xx = np.mgrid[0:224, 0:224].astype(np.float32) / 224.0
    base = np.stack([
        0.5 + 0.4 * np.sin(6 * xx + 2 * yy),
        0.5 + 0.4 * np.cos(4 * yy),
        0.5 + 0.4 * np.sin(3 * xx * yy + 1.0),
    ], -1)
    img = np.clip(base + rng.normal(0, 0.05, (224, 224, 3)), 0, 1)
    return (img * 255).astype(np.uint8)


DETERMINISTIC = ["gaussian_blur", "defocus_blur", "zoom_blur", "contrast",
                 "pixelate", "jpeg_compression"]


@pytest.mark.parametrize("severity", [1, 3, 5])
@pytest.mark.parametrize("name", DETERMINISTIC)
def test_deterministic_corruption_matches_reference(ref_corruptions,
                                                    image224, name,
                                                    severity):
    from robustart_tpu.noise.corruptions import corrupt

    ref_fn = getattr(ref_corruptions, name)
    # the reference functions take a PIL image (corrupt() passes one) and
    # return float*255 (uint8 for jpeg/pixelate); its pipeline truncates to
    # uint8 via np.uint8 (reference imagenet_c/__init__.py) — apply the
    # same truncation and demand (near-)exact agreement
    ref_out = np.uint8(ref_fn(Image.fromarray(image224), severity=severity))
    got = np.asarray(
        corrupt(image224, severity=severity, corruption_name=name)
    )
    assert got.shape == ref_out.shape
    diff = np.abs(got.astype(np.int32) - ref_out.astype(np.int32))
    # ±1 level allowed only where float math sits on a quantization
    # boundary (our f32 device math vs the reference's f64/PIL fixed-point;
    # defocus severity-1's tiny alias kernel sits on boundaries most often)
    assert diff.max() <= 1, (name, severity, diff.max())
    assert (diff > 0).mean() < 0.05, (name, severity, (diff > 0).mean())
