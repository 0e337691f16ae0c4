"""Severity-constant parity: the per-severity parameter tables must match the
reference corruption definitions verbatim (corruptions.py:122-427)."""

import inspect

from robustart_tpu.noise.corruptions import jax_kernels as K


def _consts(fn):
    src = inspect.getsource(fn)
    return src


def test_noise_severity_tables():
    assert "[0.08, 0.12, 0.18, 0.26, 0.38]" in _consts(K.gaussian_noise)
    assert "[60, 25, 12, 5, 3]" in _consts(K.shot_noise)
    assert "[0.03, 0.06, 0.09, 0.17, 0.27]" in _consts(K.impulse_noise)
    assert "[0.15, 0.2, 0.35, 0.45, 0.6]" in _consts(K.speckle_noise)


def test_blur_severity_tables():
    assert "[1, 2, 3, 4, 6]" in _consts(K.gaussian_blur_c)
    assert "(0.7, 1, 2)" in _consts(K.glass_blur)
    assert "(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)" in _consts(
        K.defocus_blur
    )
    assert "(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)" in _consts(
        K.motion_blur_c
    )


def test_weather_digital_severity_tables():
    assert "(1.5, 2), (2.0, 2), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)" in _consts(K.fog)
    assert "(1, 0.4)" in _consts(K.frost) and "(0.6, 0.75)" in _consts(K.frost)
    assert "[0.4, 0.3, 0.2, 0.1, 0.05]" in _consts(K.contrast)
    assert "[0.1, 0.2, 0.3, 0.4, 0.5]" in _consts(K.brightness)
    assert "(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)" in _consts(K.saturate)
    assert "[0.6, 0.5, 0.4, 0.3, 0.25]" in _consts(K.pixelate)
    # elastic keeps the reference's documented 244 quirk
    assert "244 * 2" in _consts(K.elastic_transform)


def test_jpeg_quality_table():
    import inspect

    from robustart_tpu.noise import corruptions

    src = inspect.getsource(corruptions.jpeg_compression_host)
    assert "[25, 18, 15, 10, 7]" in src
