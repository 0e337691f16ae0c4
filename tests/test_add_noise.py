"""AddNoise facade API-parity tests (reference RobustART/noise/add_noise.py)."""

import io

import numpy as np
import pytest
from PIL import Image

from robustart_tpu.noise import AddNoise, ImageTransfer, default_config, noise_list


@pytest.fixture(scope="module")
def img_file(tmp_path_factory):
    rng = np.random.default_rng(0)
    path = tmp_path_factory.mktemp("imgs") / "x.jpg"
    arr = rng.integers(0, 255, size=(300, 400, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path, "JPEG", quality=95)
    return str(path)


def test_noise_list_parity():
    assert noise_list == [
        "imagenet-s", "imagenet-c", "pgd_linf", "pgd_l2", "fgsm",
        "autoattack_linf", "mim_linf", "pgd_l1",
    ]


def test_default_config_parity():
    assert default_config["pgd_linf"] == {
        "f_model": None, "eps": 8 / 255, "rel_stepsize": 3 / 40, "steps": 20,
    }
    assert default_config["pgd_l2"]["eps"] == 8.0
    assert default_config["mim_linf"]["step_size"] == 0.002
    assert default_config["pgd_l1"]["eps"] == 1600.0
    assert default_config["autoattack_linf"]["version"] == "standard"
    assert default_config["imagenet-c"] == {
        "severity": 1, "corruption_name": None, "corruption_number": -1,
    }


def test_unknown_noise_type_rejected():
    with pytest.raises(AssertionError):
        AddNoise("nope")


def test_set_config_validates_keys():
    noise = AddNoise("imagenet-c")
    noise.set_config(severity=3, corruption_name="contrast")
    with pytest.raises(AssertionError):
        noise.set_config(bogus_key=1)


def test_path_input_rejected_for_adv():
    noise = AddNoise("fgsm")
    with pytest.raises(AssertionError):
        noise.add_noise("some/path.jpg", label=np.array([0]))


def test_imagenet_c_single_and_batch(img_file):
    noise = AddNoise("imagenet-c")
    noise.set_config(severity=2, corruption_name="gaussian_noise")
    out = noise.add_noise(img_file, seed=0)
    assert out.dtype == np.uint8 and out.ndim == 3

    batch = np.stack(
        [np.asarray(Image.open(img_file).convert("RGB").resize((64, 64)))] * 3
    )
    out_b = noise.add_noise(batch, seed=0)
    assert out_b.shape == batch.shape and out_b.dtype == np.uint8
    assert np.mean(np.abs(out_b.astype(int) - batch.astype(int))) > 1


def test_imagenet_s_decoder_resize_combos(img_file):
    noise = AddNoise("imagenet-s")
    out_pil = noise.add_noise(img_file)
    assert out_pil.shape == (224, 224, 3)

    noise.set_config(decoder_type="opencv", resize_type="opencv-bilinear")
    out_cv = noise.add_noise(img_file)
    assert out_cv.shape == (224, 224, 3)
    # decoder/resize variation is the signal: outputs must differ slightly
    assert not np.array_equal(out_pil, out_cv)


def test_imagenet_s_transfer_class(img_file):
    t = ImageTransfer(
        file_path=img_file, decoder_type="pil", resize_type="pil-lanczos",
        return_online=True, transform_type="val",
    )
    out = t.getimage()
    assert out.shape == (224, 224, 3)


def test_adv_noise_via_facade():
    from tests.test_attacks import TinyNet
    from robustart_tpu.models.classifier import init_classifier

    clf = init_classifier("tiny", TinyNet(), rng=0, input_size=16, num_classes=10)
    x = np.random.default_rng(0).uniform(size=(4, 16, 16, 3)).astype(np.float32)
    y = np.array([1, 2, 3, 4])

    noise = AddNoise("fgsm")
    noise.set_config(f_model=clf, eps=8 / 255)
    adv = noise.add_noise(x, label=y, seed=0)
    assert adv.shape == x.shape
    assert np.max(np.abs(adv - x)) <= 8 / 255 + 1e-6

    noise = AddNoise("mim_linf")
    noise.set_config(model=clf, num_steps=3)
    adv = noise.add_noise(x, label=y, seed=0)
    assert np.max(np.abs(adv - x)) <= 8 / 255 + 1e-6


def test_adv_noise_requires_model():
    noise = AddNoise("pgd_linf")
    with pytest.raises(ValueError):
        noise.add_noise(np.zeros((1, 16, 16, 3), np.float32), label=np.array([0]))


def test_imagenet_s_ffmpeg_axis_decodes_without_binary(img_file):
    """The third decoder axis must be live even with no ffmpeg binary: it
    falls back to the fast-IDCT decode, which is genuinely distinct from the
    PIL/cv2 accurate-IDCT path (reference imagenet_s_gen.py:177-220 — the
    decoder difference IS the benchmark signal)."""
    from robustart_tpu.noise.imagenet_s import (
        decode_image,
        ffmpeg_decoder_impl,
    )

    with open(img_file, "rb") as f:
        data = f.read()
    out = decode_image(data, "ffmpeg", filepath=img_file)
    pil = decode_image(data, "pil")
    assert out.shape == pil.shape and out.dtype == np.uint8
    assert ffmpeg_decoder_impl() in ("ffmpeg", "tf-fast-idct")
    # distinct decoder implementation → some pixels must differ
    assert np.mean(out.astype(int) != pil.astype(int)) > 0.01
    # ... but only by IDCT-rounding magnitudes
    assert np.abs(out.astype(int) - pil.astype(int)).max() <= 32

    bgr = decode_image(data, "ffmpeg", color_mode="BGR", filepath=img_file)
    np.testing.assert_array_equal(bgr, out[..., ::-1])
