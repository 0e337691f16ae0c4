"""parse_transfer + inspect_ckpt tool tests."""

import json

import numpy as np

from robustart_tpu.tools.parse_transfer import build_matrix, transfer_rate


def _write(path, preds, labels):
    path.parent.mkdir(parents=True, exist_ok=True)
    with path.open("w") as f:
        for p, l in zip(preds, labels):
            f.write(json.dumps({"prediction": int(p), "label": int(l)}) + "\n")


def test_transfer_rate(tmp_path):
    labels = [0, 1, 2, 3]
    _write(tmp_path / "clean" / "results.txt.all", [0, 1, 2, 0], labels)
    # clean correct: idx 0,1,2; adv flips idx 1,2 of those
    _write(tmp_path / "adv" / "results.txt.all", [0, 0, 0, 0], labels)
    rate = transfer_rate(
        str(tmp_path / "clean" / "results.txt.all"),
        str(tmp_path / "adv" / "results.txt.all"),
    )
    import pytest
    assert rate == pytest.approx(100.0 * 2 / 3)


def test_build_matrix(tmp_path):
    labels = [0, 1]
    for src in ("a", "b"):
        for tgt in ("a", "b"):
            d = tmp_path / f"{src}_to_{tgt}"
            _write(d / "clean" / "results.txt.all", [0, 1], labels)
            flips = [0, 0] if src == tgt else [0, 1]
            _write(d / "fgsm_8" / "results.txt.all", flips, labels)
    m = build_matrix(str(tmp_path), ["a", "b"], "fgsm", "8")
    assert m["a"]["a"] == 50.0  # one of two correct flipped
    assert m["a"]["b"] == 0.0


def test_expect_lines_guard(tmp_path):
    _write(tmp_path / "clean" / "results.txt.all", [0], [0])
    _write(tmp_path / "adv" / "results.txt.all", [0], [0])
    import pytest

    with pytest.raises(ValueError):
        transfer_rate(
            str(tmp_path / "clean" / "results.txt.all"),
            str(tmp_path / "adv" / "results.txt.all"),
            expect_lines=50000,
        )


def test_inspect_ckpt(tmp_path, capsys):
    from robustart_tpu.solvers.base import save_checkpoint
    from robustart_tpu.tools.inspect_ckpt import inspect

    save_checkpoint(
        str(tmp_path / "c.msgpack"),
        {"params": {"w": np.zeros((2, 3)), "b": np.zeros((3,))}},
    )
    keys = inspect(str(tmp_path / "c.msgpack"))
    assert any("params/w" in k for k in keys)


def test_attack_utils():
    from robustart_tpu.attacks.utils import check_imgs, l2_norm, linf_norm

    x = np.zeros((2, 4, 4, 3), np.float32)
    adv = x + 0.05
    res, lo, hi, bad = check_imgs(adv, x, "Linf")
    assert abs(res - 0.05) < 1e-6 and bad == 0
    assert np.allclose(l2_norm(adv - x), np.sqrt(48 * 0.05**2))
    assert np.allclose(linf_norm(adv - x), 0.05)


def test_cifar_utils():
    from robustart_tpu.cifar10.utils import get_mean_and_std, normalize

    x = np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    back = normalize(normalize(x, "normal"), "inv")
    np.testing.assert_allclose(back, x, atol=1e-6)
    u8 = (x * 255).astype(np.uint8)
    mean, std = get_mean_and_std(u8)
    assert mean.shape == (3,) and 0.3 < mean.mean() < 0.7
