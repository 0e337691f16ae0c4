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
