"""Checkpoint backend tests: msgpack, orbax, auto-resume discovery."""

import numpy as np
import pytest

from robustart_tpu.solvers.checkpointing import (
    latest_checkpoint,
    load_any,
    load_orbax,
    save_any,
    save_orbax,
)


@pytest.fixture()
def payload():
    return {
        "variables": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "extra": {"epoch": 3},
    }


def test_msgpack_roundtrip(tmp_path, payload):
    path = str(tmp_path / "ckpt.msgpack")
    save_any(path, payload)
    loaded = load_any(path)
    np.testing.assert_array_equal(
        loaded["variables"]["params"]["w"], payload["variables"]["params"]["w"]
    )
    assert loaded["extra"]["epoch"] == 3


def test_orbax_roundtrip(tmp_path, payload):
    d = str(tmp_path / "orbax")
    path = save_orbax(d, 7, payload)
    assert path.endswith("step_7")
    loaded = load_orbax(path)
    np.testing.assert_array_equal(
        loaded["variables"]["params"]["w"], payload["variables"]["params"]["w"]
    )


def test_latest_checkpoint_discovery(tmp_path, payload):
    d = str(tmp_path / "ckpts")
    assert latest_checkpoint(d) is None
    save_orbax(d, 1, payload)
    save_orbax(d, 12, payload)
    save_orbax(d, 3, payload)
    latest = latest_checkpoint(d)
    assert latest.endswith("step_12")
    loaded = load_any(latest)
    assert loaded["extra"]["epoch"] == 3


def test_latest_checkpoint_msgpack(tmp_path, payload):
    d = tmp_path / "m"
    d.mkdir()
    save_any(str(d / "a.msgpack"), payload)
    import time

    time.sleep(0.05)
    save_any(str(d / "b.msgpack"), payload)
    assert latest_checkpoint(str(d)).endswith("b.msgpack")


def test_newest_checkpoint_prefers_msgpack_by_mtime(tmp_path):
    """--ckpt-filePath <dir> must pick the newest TRAINED checkpoint: own
    msgpack saves win over stray torch warm-start files, and recency is by
    mtime (lexicographic order ranks ckpt_e9 after ckpt_e10 and .pth after
    .msgpack)."""
    import os
    import time as _time

    from robustart_tpu.solvers.base import newest_checkpoint

    d = str(tmp_path)
    for i, name in enumerate(
        ["ckpt_e9.msgpack", "ckpt_e10.msgpack", "warmstart.pth"]
    ):
        p = os.path.join(d, name)
        with open(p, "wb") as f:
            f.write(b"x")
        os.utime(p, (1_000_000 + i, 1_000_000 + i))
    # e10 written after e9; the .pth is newest of all but must lose
    assert newest_checkpoint(d).endswith("ckpt_e10.msgpack")

    import pytest

    for f in os.listdir(d):
        os.remove(os.path.join(d, f))
    with pytest.raises(FileNotFoundError):
        newest_checkpoint(d)
