import io

import jax
import numpy as np
import pytest

from robustart_tpu.core.config import Config, load_config, iter_eval_list
from robustart_tpu.core.dist import (
    batch_sharding,
    get_mesh,
    init_distributed,
    shard_batch,
)
from robustart_tpu.core.logging import get_logger
from robustart_tpu.core.registry import Registry


def test_config_attr_access():
    cfg = Config({"model": {"type": "resnet50", "kwargs": {"num_classes": 1000}}})
    assert cfg.model.type == "resnet50"
    assert cfg["model"]["kwargs"]["num_classes"] == 1000
    cfg.model.kwargs.bn = {"use_sync_bn": True}
    assert cfg.model.kwargs.bn.use_sync_bn is True
    assert cfg.get_path("model.kwargs.num_classes") == 1000
    assert cfg.get_path("model.missing.deep", 7) == 7
    with pytest.raises(AttributeError):
        _ = cfg.nope


def test_config_yaml_roundtrip_and_merge():
    cfg = load_config(io.StringIO("a: {b: 1, c: [1, 2]}\nd: x\n"))
    assert cfg.a.b == 1
    merged = cfg.merged({"a": {"b": 5}, "e": 9})
    assert merged.a.b == 5 and merged.a.c == [1, 2] and merged.e == 9
    assert cfg.a.b == 1  # original untouched
    assert "a:" in cfg.dump_yaml()


def test_eval_list_expansion():
    cfg = Config(
        {
            "model": {"type": "resnet18"},
            "eval_list": [
                {"saver": {"pretrain": {"path": "a.pth"}}},
                {"model": {"type": "resnet50"}},
            ],
        }
    )
    subs = list(iter_eval_list(cfg))
    assert len(subs) == 2
    assert subs[0].saver.pretrain.path == "a.pth"
    assert subs[0].model.type == "resnet18"
    assert subs[1].model.type == "resnet50"
    assert "eval_list" not in subs[0]


def test_eval_list_aligns_native_input_size():
    """swin_base_384 in the reference swin eval_list (swin/config.yaml:10)
    must be fed 384² crops (its window-12 geometry breaks at 224); the
    224-native entries keep the config's sizes."""
    cfg = Config(
        {
            "model": {"type": "resnet18"},
            "data": {"input_size": 224, "test_resize": 256},
            "eval_list": ["swin_base_224", "swin_base_384"],
        }
    )
    subs = list(iter_eval_list(cfg))
    assert subs[0].data.input_size == 224
    assert subs[0].data.test_resize == 256
    assert subs[1].data.input_size == 384
    assert subs[1].data.test_resize == round(256 * 384 / 224)


def test_registry():
    reg = Registry("thing")

    @reg.register("a")
    def make_a(x=1):
        return ("a", x)

    assert "a" in reg
    assert reg.create("a", x=3) == ("a", 3)
    with pytest.raises(KeyError):
        reg.get("b")


def test_logger_singleton():
    lg1 = get_logger("t_core")
    lg2 = get_logger("t_core")
    assert lg1 is lg2


def test_dist_single_process_fallback(monkeypatch):
    monkeypatch.setenv("SKIP_DIST", "1")
    ctx = init_distributed()
    assert ctx.world_size == 1 and ctx.is_master


def test_mesh_and_sharding():
    mesh = get_mesh(("data",))
    assert mesh.devices.size == 8
    batch = {"x": np.zeros((16, 4), np.float32), "y": np.zeros((16,), np.int32)}
    sharded = shard_batch(batch, mesh)
    assert sharded["x"].sharding == batch_sharding(mesh, 2)
    # each device holds 16/8 = 2 rows
    assert sharded["x"].addressable_shards[0].data.shape == (2, 4)


def test_mesh_2d():
    mesh = get_mesh(("data", "model"), mesh_shape=(4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
