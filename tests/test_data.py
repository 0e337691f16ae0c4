"""Data pipeline tests: samplers, transforms, fake backend, loader."""

import numpy as np
import pytest
from PIL import Image

from robustart_tpu.core.config import Config
from robustart_tpu.data import (
    FakeDataset,
    build_dataloader,
    build_transform,
    distributed_indices,
    distributed_iteration_indices,
)


def test_distributed_sampler_partition():
    world = 8
    shards = [distributed_indices(100, r, world) for r in range(world)]
    merged = np.sort(np.concatenate(shards))
    np.testing.assert_array_equal(merged, np.arange(100))  # exactly once
    assert {len(s) for s in shards} == {12, 13}


def test_distributed_iteration_sampler():
    world = 4
    shards = [distributed_iteration_indices(10, r, world, epoch=0) for r in range(world)]
    assert all(len(s) == 3 for s in shards)  # padded to 12
    merged = np.concatenate(shards)
    assert set(merged) == set(range(10))
    # different epochs give different permutations, deterministically
    a = distributed_iteration_indices(100, 0, 4, epoch=0)
    b = distributed_iteration_indices(100, 0, 4, epoch=1)
    a2 = distributed_iteration_indices(100, 0, 4, epoch=0)
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, a2)


def test_fake_dataset_determinism():
    ds = FakeDataset(size=10, image_size=32, num_classes=5)
    a = ds[3]
    b = ds[3]
    np.testing.assert_array_equal(a["image"], b["image"])
    assert a["label"] == 3 and ds[7]["label"] == 2
    assert a["image"].shape == (32, 32, 3)


def test_onecrop_transform_geometry():
    t = build_transform("ONECROP", input_size=224, test_resize=256)
    img = Image.new("RGB", (500, 300), (10, 20, 30))
    out = t(img)
    assert out.shape == (224, 224, 3) and out.dtype == np.uint8


def test_standard_transform_randomness():
    import random

    t = build_transform("STANDARD", input_size=64)
    rng1, rng2 = random.Random(0), random.Random(0)
    img = np.random.default_rng(0).integers(0, 255, (128, 128, 3), dtype=np.uint8)
    out1 = t(img, rng1)
    out2 = t(img, rng2)
    np.testing.assert_array_equal(out1, out2)  # same rng -> same aug
    out3 = t(img, random.Random(1))
    assert not np.array_equal(out1, out3)
    assert out1.shape == (64, 64, 3)


def _fake_cfg(batch_size=8, fake_size=20, input_size=32):
    return Config(
        {
            "type": "imagenet",
            "read_from": "fake",
            "fake_size": fake_size,
            "fake_num_classes": 10,
            "batch_size": batch_size,
            "num_workers": 2,
            "input_size": input_size,
            "test_resize": 36,
            "test": {
                "sampler": {"type": "distributed"},
                "transforms": {"type": "JUSTNORM"},
            },
            "train": {
                "sampler": {"type": "distributed_iteration"},
                "transforms": {"type": "STANDARD"},
            },
        }
    )


def test_loader_batches_and_final_mask():
    loader = build_dataloader(_fake_cfg(), split="test")
    batches = list(loader)
    assert len(batches) == 3  # ceil(20/8)
    for b in batches:
        assert b.image.shape == (8, 32, 32, 3)
        assert b.image.dtype == np.uint8
    assert batches[0].mask.all()
    assert batches[-1].mask.sum() == 4  # 20 - 16
    # all dataset indices covered exactly once among masked rows
    seen = np.concatenate([b.index[b.mask] for b in batches])
    assert sorted(seen.tolist()) == list(range(20))


def test_loader_multirank_eval_covers_all():
    seen = []
    for rank in range(4):
        loader = build_dataloader(_fake_cfg(), split="test", rank=rank, world_size=4)
        for b in loader:
            seen.extend(b.index[b.mask].tolist())
    assert sorted(seen) == list(range(20))


def test_loader_deterministic():
    l1 = list(build_dataloader(_fake_cfg(), split="train", seed=3))
    l2 = list(build_dataloader(_fake_cfg(), split="train", seed=3))
    for b1, b2 in zip(l1, l2):
        np.testing.assert_array_equal(b1.image, b2.image)
        np.testing.assert_array_equal(b1.label, b2.label)


def test_mc_maps_to_fs(tmp_path):
    # meta-file dataset via the 'mc' vocabulary falls back to fs
    img = Image.new("RGB", (40, 40), (1, 2, 3))
    img.save(tmp_path / "a.png")
    meta = tmp_path / "meta.txt"
    meta.write_text("a.png 7\n")
    cfg = Config(
        {
            "read_from": "mc",
            "batch_size": 2,
            "input_size": 32,
            "test": {
                "root_dir": str(tmp_path),
                "meta_file": str(meta),
                "sampler": {"type": "distributed"},
                "transforms": {"type": "ONECROP"},
            },
        }
    )
    batches = list(build_dataloader(cfg, split="test"))
    assert batches[0].label[0] == 7
    assert batches[0].mask.tolist() == [True, False]
