"""Config → dataloader assembly with the reference's data schema.

The schema (reference exprs/*/config.yaml, SURVEY.md §2.7): ``data{type,
read_from, use_dali, batch_size, num_workers, prefetch_factor, input_size,
test_resize, train{root_dir, meta_file, image_reader{type}, sampler{type},
transforms{type}}, test{..., evaluator{type, kwargs}}}``. ``use_dali`` is
accepted and ignored (decode parallelism is always on here).
"""

from __future__ import annotations

import numpy as np

from robustart_tpu.data.dataset import build_dataset
from robustart_tpu.data.loader import DataLoader
from robustart_tpu.data.samplers import SAMPLERS
from robustart_tpu.data.transforms import build_transform


def build_dataloader(
    data_cfg,
    split: str = "test",
    rank: int = 0,
    world_size: int = 1,
    epoch: int = 0,
    seed: int = 0,
    split_cfg_override=None,
) -> DataLoader:
    """Build a loader for ``data_cfg[split]`` honoring sampler/transform types.

    ``split_cfg_override`` lets multi-eval solvers (ImageNet-C corruption
    loops, ImageNet-S decoder×resize loops) swap root_dir/meta_file per
    sub-evaluation while keeping one config.
    """
    split_cfg = split_cfg_override if split_cfg_override is not None else data_cfg.get(split, {})
    input_size = int(data_cfg.get("input_size", 224))
    test_resize = int(data_cfg.get("test_resize", 256))
    batch_size = int(data_cfg.get("batch_size", 32))

    dataset = build_dataset(data_cfg, split_cfg, input_size)

    sampler_type = split_cfg.get("sampler", {}).get("type", "distributed")
    if sampler_type not in SAMPLERS:
        raise ValueError(f"unknown sampler {sampler_type!r}")
    n = len(dataset)
    if sampler_type == "distributed":
        indices = SAMPLERS[sampler_type](n, rank, world_size)
    elif sampler_type == "ranked_iteration":
        indices = SAMPLERS[sampler_type](
            n, rank, world_size, epoch, seed, getattr(dataset, "labels", None)
        )
    else:
        indices = SAMPLERS[sampler_type](n, rank, world_size, epoch, seed)

    transforms_cfg = split_cfg.get("transforms", {})
    preset = (
        transforms_cfg.get("type", "ONECROP")
        if isinstance(transforms_cfg, dict)
        else "ONECROP"
    )
    transform = build_transform(preset, input_size, test_resize)

    # native C++ decode pool (the DALI replacement): meta-file JPEG datasets
    # with the ONECROP eval transform
    if (
        data_cfg.get("use_native_loader")
        and preset == "ONECROP"
        and hasattr(dataset, "metas")
        and all(m[0].lower().endswith((".jpg", ".jpeg")) for m in dataset.metas[:16])
    ):
        from robustart_tpu.data.native_loader import NativeDataLoader, native_available

        if native_available():
            import os.path as _osp

            paths = [_osp.join(dataset.root_dir, m[0]) for m in dataset.metas]
            return NativeDataLoader(
                paths,
                dataset.labels,
                np.asarray(indices),
                batch_size=batch_size,
                input_size=input_size,
                test_resize=test_resize,
                mode="onecrop",
                num_threads=int(data_cfg.get("num_workers", 8)),
                queue_cap=int(data_cfg.get("prefetch_factor", 4)),
            )

    return DataLoader(
        dataset,
        np.asarray(indices),
        batch_size=batch_size,
        transform=transform,
        num_workers=int(data_cfg.get("num_workers", 4)),
        prefetch_factor=int(data_cfg.get("prefetch_factor", 2)),
        seed=seed + epoch * 7919 + rank,
        drop_last=(split == "train"),
    )
