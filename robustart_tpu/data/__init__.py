"""Input pipeline (reference prototype.data equivalents; SURVEY.md §2.9)."""

from robustart_tpu.data.dataset import FakeDataset, MetaFileDataset, build_dataset
from robustart_tpu.data.loader import Batch, DataLoader, to_float01
from robustart_tpu.data.pipeline import build_dataloader
from robustart_tpu.data.samplers import (
    SAMPLERS,
    distributed_indices,
    distributed_iteration_indices,
    ranked_iteration_indices,
)
from robustart_tpu.data.transforms import build_transform

__all__ = [
    "FakeDataset",
    "MetaFileDataset",
    "build_dataset",
    "Batch",
    "DataLoader",
    "to_float01",
    "build_dataloader",
    "build_transform",
    "SAMPLERS",
    "distributed_indices",
    "distributed_iteration_indices",
    "ranked_iteration_indices",
]
