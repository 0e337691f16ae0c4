"""Noise generation layer (reference RobustART/noise/; SURVEY.md §2.1-2.3)."""

from robustart_tpu.noise.add_noise import (
    AddNoise,
    default_config,
    function_dict,
    noise_list,
)
from robustart_tpu.noise.corruptions import corrupt, corrupt_batch
from robustart_tpu.noise.imagenet_s import ImageTransfer

__all__ = [
    "AddNoise",
    "noise_list",
    "default_config",
    "function_dict",
    "corrupt",
    "corrupt_batch",
    "ImageTransfer",
]
