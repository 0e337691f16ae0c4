"""reference RobustART/noise parity (add_noise.py:5-42)."""

from robustart_tpu.noise import (  # noqa: F401
    AddNoise,
    ImageTransfer,
    corrupt,
    corrupt_batch,
    default_config,
    function_dict,
    noise_list,
)
