"""Test configuration: run on CPU with 8 virtual devices.

Multi-device logic (data-parallel sharding, SyncBN pmean, sharded attack
loops) is tested with XLA's host-platform device simulation instead of a TPU
pod — the strategy SURVEY.md §4 prescribes for this build.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The environment may register a TPU backend via sitecustomize before this
# conftest runs, so the env var alone is not enough — force CPU explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compilation cache: model compiles dominate suite wall time;
# repeated runs hit the cache
jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from robustart_tpu.core.dist import get_mesh

    return get_mesh(("data",))


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
