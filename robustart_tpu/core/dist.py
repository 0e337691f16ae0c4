"""Distributed / device-mesh initialization.

Replaces the reference's NCCL + torchrun/spring.submit/SLURM launcher stack
(reference exprs/*/run.sh, eval.sh; SURVEY.md §2.11, §5.8) with
``jax.distributed`` + ``jax.sharding.Mesh``:

- data parallelism = batch-axis sharding under ``jit`` (gradient allreduce
  becomes an XLA ``psum`` riding ICI; no explicit collectives in user code),
- SyncBN = ``lax.pmean`` of batch moments over the ``data`` mesh axis,
- the single-process escape hatch ``SKIP_DIST=1`` is honored exactly like the
  reference (reference exprs/nips_benchmark/batch_eval_adv/eval.sh:2).

Environment vocabulary kept from the reference launchers: ``SKIP_DIST``,
``WORLD_SIZE``, ``RANK``, ``MASTER_ADDR``, ``MASTER_PORT``
(reference new_adv_eval/eval.sh:1-6, grad_cam.sh:2-7).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from robustart_tpu.core.logging import get_logger

logger = get_logger(__name__)

# Canonical mesh axis names. Vision workloads here are data-parallel first
# (the reference has DP only, SURVEY.md §2.11); the "model" axis exists for
# optional tensor-sharding of large ViT variants.
DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class DistContext:
    """Process-level distributed context (one per host process)."""

    rank: int
    world_size: int
    local_devices: int
    initialized_backend: bool

    @property
    def is_master(self) -> bool:
        return self.rank == 0


_context: DistContext | None = None


def init_distributed(force_single_process: bool | None = None) -> DistContext:
    """Initialize multi-process JAX if the launcher environment asks for it.

    Single-process fallback when ``SKIP_DIST=1`` or no ``WORLD_SIZE`` is set —
    the same escape hatch the reference uses to run "distributed" solvers on
    one process (reference batch_eval_adv/eval.sh:2, grad_cam.sh:2-7).
    """
    global _context
    if _context is not None:
        return _context

    skip = force_single_process
    if skip is None:
        skip = os.environ.get("SKIP_DIST", "0") == "1"
    world_size = int(os.environ.get("WORLD_SIZE", "1"))
    rank = int(os.environ.get("RANK", "0"))

    initialized = False
    if not skip and world_size > 1:
        coordinator = "{}:{}".format(
            os.environ.get("MASTER_ADDR", "127.0.0.1"),
            os.environ.get("MASTER_PORT", "12355"),
        )
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=world_size,
            process_id=rank,
        )
        initialized = True
        logger.info(
            "jax.distributed initialized: rank %d / %d via %s",
            rank,
            world_size,
            coordinator,
        )
    else:
        rank, world_size = 0, 1

    _context = DistContext(
        rank=rank,
        world_size=world_size,
        local_devices=jax.local_device_count(),
        initialized_backend=initialized,
    )
    return _context


def get_mesh(
    axis_names: Sequence[str] = (DATA_AXIS,),
    mesh_shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh over all (global) devices.

    Default is a 1-D ``("data",)`` mesh over every device — the TPU-native
    equivalent of the reference's torchrun 8-GPU data-parallel eval
    (reference imagenet-a_o-loop/eval.sh:23). Pass ``mesh_shape`` for 2-D
    ``(data, model)`` layouts; the data axis should map to the slower-varying
    device order so model-axis collectives ride ICI neighbors.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != #devices {n}")
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: int = 0) -> NamedSharding:
    """NamedSharding that shards array dim ``axis`` over the data mesh axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with leading-axis data sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
    )


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple
