"""Sharding rules: data parallelism + optional tensor parallelism.

The reference's parallelism is multi-GPU DP with SyncBN and a gradient-sync
toggle (SURVEY.md §2.11). The TPU-native superset here:

- **dp**: batch axis over the ``data`` mesh axis — the default for every
  solver; gradient sync is the XLA ``psum`` implied by sharded-batch
  reductions, riding ICI.
- **tp** (beyond the reference, for large ViT/Mixer configs): shard the
  output dimension of 2-D Dense kernels over the ``model`` axis —
  qkv/proj/mlp matmuls become sharded matmuls with XLA-inserted
  all-gathers/reduce-scatters between them.
- optimizer state inherits param shardings (same pytree structure).

Used by ``__graft_entry__.dryrun_multichip`` and available to solvers via
``shard_params`` / ``shard_train_state``.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from robustart_tpu.core.dist import DATA_AXIS, MODEL_AXIS


def dp_spec(ndim: int, axis: int = 0) -> P:
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return P(*spec)


def tp_param_spec(path: tuple, value) -> P:
    """Tensor-parallel rule: shard the output dim of 2-D kernels.

    Embedding/positional tables and 1-D params stay replicated; conv kernels
    stay replicated (vision convs are small relative to ICI cost).
    """
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1] if names else ""
    if leaf == "kernel" and getattr(value, "ndim", 0) == 2:
        return P(None, MODEL_AXIS)
    return P()


def replicated_spec(path: tuple, value) -> P:
    return P()


def shard_params(
    params: Any,
    mesh: Mesh,
    rule: Callable[[tuple, Any], P] = tp_param_spec,
) -> Any:
    """device_put every param leaf with the spec chosen by ``rule``."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: jax.device_put(v, NamedSharding(mesh, rule(path, v))),
        params,
    )


def shard_batch_dp(batch: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, dp_spec(np.ndim(x)))
        ),
        batch,
    )


def shard_train_state(state: Any, mesh: Mesh, rule=tp_param_spec) -> Any:
    """Shard a TrainState-like pytree: params/ema by rule, opt state follows
    (same leaf shapes → same specs), scalars replicated."""

    def leaf_spec(path, v):
        if getattr(v, "ndim", 0) == 0:
            return P()
        return rule(path, v)

    return jax.tree_util.tree_map_with_path(
        lambda path, v: jax.device_put(v, NamedSharding(mesh, leaf_spec(path, v))),
        state,
    )
