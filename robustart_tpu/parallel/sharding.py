"""Sharding rules: data parallelism + optional tensor parallelism.

The reference's parallelism is multi-GPU DP with SyncBN and a gradient-sync
toggle (SURVEY.md §2.11). The TPU-native superset here:

- **dp**: batch axis over the ``data`` mesh axis — the default for every
  solver; gradient sync is the XLA ``psum`` implied by sharded-batch
  reductions, riding ICI.
- **tp** (beyond the reference, for large ViT/Mixer configs):
  Megatron-style column/row pairing over the ``model`` axis — the FIRST
  matmul of each pair (qkv, fc1, pwconv1) is column-sharded (output dim,
  bias sharded to match) and the SECOND (proj, fc2, pwconv2) is
  row-sharded (input dim), so each attention/MLP pair costs ONE psum at
  its end instead of an all-gather after every layer. Verified at the HLO
  level (tests/test_tp_collectives.py counts collectives in the compiled
  module).
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


# Megatron pairing (Shoeybi et al. 2019, the standard TP layout): the first
# matmul of an attention/MLP pair splits its OUTPUT features, the second
# splits its INPUT features, so the intermediate activation stays sharded
# and the only collective is the psum closing the pair.
#   fc1/fc2: ViT+Mixer MLPs; mlp_fc1/mlp_fc2: Swin; mlp_fc/mlp_proj +
#   out_proj: CLIP; pwconv1/pwconv2: ConvNeXt pointwise pair
_TP_COL = frozenset({"qkv", "fc1", "pwconv1", "mlp_fc1", "mlp_fc"})
_TP_ROW = frozenset({"proj", "fc2", "pwconv2", "mlp_fc2", "mlp_proj",
                     "out_proj"})


def tp_param_spec(path: tuple, value) -> P:
    """Tensor-parallel rule: Megatron column/row pairing by layer name.

    - col-shard kernels of {qkv, fc1, pwconv1} → P(None, model); their
      biases shard to match → P(model);
    - row-shard kernels of {proj, fc2, pwconv2} → P(model, None) (bias
      replicated — it adds after the psum);
    - everything else (embeddings, conv kernels, norms, head) replicated:
      vision convs/heads are small relative to ICI cost.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leaf == "kernel" and getattr(value, "ndim", 0) == 2:
        if parent in _TP_COL:
            return P(None, MODEL_AXIS)
        if parent in _TP_ROW:
            return P(MODEL_AXIS, None)
        return P()
    if leaf == "bias" and parent in _TP_COL and getattr(value, "ndim", 0) == 1:
        return P(MODEL_AXIS)
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
