"""Parallelism utilities: mesh construction + sharding rules.

Replaces the reference's NCCL/torchrun/spring.submit stack (SURVEY.md §2.11):
DP = batch-axis sharding under jit, SyncBN = global-batch BN statistics,
optional TP for large transformer configs.
"""

from robustart_tpu.core.dist import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    get_mesh,
    init_distributed,
    replicated,
    shard_batch,
)
from robustart_tpu.parallel.sharding import (
    dp_spec,
    replicated_spec,
    shard_batch_dp,
    shard_params,
    shard_train_state,
    tp_param_spec,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "get_mesh",
    "init_distributed",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "dp_spec",
    "tp_param_spec",
    "replicated_spec",
    "shard_params",
    "shard_batch_dp",
    "shard_train_state",
]
