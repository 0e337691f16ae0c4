"""GPipe-style pipeline parallelism over a ``pipe`` mesh axis.

The reference has NO pipeline parallelism — its scaling story is
multi-GPU data parallel only (SURVEY.md §2.11; torchrun
``--nproc_per_node``). This module is part of the TPU-native superset,
for depth-dominated models (ViT-L/H, CLIP-L) whose replicated weights or
activations outgrow a single chip's HBM.

Design (the scaling-book pipelining recipe, expressed in shard_map):

- the transformer trunk's per-block parameters are **stacked** into one
  pytree whose leaves carry a leading ``(n_stages, blocks_per_stage, ...)``
  axis and are sharded ``P('pipe')`` — each device holds only its stage's
  blocks;
- the schedule is synchronous GPipe (Huang et al. 2019): the batch is
  split into M microbatches and a ``lax.scan`` runs ``M + S - 1`` ticks;
  at every tick each stage applies its blocks to its current activation
  and a single ``lax.ppermute`` rotates activations to the next stage
  over ICI;
- the whole schedule is reverse-mode differentiable (scan + ppermute +
  psum all transpose), so the SAME code path serves eval and the train
  step — no separate backward schedule to maintain;
- stage work is uniform (same block count, same shapes), so under jit
  each tick compiles to one fused stage program + one collective permute.

Composes with data parallelism: run it on a ``(data, pipe)`` mesh and
pass ``x_spec=P(None, 'data')`` — microbatches stay whole along the
schedule axis while their rows shard over ``data``.

Bubble fraction is the usual (S-1)/(M+S-1); pick ``n_microbatches`` ≥ 4·S
for >90% utilization. Ticks in the bubble compute on zero activations and
their results are never collected (masked by the last-stage select), so
correctness never depends on M.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8: varying-mesh-axes are tracked, no check_rep kwarg
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        del check_rep
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

PIPE_AXIS = "pipe"


def stack_blocks(block_params: Sequence[Any]) -> Any:
    """Stack D homogeneous per-block param pytrees into leaves of (D, ...).

    Stacks on the HOST (numpy): the motivating models are trunks whose
    replicated weights outgrow one chip's HBM, so materializing the full
    (D, ...) stack on the default device before shard_pipeline_params
    device_puts the P('pipe') sharding would OOM the very case the
    pipeline exists for. Inside a trace (abstract leaves) falls back to
    jnp.stack — there XLA owns placement and no concrete buffer exists.
    """

    def stack(*xs):
        if any(isinstance(x, jax.core.Tracer) for x in xs):
            return jnp.stack(xs)
        return np.stack([np.asarray(x) for x in xs])

    return jax.tree.map(stack, *block_params)


def split_stages(stacked: Any, n_stages: int) -> Any:
    """Reshape leaves (D, ...) -> (S, D//S, ...); D must divide evenly."""

    def r(v):
        d = v.shape[0]
        if d % n_stages:
            raise ValueError(
                f"depth {d} not divisible by n_stages {n_stages}"
            )
        return v.reshape(n_stages, d // n_stages, *v.shape[1:])

    return jax.tree.map(r, stacked)


def unsplit_stages(staged: Any) -> Any:
    """Inverse of split_stages: leaves (S, bps, ...) -> (S*bps, ...)."""
    return jax.tree.map(
        lambda v: v.reshape(v.shape[0] * v.shape[1], *v.shape[2:]), staged
    )


def gpipe(
    stage_fn: Callable[[Any, jax.Array], jax.Array],
    stage_params: Any,
    x: jax.Array,
    *,
    mesh: Mesh,
    n_microbatches: int,
    axis: str = PIPE_AXIS,
    x_spec: P | None = None,
    params_spec: Any | None = None,
) -> jax.Array:
    """Run ``x`` through S pipeline stages with a GPipe microbatch schedule.

    ``stage_fn(local_params, x_mb) -> y_mb`` applies ONE stage (its leaves
    have a leading blocks-per-stage axis; scan over it inside).
    ``stage_params`` leaves are (S, bps, ...); ``x`` is (B, ...) with
    B % n_microbatches == 0 and per-microbatch shapes invariant across
    stages (true for transformer trunks). Output has x's shape/dtype.
    """
    S = mesh.shape[axis]
    M = int(n_microbatches)
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_microbatches {M}")
    mb = B // M
    xs = x.reshape(M, mb, *x.shape[1:])
    if x_spec is None:
        x_spec = P(None)
    perm = [(i, (i + 1) % S) for i in range(S)]
    # axes the activations vary over inside the shard_map body: the pipe
    # axis plus every mesh axis the microbatch spec shards over (dp×pp)
    vary_axes = [axis]
    for entry in x_spec:
        for name in (entry if isinstance(entry, tuple) else (entry,)):
            if name is not None and name not in vary_axes:
                vary_axes.append(name)
    vary_axes = tuple(vary_axes)

    def run(params, xs_local):
        # local slice of the stacked params: (1, bps, ...) -> (bps, ...)
        params = jax.tree.map(lambda v: jnp.squeeze(v, 0), params)
        rank = lax.axis_index(axis)
        # build the zero inits from static shape/dtype (NOT zeros_like) so
        # they start invariant and the pcast below can mark exactly the
        # vary_axes set
        buf = jnp.zeros(xs_local.shape[1:], xs_local.dtype)
        out = jnp.zeros(xs_local.shape, xs_local.dtype)
        # jax >= 0.8 tracks varying-mesh-axes through scan: the zero init
        # carries must be marked pipe-varying to match the body's outputs
        pcast = getattr(lax, "pcast", None)
        if pcast is not None:
            buf = pcast(buf, vary_axes, to="varying")
            out = pcast(out, vary_axes, to="varying")
        elif hasattr(lax, "pvary"):  # pragma: no cover - older jax
            buf, out = lax.pvary(buf, vary_axes), lax.pvary(out, vary_axes)

        def tick(carry, t):
            buf, out = carry
            feed = lax.dynamic_index_in_dim(
                xs_local, jnp.minimum(t, M - 1), 0, keepdims=False
            )
            inp = jnp.where(rank == 0, feed, buf)
            y = stage_fn(params, inp)
            # the last stage's result at tick t is microbatch t-(S-1);
            # bubble ticks (t < S-1) write into slot 0 and are overwritten
            # by the real microbatch-0 result at t = S-1
            idx = jnp.clip(t - (S - 1), 0, M - 1)
            upd = lax.dynamic_update_index_in_dim(out, y, idx, 0)
            out = jnp.where(rank == S - 1, upd, out)
            buf = lax.ppermute(y, axis, perm)
            return (buf, out), None

        (_, out), _ = lax.scan(tick, (buf, out), jnp.arange(M + S - 1))
        # replicate the last stage's collected outputs across the pipe axis
        out = jnp.where(rank == S - 1, out, jnp.zeros_like(out))
        return lax.psum(out, axis)

    # params_spec: per-leaf PartitionSpecs for the stacked stage params
    # (default: every leaf P(axis) on the stacked dim). A spec tree that
    # also shards leaves over a tensor-parallel mesh axis hands stage_fn
    # LOCAL weight shards — pair with a TP-aware stage_fn (vit_tp_stage_fn)
    # that closes each Megatron pair with a psum over that axis.
    if params_spec is None:
        params_spec = P(axis)
    shmapped = shard_map(
        run,
        mesh=mesh,
        in_specs=(params_spec, x_spec),
        out_specs=x_spec,
        check_rep=False,  # ppermute defeats static replication inference
    )
    ys = shmapped(stage_params, xs)
    return ys.reshape(B, *ys.shape[2:])


# ---------------------------------------------------------------------------
# ViT adapter: Classifier -> (embed, pipelined trunk, head)
# ---------------------------------------------------------------------------


def _vit_block_module(m):
    from robustart_tpu.models.vit import EncoderBlock

    # dropout/attention_dropout/drop_path pinned to 0: the pipeline path is
    # the deterministic eval / dropout-free train recipe (the reference's
    # new_adv_train ViT recipe trains rate-free too)
    return EncoderBlock(
        m.num_heads,
        mlp_ratio=m.mlp_ratio,
        qkv_bias=m.qkv_bias,
        dropout=0.0,
        attention_dropout=0.0,
        drop_path=0.0,
        softmax_fp32=m.softmax_fp32,
        attention_impl=m.attention_impl,
        dtype=m.dtype,
    )


def vit_stage_fn(module) -> Callable[[Any, jax.Array], jax.Array]:
    """One pipeline stage = scan over this stage's stacked EncoderBlocks."""
    block = _vit_block_module(module)

    def stage(params_bps, x):
        def body(h, p):
            return block.apply({"params": p}, h, deterministic=True), None

        h, _ = lax.scan(body, x, params_bps)
        return h

    return stage


def vit_split_params(variables: Any, depth: int, n_stages: int) -> dict:
    """{'params': {...}} -> {'outer': embed+head params, 'stages': stacked}.

    'outer' keeps every non-block entry under its original name (replicate
    it); 'stages' leaves are (S, bps, ...) (shard P('pipe') on axis 0).
    """
    p = dict(variables["params"])
    blocks = [p.pop(f"block{i}") for i in range(depth)]
    return {
        "outer": p,
        "stages": split_stages(stack_blocks(blocks), n_stages),
    }


def vit_merge_params(split: dict, depth: int) -> dict:
    """Inverse of vit_split_params -> {'params': ...} (checkpoint layout)."""
    stacked = unsplit_stages(split["stages"])
    params = dict(split["outer"])
    for i in range(depth):
        params[f"block{i}"] = jax.tree.map(lambda v: v[i], stacked)
    return {"params": params}


def _vit_embed(m, outer, x):
    """Patch embed + cls token + pos embed (models/vit.py:255-278)."""
    from flax import linen as nn

    b = x.shape[0]
    conv = nn.Conv(
        m.embed_dim,
        (m.patch_size, m.patch_size),
        strides=(m.patch_size, m.patch_size),
        padding="VALID",
        dtype=m.dtype,
    )
    x = conv.apply({"params": outer["patch_embed"]}, x)
    x = x.reshape(b, -1, m.embed_dim)
    cls = jnp.broadcast_to(
        outer["cls_token"], (b, 1, m.embed_dim)
    ).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1)
    return x + outer["pos_embed"].astype(x.dtype)


def _vit_head(m, outer, x):
    """Final LN + classification head (models/vit.py:295-297)."""
    from flax import linen as nn

    ln = nn.LayerNorm(epsilon=1e-6, dtype=m.dtype)
    x = ln.apply({"params": outer["norm"]}, x)
    cls_out = x[:, 0].astype(jnp.float32)
    head = nn.Dense(m.num_classes, dtype=jnp.float32)
    return head.apply({"params": outer["head"]}, cls_out)


def vit_pipeline_logits_fn(
    clf,
    *,
    mesh: Mesh,
    n_stages: int | None = None,
    n_microbatches: int = 8,
    axis: str = PIPE_AXIS,
    x_spec: P | None = None,
) -> Callable[[dict, jax.Array], jax.Array]:
    """Pure ``fn(split_params, images01) -> logits`` with the trunk GPipe'd.

    ``split_params`` comes from :func:`vit_split_params`; shard its
    ``stages`` subtree ``P(axis)`` and replicate ``outer``. Embed and head
    run outside the pipeline (data-sharded like any jit op).
    """
    m = clf.module
    n_stages = mesh.shape[axis] if n_stages is None else n_stages
    if n_stages != mesh.shape[axis]:
        raise ValueError(
            f"n_stages {n_stages} != mesh axis {axis} size {mesh.shape[axis]}"
        )
    stage = vit_stage_fn(m)
    from robustart_tpu.models.layers import normalize_01

    def logits_fn(split_params, images01):
        x = normalize_01(images01, clf.mean, clf.std)
        x = _vit_embed(m, split_params["outer"], x)
        x = gpipe(
            stage,
            split_params["stages"],
            x,
            mesh=mesh,
            n_microbatches=n_microbatches,
            axis=axis,
            x_spec=x_spec,
        )
        return _vit_head(m, split_params["outer"], x)

    return logits_fn


def shard_pipeline_params(
    split: dict, mesh: Mesh, axis: str = PIPE_AXIS
) -> dict:
    """device_put: stages P(axis) on the stacked dim, outer replicated."""
    from jax.sharding import NamedSharding

    stages = jax.tree.map(
        lambda v: jax.device_put(
            v, NamedSharding(mesh, P(axis, *([None] * (v.ndim - 1))))
        ),
        split["stages"],
    )
    outer = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), split["outer"]
    )
    return {"outer": outer, "stages": stages}


# ---------------------------------------------------------------------------
# Tensor parallelism INSIDE a pipeline stage (pp × tp × dp, three mesh axes)
# ---------------------------------------------------------------------------
# The Megatron column/row pairing (parallel/sharding.py tp_param_spec) moved
# to the shard_map level: stacked stage leaves are sharded over BOTH the
# 'pipe' axis (dim 0) and the 'model' axis (their Megatron dim), the stage
# body computes attention over its LOCAL head group / MLP over its LOCAL
# hidden slice, and ONE psum over 'model' closes each pair. The head-major
# (H, 3, D) qkv packing (models/vit.py:91-97) makes a contiguous column
# shard a whole group of heads, so no gather is needed before attention.
# Beyond the reference (DP-only, SURVEY.md §2.11).


def pp_tp_param_spec(path: tuple, value, *, pipe_axis: str = PIPE_AXIS,
                     model_axis: str = "model") -> P:
    """Spec for a STACKED stage leaf (S, bps, ...): pipe on dim 0 plus the
    Megatron column/row rule (sharding.tp_param_spec) on the trailing dims."""
    from robustart_tpu.parallel.sharding import _TP_COL, _TP_ROW

    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) >= 2 else ""
    if leaf == "kernel" and getattr(value, "ndim", 0) == 4:
        if parent in _TP_COL:
            return P(pipe_axis, None, None, model_axis)
        if parent in _TP_ROW:
            return P(pipe_axis, None, model_axis, None)
    if leaf == "bias" and parent in _TP_COL and getattr(value, "ndim", 0) == 3:
        return P(pipe_axis, None, model_axis)
    return P(pipe_axis, *([None] * (getattr(value, "ndim", 1) - 1)))


def shard_pipeline_params_tp(split: dict, mesh: Mesh, *,
                             pipe_axis: str = PIPE_AXIS,
                             model_axis: str = "model") -> dict:
    """device_put: stages by pp_tp_param_spec (pipe × model), outer replicated."""
    from jax.sharding import NamedSharding

    stages = jax.tree_util.tree_map_with_path(
        lambda path, v: jax.device_put(
            v,
            NamedSharding(
                mesh,
                pp_tp_param_spec(path, v, pipe_axis=pipe_axis,
                                 model_axis=model_axis),
            ),
        ),
        split["stages"],
    )
    outer = jax.tree.map(
        lambda v: jax.device_put(v, NamedSharding(mesh, P())), split["outer"]
    )
    return {"outer": outer, "stages": stages}


def pipeline_params_spec_tp(split_stages: Any, *,
                            pipe_axis: str = PIPE_AXIS,
                            model_axis: str = "model") -> Any:
    """The matching shard_map in_specs tree for gpipe(params_spec=...)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, v: pp_tp_param_spec(
            path, v, pipe_axis=pipe_axis, model_axis=model_axis
        ),
        split_stages,
    )


def vit_tp_stage_fn(module, tp_axis: str = "model"):
    """One pipeline stage (scan over its blocks) with Megatron TP inside.

    Weights arrive as LOCAL shards: qkv/fc1 column-sharded (a contiguous
    head group / hidden slice), proj/fc2 row-sharded; proj/fc2 biases are
    replicated and added AFTER the pair-closing psum. Numerics match
    vit_stage_fn exactly — the psum reassembles the full contraction.
    """
    from robustart_tpu.models.layers import layer_norm

    H = module.num_heads
    dt = module.dtype

    def one_block(p, x):
        b, n, c = x.shape
        d = c // H
        # attention half: col-sharded qkv → local-head attention →
        # row-sharded proj → psum
        y = layer_norm(x, p["norm1"]["scale"], p["norm1"]["bias"], 1e-6, dt)
        qkv = jnp.dot(y.astype(dt), p["attn"]["qkv"]["kernel"].astype(dt))
        if "bias" in p["attn"]["qkv"]:
            qkv = qkv + p["attn"]["qkv"]["bias"].astype(dt)
        hl = qkv.shape[-1] // (3 * d)  # local heads on this model-rank
        qkv = qkv.reshape(b, n, hl, 3, d)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (1.0 / np.sqrt(d)), k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(dt)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, hl * d)
        part = jnp.dot(out, p["attn"]["proj"]["kernel"].astype(dt))
        x = x + lax.psum(part, tp_axis) + p["attn"]["proj"]["bias"].astype(dt)
        # MLP half: col-sharded fc1 → gelu → row-sharded fc2 → psum
        y = layer_norm(x, p["norm2"]["scale"], p["norm2"]["bias"], 1e-6, dt)
        h = jnp.dot(y.astype(dt), p["mlp"]["fc1"]["kernel"].astype(dt))
        h = h + p["mlp"]["fc1"]["bias"].astype(dt)
        h = jax.nn.gelu(h, approximate=False)
        part = jnp.dot(h, p["mlp"]["fc2"]["kernel"].astype(dt))
        return x + lax.psum(part, tp_axis) + p["mlp"]["fc2"]["bias"].astype(dt)

    def stage(params_bps, x):
        def body(h, p):
            return one_block(p, h), None

        h, _ = lax.scan(body, x, params_bps)
        return h

    return stage


def vit_tp_pipeline_logits_fn(
    clf,
    *,
    mesh: Mesh,
    n_microbatches: int = 8,
    axis: str = PIPE_AXIS,
    tp_axis: str = "model",
    x_spec: P | None = None,
) -> Callable[[dict, jax.Array], jax.Array]:
    """vit_pipeline_logits_fn with Megatron TP inside each pipeline stage.

    ``split_params`` from vit_split_params, sharded by
    shard_pipeline_params_tp over a three-axis (data, model, pipe) mesh.
    """
    m = clf.module
    if m.num_heads % mesh.shape[tp_axis]:
        raise ValueError(
            f"num_heads {m.num_heads} not divisible by {tp_axis} axis "
            f"size {mesh.shape[tp_axis]}"
        )
    stage = vit_tp_stage_fn(m, tp_axis=tp_axis)
    from robustart_tpu.models.layers import normalize_01

    def logits_fn(split_params, images01):
        x = normalize_01(images01, clf.mean, clf.std)
        x = _vit_embed(m, split_params["outer"], x)
        x = gpipe(
            stage,
            split_params["stages"],
            x,
            mesh=mesh,
            n_microbatches=n_microbatches,
            axis=axis,
            x_spec=x_spec,
            params_spec=pipeline_params_spec_tp(
                split_params["stages"], pipe_axis=axis, model_axis=tp_axis
            ),
        )
        return _vit_head(m, split_params["outer"], x)

    return logits_fn
