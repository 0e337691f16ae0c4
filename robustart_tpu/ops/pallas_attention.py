"""Pallas TPU kernel: fused multi-head self-attention (eval path).

For ViT-scale sequences (N ≈ 197) the whole attention for one (batch, head)
fits in VMEM: Q/K/V are (197, 64) ≈ 50 KB each and the score matrix
(197, 197) ≈ 155 KB fp32. This kernel computes

    softmax(Q Kᵀ · scale) V

in ONE VMEM-resident program per (batch·head): no (B, H, N, N) attention
tensor ever hits HBM, and the two matmuls + fp32 softmax fuse into a single
kernel. Opt-in via ``VisionTransformer(attention_impl='pallas')``; the
default XLA einsum path is unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (N, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q * scale, k,
        dimension_numbers=(((1,), (1,)), ((), ())),  # (N, N) = Q @ Kᵀ
        preferred_element_type=jnp.float32,
    )
    s = s - jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = jnp.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mha_impl(q, k, v, interpret: bool = False):
    b, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qf, kf, vf = to_bh(q), to_bh(k), to_bh(v)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, n, d), q.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(qf, kf, vf)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mha(q, k, v, interpret):
    return _mha_impl(q, k, v, interpret=interpret)


def _mha_fwd(q, k, v, interpret):
    return _mha_impl(q, k, v, interpret=interpret), (q, k, v)


def _mha_bwd(interpret, residuals, g):
    """Backward via the standard attention gradients (XLA einsums) —
    attacks differentiate through the fused forward transparently."""
    del interpret
    q, k, v = residuals
    d = q.shape[-1]
    scale = 1.0 / np.sqrt(d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    p = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v)
    tmp = dp * p
    ds = tmp - p * jnp.sum(tmp, axis=-1, keepdims=True)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    # cotangents may arrive in f32 (e.g. the loss is computed in f32 above a
    # bf16 model); custom_vjp requires grad dtypes == primal dtypes
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_mha.defvjp(_mha_fwd, _mha_bwd)


def mha_pallas(
    q: jax.Array, k: jax.Array, v: jax.Array, interpret: bool = False
) -> jax.Array:
    """(B, N, H, D) q/k/v → (B, N, H, D) attention output.

    One Pallas program per (batch, head); inputs are laid out (B·H, N, D)
    for the kernel (a cheap transpose vs. the saved N² HBM traffic).
    Differentiable: the custom VJP recomputes the standard einsum gradients,
    so whitebox attacks work through the fused forward.
    """
    return _mha(q, k, v, interpret)
