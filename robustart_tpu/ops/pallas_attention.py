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


# ---------------------------------------------------------------------------
# Swin window attention: softmax(QKᵀ·scale + rel_bias [+ shift_mask]) V
# fused per (window, head) — the (B·nW, H, 49, 49) score tensors never hit
# HBM (they pad terribly: 49→64×128 tiles) and the bias gather + mask add +
# fp32 softmax all run in VMEM. Measured: the attention core is ~58% of a
# swin_base_224 eval forward under XLA (WORKLOG round 2).
# ---------------------------------------------------------------------------


def _window_attn_kernel(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref, *,
                        scale: float, with_mask: bool, num_heads: int,
                        head_dim: int, wpb: int):
    """One program per ``wpb`` WINDOWS; loops windows×heads in VMEM (a
    per-(window, head) grid measured slower than XLA — too many tiny
    programs; WORKLOG r2)."""
    d = head_dim
    for w in range(wpb):
        q = q_ref[w].astype(jnp.float32)  # (N, H·D)
        k = k_ref[w].astype(jnp.float32)
        v = v_ref[w]
        mask = m_ref[w].astype(jnp.float32) if with_mask else None
        for h in range(num_heads):
            sl = slice(h * d, (h + 1) * d)
            s = jax.lax.dot_general(
                q[:, sl] * scale, k[:, sl],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + b_ref[h].astype(jnp.float32)
            if with_mask:
                s = s + mask
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o_ref[w, :, sl] = jnp.dot(
                p.astype(v.dtype), v[:, sl],
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "num_windows", "interpret")
)
def _window_mha_impl(q, k, v, rel_bias, mask, *, num_heads: int,
                     num_windows: int, interpret: bool = False):
    """q/k/v: (B·nW, N, H, D); rel_bias: (H, N, N) f32; mask: (nW, N, N) f32
    or None. Returns (B·nW, N, H, D)."""
    bnw, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)

    def to_flat(x):  # (B·nW, N, H·D) — heads stay in the lane dim
        return x.reshape(bnw, n, h * d)

    qf, kf, vf = to_flat(q), to_flat(k), to_flat(v)
    with_mask = mask is not None
    # windows per program: 1 measured best on v5e (984 img/s vs 960 at
    # wpb=8 and ~509 with a per-(window, head) grid — swin_base_224, b256);
    # the knob stays for other chip generations
    wpb = 1
    in_specs = [
        pl.BlockSpec((wpb, n, h * d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wpb, n, h * d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((wpb, n, h * d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        # all heads' relative position bias (shared by every window)
        pl.BlockSpec((h, n, n), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qf, kf, vf, rel_bias]
    if with_mask:
        in_specs.append(
            # shifted-window masks for this program's contiguous windows
            pl.BlockSpec(
                (wpb, n, n),
                lambda i: (i % (num_windows // wpb), 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(mask)
    else:
        in_specs.append(
            pl.BlockSpec((wpb, n, n), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        args.append(jnp.zeros((wpb, n, n), jnp.float32))
    out = pl.pallas_call(
        functools.partial(
            _window_attn_kernel, scale=scale, with_mask=with_mask,
            num_heads=h, head_dim=d, wpb=wpb,
        ),
        grid=(bnw // wpb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wpb, n, h * d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bnw, n, h * d), q.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*args)
    return out.reshape(bnw, n, h, d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _window_mha(q, k, v, rel_bias, mask, num_heads, num_windows, interpret):
    return _window_mha_impl(
        q, k, v, rel_bias, mask, num_heads=num_heads,
        num_windows=num_windows, interpret=interpret,
    )


def _window_mha_fwd(q, k, v, rel_bias, mask, num_heads, num_windows,
                    interpret):
    out = _window_mha_impl(
        q, k, v, rel_bias, mask, num_heads=num_heads,
        num_windows=num_windows, interpret=interpret,
    )
    return out, (q, k, v, rel_bias, mask)


def _window_mha_bwd(num_heads, num_windows, interpret, residuals, g):
    """Standard attention gradients (XLA einsums). rel_bias and mask enter
    the scores additively, so their cotangents are plain reductions of the
    score gradient — parameter gradients through the fused eval forward
    (e.g. probing the relative-position bias table) are exact, not zeroed."""
    del interpret
    q, k, v, rel_bias, mask = residuals
    bnw, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = attn + rel_bias[None].astype(attn.dtype)
    if mask is not None:
        nw = num_windows
        attn = attn.reshape(bnw // nw, nw, h, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bnw, h, n, n)
    p = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, g)
    dp = jnp.einsum("bqhd,bkhd->bhqk", g, v)
    tmp = (dp * p).astype(jnp.float32)
    ds = tmp - p.astype(jnp.float32) * jnp.sum(tmp, axis=-1, keepdims=True)
    ds = ds.astype(q.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q) * scale
    d_bias = jnp.sum(ds.astype(jnp.float32), axis=0)  # (H, N, N)
    d_mask = (
        None
        if mask is None
        else jnp.sum(
            ds.astype(jnp.float32).reshape(bnw // num_windows, num_windows,
                                           h, n, n),
            axis=(0, 2),
        )
    )
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            d_bias.astype(rel_bias.dtype),
            None if d_mask is None else d_mask.astype(mask.dtype))


_window_mha.defvjp(_window_mha_fwd, _window_mha_bwd)


def window_mha_pallas(q, k, v, rel_bias, mask=None, *, num_windows: int = 1,
                      interpret: bool = False):
    """Fused Swin window attention (eval path).

    q/k/v: (B·nW, N, H, D); rel_bias: (H, N, N); mask: (nW, N, N) additive
    shift mask or None. Flattened program order is window-major
    (i = window·H + head), matching the (B·nW, H, N, D) transpose.
    """
    h = q.shape[2]
    return _window_mha(
        q, k, v, jnp.asarray(rel_bias, jnp.float32),
        None if mask is None else jnp.asarray(mask, jnp.float32),
        h, num_windows, interpret,
    )
