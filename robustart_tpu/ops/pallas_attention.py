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


# ---------------------------------------------------------------------------
# Fused Swin window BLOCK: LN + qkv + window attention + proj + residual in
# one VMEM program over ``wpb`` windows. Post-kernel profiling (WORKLOG r3)
# showed ~50% of swin_base eval time in the qkv/proj matmuls and layout ops
# around the attention core: every windowed (·, 49, C) tensor pads 49→64
# sublane tiles in HBM, and the per-window M=49 matmul rows under-fill the
# MXU. Here HBM sees only the block input and output; qkv/proj run at
# M = wpb·49 rows with the weights VMEM-resident.
# ---------------------------------------------------------------------------


def _ln_f32(x, scale, bias, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def window_block_reference(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv,
                           wp, bp, rel_bias, mask=None, *,
                           num_windows: int = 1, eps: float = 1e-5):
    """XLA reference for the fused window block (VJP + parity tests).

    x: (B·nW, N, C) pre-LN windowed input. w{q,k,v}: (C, H·D) per-branch
    weights (head h in columns [h·D, (h+1)·D)); wp: (C, C);
    rel_bias: (H, N, N); mask: (nW, N, N) or None.
    Returns x + proj(attn(LN(x))).
    """
    bnw, n, c = x.shape
    h = rel_bias.shape[0]
    d = c // h
    scale = 1.0 / np.sqrt(d)
    xn = _ln_f32(x, ln_scale, ln_bias, eps).astype(x.dtype)

    def branch(w, b):
        out = jnp.dot(xn, w.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        return (out + b.astype(jnp.float32)).astype(x.dtype)

    q = branch(wq, bq).reshape(bnw, n, h, d)
    k = branch(wk, bk).reshape(bnw, n, h, d)
    v = branch(wv, bv).reshape(bnw, n, h, d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", (q * scale).astype(x.dtype), k)
    attn = attn.astype(jnp.float32) + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        nw = num_windows
        attn = attn.reshape(bnw // nw, nw, h, n, n)
        attn = attn + mask[None, :, None].astype(jnp.float32)
        attn = attn.reshape(bnw, h, n, n)
    p = jax.nn.softmax(attn, -1).astype(x.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v).reshape(bnw, n, c)
    y = jnp.dot(out, wp.astype(x.dtype),
                preferred_element_type=jnp.float32) + bp.astype(jnp.float32)
    return (x.astype(jnp.float32) + y).astype(x.dtype)


def _window_block_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                         bk_ref, wv_ref, bv_ref, wp_ref, bp_ref, b_ref,
                         m_ref, o_ref, *rest, scale: float,
                         with_mask: bool, num_heads: int, head_dim: int,
                         n: int, wpb: int, eps: float, pair: bool = False,
                         emit_qkv: bool = False):
    if emit_qkv:
        q_ref, k_ref, v_ref, attn_ref = rest
    else:
        (attn_ref,) = rest
    c = num_heads * head_dim
    xw = x_ref[:].reshape(wpb * n, c)
    xn = _ln_f32(xw, lns_ref[0], lnb_ref[0], eps).astype(xw.dtype)

    def branch(w_ref2, b_ref2):
        out = jax.lax.dot_general(
            xn, w_ref2[:].astype(xn.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref2[0].astype(jnp.float32)
        return out.astype(xn.dtype)

    q = branch(wq_ref, bq_ref)
    k = branch(wk_ref, bk_ref)
    v = branch(wv_ref, bv_ref)
    if emit_qkv:
        # grad-mode residuals: one HBM store each is cheaper than the bwd
        # re-running the three qkv matmuls (flash-style — scores/probs are
        # recomputed in the bwd, qkv are not)
        q_ref[:] = q.reshape(wpb, n, c)
        k_ref[:] = k.reshape(wpb, n, c)
        v_ref[:] = v.reshape(wpb, n, c)
    d = head_dim
    # paired-window mode: Swin's per-(window, head) score matmuls are
    # (49, 32)·(32, 49) — M, K, N all far below the 128-wide MXU, so each
    # costs a full array pass at ≤10% utilization. Stacking TWO consecutive
    # windows along both score dims (2n ≤ 128 keeps one lane tile) halves
    # the macro-op count; the cross-window quadrants arrive masked to -1e30
    # through the pre-paired bias table (built in _window_block_impl), so
    # softmax rows and the p·v contraction are bitwise those of the
    # per-window loop (the extra terms are exact zeros).
    n_iter = n * 2 if pair else n
    for w in range(wpb // 2 if pair else wpb):
        rows = slice(w * n_iter, (w + 1) * n_iter)
        qw = q[rows].astype(jnp.float32)
        kw = k[rows].astype(jnp.float32)
        vw = v[rows]
        maskw = m_ref[w].astype(jnp.float32) if with_mask else None
        for hh in range(num_heads):
            cols = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                qw[:, cols] * scale, kw[:, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + b_ref[hh].astype(jnp.float32)
            if with_mask:
                s = s + maskw
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            attn_ref[rows, cols] = jnp.dot(
                p.astype(vw.dtype), vw[:, cols],
                preferred_element_type=jnp.float32,
            ).astype(attn_ref.dtype)
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[:].astype(xw.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    y = y + xw.astype(jnp.float32)
    o_ref[:] = y.reshape(wpb, n, c).astype(o_ref.dtype)


def _window_block_hg_kernel(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref,
                            bk_ref, wv_ref, bv_ref, wp_ref, bp_ref, b_ref,
                            m_ref, o_ref, *rest, scale: float,
                            with_mask: bool, group_heads: int, head_dim: int,
                            n: int, wpb: int, eps: float, n_groups: int,
                            emit_qkv: bool = False):
    """Head-grouped variant: grid (programs, groups) with the group axis
    innermost — each step holds only this group's weight slices (4C²/G
    bytes) and accumulates its proj partial into an f32 scratch; the output
    block is written once on the last group. Head-major qkv packing makes a
    head group a contiguous column slice (the TP layout, models/vit.py)."""
    if emit_qkv:
        q_ref, k_ref, v_ref, acc_ref, attn_ref = rest
    else:
        acc_ref, attn_ref = rest
    g = pl.program_id(1)
    c = x_ref.shape[2]
    gc = group_heads * head_dim
    xw = x_ref[:].reshape(wpb * n, c)
    xn = _ln_f32(xw, lns_ref[0], lnb_ref[0], eps).astype(xw.dtype)

    def branch(w_ref2, b_ref2):
        out = jax.lax.dot_general(
            xn, w_ref2[:].astype(xn.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref2[0].astype(jnp.float32)
        return out.astype(xn.dtype)

    q = branch(wq_ref, bq_ref)  # (wpb·n, gc)
    k = branch(wk_ref, bk_ref)
    v = branch(wv_ref, bv_ref)
    if emit_qkv:
        # per-group column slice of the (bnw, n, C) residual (head-major
        # packing makes group g the contiguous columns [g·gc, (g+1)·gc))
        q_ref[:] = q.reshape(wpb, n, gc)
        k_ref[:] = k.reshape(wpb, n, gc)
        v_ref[:] = v.reshape(wpb, n, gc)
    d = head_dim
    for w in range(wpb):
        rows = slice(w * n, (w + 1) * n)
        qw = q[rows].astype(jnp.float32)
        kw = k[rows].astype(jnp.float32)
        vw = v[rows]
        maskw = m_ref[w].astype(jnp.float32) if with_mask else None
        for hh in range(group_heads):
            cols = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                qw[:, cols] * scale, kw[:, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + b_ref[hh].astype(jnp.float32)
            if with_mask:
                s = s + maskw
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            attn_ref[rows, cols] = jnp.dot(
                p.astype(vw.dtype), vw[:, cols],
                preferred_element_type=jnp.float32,
            ).astype(attn_ref.dtype)
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[:].astype(xw.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(g == 0)
    def _init():
        acc_ref[:] = xw.astype(jnp.float32) + bp_ref[0].astype(jnp.float32) + y

    @pl.when(g > 0)
    def _accum():
        acc_ref[:] = acc_ref[:] + y

    @pl.when(g == n_groups - 1)
    def _emit():
        o_ref[:] = acc_ref[:].reshape(wpb, n, c).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_windows", "eps", "wpb",
                     "head_groups", "interpret", "emit_qkv"),
)
def _window_block_impl(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp,
                       rel_bias, mask, *, num_heads: int, num_windows: int,
                       eps: float, wpb: int, head_groups: int = 1,
                       interpret: bool = False, emit_qkv: bool = False):
    bnw, n, c = x.shape
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)
    with_mask = mask is not None
    hg = head_groups
    gh = num_heads // hg  # heads per group
    gc = gh * d  # columns per group

    def row(v):
        return v.reshape(1, -1)

    pair = False
    if hg == 1:
        # pair consecutive windows in the attention core when two windows'
        # scores fit one 128-lane tile (see _window_block_kernel): full
        # (H, N, N) bias only (Swin) — the (H, 1, 1) broadcast-zero ViT
        # form can't carry the cross-window -inf quadrants
        pair = (
            n <= 64 and wpb % 2 == 0 and rel_bias.shape[1] == n
            and (mask is None or num_windows % 2 == 0)
        )
        if pair:
            neg = jnp.full((num_heads, n, n), -1e30, rel_bias.dtype)
            rel_bias = jnp.concatenate([
                jnp.concatenate([rel_bias, neg], axis=2),
                jnp.concatenate([neg, rel_bias], axis=2),
            ], axis=1)  # (H, 2N, 2N)
            if with_mask:
                zero = jnp.zeros_like(mask[0::2])
                mask = jnp.concatenate([
                    jnp.concatenate([mask[0::2], zero], axis=2),
                    jnp.concatenate([zero, mask[1::2]], axis=2),
                ], axis=1)  # (nW/2, 2N, 2N)
        x_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        const2 = lambda i: (0, 0)  # noqa: E731
        w_in_spec = pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM)
        b_in_spec = pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM)
        wp_spec, bp_spec = w_in_spec, b_in_spec
        bias_spec = pl.BlockSpec(
            (num_heads, rel_bias.shape[1], rel_bias.shape[2]),
            lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
        mask_map = (lambda i: (i % (num_windows // wpb), 0, 0)) if with_mask \
            else (lambda i: (0, 0, 0))
        grid = (bnw // wpb,)
        kernel = functools.partial(
            _window_block_kernel, scale=scale, with_mask=with_mask,
            num_heads=num_heads, head_dim=d, n=n, wpb=wpb, eps=eps,
            pair=pair, emit_qkv=emit_qkv,
        )
        out_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        qkv_spec, qkv_shape = out_spec, (bnw, n, c)
        scratch = [pltpu.VMEM((wpb * n, c), x.dtype)]
    else:
        x_spec = pl.BlockSpec((wpb, n, c), lambda i, g: (i, 0, 0),
                              memory_space=pltpu.VMEM)
        const2 = lambda i, g: (0, 0)  # noqa: E731
        w_in_spec = pl.BlockSpec((c, gc), lambda i, g: (0, g),
                                 memory_space=pltpu.VMEM)
        b_in_spec = pl.BlockSpec((1, gc), lambda i, g: (0, g),
                                 memory_space=pltpu.VMEM)
        wp_spec = pl.BlockSpec((gc, c), lambda i, g: (g, 0),
                               memory_space=pltpu.VMEM)
        bp_spec = pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM)
        bias_spec = pl.BlockSpec(
            (gh, rel_bias.shape[1], rel_bias.shape[2]),
            lambda i, g: (g, 0, 0), memory_space=pltpu.VMEM)
        mask_map = (lambda i, g: (i % (num_windows // wpb), 0, 0)) \
            if with_mask else (lambda i, g: (0, 0, 0))
        grid = (bnw // wpb, hg)
        kernel = functools.partial(
            _window_block_hg_kernel, scale=scale, with_mask=with_mask,
            group_heads=gh, head_dim=d, n=n, wpb=wpb, eps=eps, n_groups=hg,
            emit_qkv=emit_qkv,
        )
        out_spec = pl.BlockSpec((wpb, n, c), lambda i, g: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        qkv_spec = pl.BlockSpec((wpb, n, gc), lambda i, g: (i, 0, g),
                                memory_space=pltpu.VMEM)
        qkv_shape = (bnw, n, c)
        scratch = [pltpu.VMEM((wpb * n, c), jnp.float32),
                   pltpu.VMEM((wpb * n, gc), x.dtype)]

    in_specs = [
        x_spec,
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM),
    ]
    args = [x, row(ln_scale), row(ln_bias)]
    for w_, b_ in ((wq, bq), (wk, bk), (wv, bv)):
        in_specs += [w_in_spec, b_in_spec]
        args += [w_, row(b_)]
    in_specs += [wp_spec, bp_spec]
    args += [wp, row(bp)]
    # (H, N, N) rel-bias table, or (H, 1, 1) broadcast-zeros for plain
    # (ViT-style) attention without a relative bias
    in_specs.append(bias_spec)
    args.append(rel_bias)
    if hg == 1 and pair:
        mask_block = (wpb // 2, 2 * n, 2 * n)
    else:
        mask_block = (wpb, n, n)
    in_specs.append(
        pl.BlockSpec(mask_block, mask_map, memory_space=pltpu.VMEM)
    )
    args.append(mask if with_mask else jnp.zeros(mask_block, jnp.float32))
    if emit_qkv:
        out_specs = [out_spec, qkv_spec, qkv_spec, qkv_spec]
        out_shapes = [jax.ShapeDtypeStruct((bnw, n, c), x.dtype)] + [
            jax.ShapeDtypeStruct(qkv_shape, x.dtype)] * 3
    else:
        out_specs = out_spec
        out_shapes = jax.ShapeDtypeStruct((bnw, n, c), x.dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _window_block(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp,
                  rel_bias, mask, num_heads, num_windows, eps, wpb,
                  head_groups, interpret):
    return _window_block_impl(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp, rel_bias,
        mask, num_heads=num_heads, num_windows=num_windows, eps=eps,
        wpb=wpb, head_groups=head_groups, interpret=interpret,
    )


def _window_block_fwd(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp,
                      rel_bias, mask, num_heads, num_windows, eps, wpb,
                      head_groups, interpret):
    """Grad-mode forward: the kernel additionally streams out q/k/v so the
    backward never re-runs the three qkv matmuls (the measured cost of the
    old recompute-through-XLA VJP: a whole extra XLA forward per grad,
    benchmarks/attacks.json r4). wpb is re-picked for the larger VMEM
    footprint — wpb only regroups reductions (bf16-bitwise, f32-ulp
    identical; tests/test_pallas_window_block.py pairing test)."""
    bnw, n, c = x.shape
    wpb_e = _wpb_auto(bnw, n, c, num_heads, rel_bias.shape[1],
                      jnp.dtype(x.dtype).itemsize, mask is not None,
                      num_windows, head_groups, emit_qkv=True)
    out, q, k, v = _window_block_impl(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp, rel_bias,
        mask, num_heads=num_heads, num_windows=num_windows, eps=eps,
        wpb=wpb_e, head_groups=head_groups, interpret=interpret,
        emit_qkv=True,
    )
    return out, (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp,
                 rel_bias, mask, q, k, v)


def _window_block_bwd(num_heads, num_windows, eps, wpb, head_groups,
                      interpret, residuals, g):
    """Exact gradients for EVERY input (x, LN affine, qkv/proj weights,
    bias table, mask), composed from the SAVED q/k/v — no re-forward.
    Probabilities are recomputed from q/k (flash-attention style: one
    score einsum + softmax is far cheaper than storing the N² tensor);
    the recompute reproduces the reference softmax bit-for-bit, so the
    cotangents match the old recompute-VJP to fp-associativity.
    Semantics per window_block_reference (q/k/v are the post-cast branch
    outputs, scale multiplied before the cast)."""
    del wpb, head_groups, interpret
    (x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp, rel_bias,
     mask, q, k, v) = residuals
    bnw, n, c = x.shape
    h = num_heads
    d = c // h
    scale = 1.0 / np.sqrt(d)
    f32 = jnp.float32

    def ln_fn(xx, ss, bb):
        return _ln_f32(xx, ss, bb, eps).astype(x.dtype)

    xn, ln_vjp = jax.vjp(ln_fn, x, ln_scale, ln_bias)
    q4 = q.reshape(bnw, n, h, d)
    k4 = k.reshape(bnw, n, h, d)
    v4 = v.reshape(bnw, n, h, d)
    # scores + softmax, reference semantics (window_block_reference)
    attn = jnp.einsum("bqhd,bkhd->bhqk", (q4 * scale).astype(x.dtype), k4)
    attn = attn.astype(f32) + rel_bias[None].astype(f32)
    if mask is not None:
        attn = attn.reshape(bnw // num_windows, num_windows, h, n, n)
        attn = attn + mask[None, :, None].astype(f32)
        attn = attn.reshape(bnw, h, n, n)
    p = jax.nn.softmax(attn, -1).astype(x.dtype)

    gf = g.astype(f32)
    gc = g.astype(x.dtype)
    # y = x + attn_out @ wp + bp
    da = jnp.dot(gc, wp.T.astype(x.dtype),
                 preferred_element_type=f32).astype(x.dtype)
    da4 = da.reshape(bnw, n, h, d)
    attn_out = jnp.einsum("bhqk,bkhd->bqhd", p, v4).reshape(bnw, n, c)
    dwp = jnp.einsum("bnc,bnk->ck", attn_out.astype(x.dtype), gc,
                     preferred_element_type=f32)
    dbp = jnp.sum(gf, axis=(0, 1))
    # attention core (same math as _window_mha_bwd)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, da4)
    dp = jnp.einsum("bqhd,bkhd->bhqk", da4, v4)
    tmp = (dp * p).astype(f32)
    ds = tmp - p.astype(f32) * jnp.sum(tmp, axis=-1, keepdims=True)
    ds = ds.astype(x.dtype)
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, k4) * scale
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, q4) * scale
    d_bias = jnp.sum(ds.astype(f32), axis=0)
    if rel_bias.shape != (h, n, n):
        # broadcast bias (ViT passes (H, 1, 1) zeros): sum the cotangent
        # down to the primal's shape — custom_vjp does NOT check this, so
        # a full-shape return would silently mis-shape a trained bias
        d_bias = jnp.sum(
            d_bias,
            axis=tuple(i for i, s in enumerate(rel_bias.shape) if s == 1),
            keepdims=True,
        )
    d_mask = (
        None
        if mask is None
        else jnp.sum(
            ds.astype(f32).reshape(bnw // num_windows, num_windows, h, n, n),
            axis=(0, 2),
        )
    )
    dq2 = dq.reshape(bnw, n, c).astype(x.dtype)
    dk2 = dk.reshape(bnw, n, c).astype(x.dtype)
    dv2 = dv.reshape(bnw, n, c).astype(x.dtype)
    dxn = (
        jnp.dot(dq2, wq.T.astype(x.dtype), preferred_element_type=f32)
        + jnp.dot(dk2, wk.T.astype(x.dtype), preferred_element_type=f32)
        + jnp.dot(dv2, wv.T.astype(x.dtype), preferred_element_type=f32)
    ).astype(x.dtype)
    xnc = xn.astype(x.dtype)
    dwq = jnp.einsum("bnc,bnd->cd", xnc, dq2, preferred_element_type=f32)
    dwk = jnp.einsum("bnc,bnd->cd", xnc, dk2, preferred_element_type=f32)
    dwv = jnp.einsum("bnc,bnd->cd", xnc, dv2, preferred_element_type=f32)
    dbq = jnp.sum(dq2.astype(f32), axis=(0, 1))
    dbk = jnp.sum(dk2.astype(f32), axis=(0, 1))
    dbv = jnp.sum(dv2.astype(f32), axis=(0, 1))
    dx_ln, dlns, dlnb = ln_vjp(dxn)
    dx = (dx_ln.astype(f32) + gf).astype(x.dtype)
    return (dx, dlns.astype(ln_scale.dtype), dlnb.astype(ln_bias.dtype),
            dwq.astype(wq.dtype), dbq.astype(bq.dtype),
            dwk.astype(wk.dtype), dbk.astype(bk.dtype),
            dwv.astype(wv.dtype), dbv.astype(bv.dtype),
            dwp.astype(wp.dtype), dbp.astype(bp.dtype),
            d_bias.astype(rel_bias.dtype),
            None if d_mask is None else d_mask.astype(mask.dtype))


_window_block.defvjp(_window_block_fwd, _window_block_bwd)


def _wpb_auto(bnw: int, n: int, c: int, h: int, nb: int, itemsize: int,
              masked: bool, num_windows: int, head_groups: int = 1,
              emit_qkv: bool = False) -> int:
    """Largest windows-per-program whose VMEM footprint fits the ~16 MB
    scoped budget (measured: wpb=8 at n=144, C=512 allocates 18.15 MB and
    the compiler aborts). Model, validated against that point (est. 20 MB):
    resident weights 4C²·is (÷ head_groups when grouped) + bias table +
    per-program blocks — x/out double-buffered, attn scratch, f32 qkv
    accumulators before the cast (≈ 3·(4+is)·rows·C), LN temp, the f32
    accumulator scratch when grouped, plus the mask block when shifted."""
    budget = 14 * 2**20
    fixed = (4 * c * c * itemsize) // head_groups + (
        h // head_groups
    ) * nb * nb * 4
    # small-C shapes amortize per-program overheads over more windows:
    # chip sweep (scripts/profile_swin_stage0.py, WORKLOG r4) — C=128
    # wpb=32 is ~8% faster than wpb=8, while C=256 prefers wpb=8 and
    # wpb=64 at C=256 crashes this build's compile helper.
    cands = (32, 16, 8, 4, 2) if c <= 128 else (8, 4, 2)
    for cand in cands:
        if bnw % cand or (masked and num_windows % cand):
            continue
        per = cand * (n * n * 4 * (2 if masked else 1)
                      + n * c * (5 * itemsize + 16)
                      + (n * c * 4 if head_groups > 1 else 0)
                      # grad-mode qkv residual stores: 3 double-buffered
                      # (wpb, n, C/G) output blocks
                      + (6 * n * (c // head_groups) * itemsize
                         if emit_qkv else 0))
        if fixed + per <= budget:
            return cand
    return 1


def block_kernel_head_groups(c: int, num_heads: int, itemsize: int,
                             budget: int = 5 * 2**20) -> int | None:
    """Head-group count for the whole-block kernel at width ``c``, or None
    when no valid grouping exists. G=1 (all weights resident) when 4C²
    fits ``budget``; otherwise the smallest power-of-two G dividing H with
    4C²/G under budget AND lane-aligned group columns ((H/G)·D % 128 == 0
    — the Mosaic (wpb·N, C) collapse constraint). ViT-B bf16 → 1;
    ViT-L/CLIP-L/Swin-stage-3 (C=1024) bf16 → 2."""
    if c % 128:
        return None
    d = c // num_heads
    g = 1
    while g <= num_heads:
        if (4 * c * c * itemsize) // g <= budget:
            gc = (num_heads // g) * d
            return g if gc % 128 == 0 else None
        g *= 2
        if g <= num_heads and num_heads % g:
            return None
    return None


def window_block_pallas(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp,
                        bp, rel_bias, mask=None, *, num_windows: int = 1,
                        eps: float = 1e-5, wpb: int | None = None,
                        head_groups: int | None = None,
                        interpret: bool = False):
    """Fused Swin block attention half: ``x + proj(attn(LN(x)))``.

    x: (B·nW, N, C) PRE-norm windowed input (roll applied by the caller for
    shifted blocks — roll commutes with the per-token LN and residual).
    w{q,k,v}: (C, H·D); wp: (C, C); rel_bias: (H, N, N); mask: (nW, N, N).
    ``wpb`` windows are processed per program (qkv/proj matmuls run at
    M = wpb·N rows); must divide B·nW and, when masked, num_windows.
    ``head_groups`` streams the weights in G head-contiguous slices so
    large-C models (ViT-L/CLIP-L/Swin stage 3) fit the VMEM budget; None →
    ``block_kernel_head_groups`` policy. Differentiable: custom VJP with
    exact gradients for all inputs.
    """
    bnw, n, c = x.shape
    h = rel_bias.shape[0]
    if head_groups is None:
        head_groups = block_kernel_head_groups(
            c, h, jnp.dtype(x.dtype).itemsize
        ) or 1
    if wpb is None:
        wpb = _wpb_auto(bnw, n, c, h, rel_bias.shape[1],
                        jnp.dtype(x.dtype).itemsize, mask is not None,
                        num_windows, head_groups)
    return _window_block(
        x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, wp, bp,
        jnp.asarray(rel_bias, jnp.float32),
        None if mask is None else jnp.asarray(mask, jnp.float32),
        h, num_windows, eps, wpb, head_groups, interpret,
    )
