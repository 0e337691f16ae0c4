"""Pallas TPU kernel: fused ConvNeXt dwconv7×7 + LayerNorm (+ bias).

Measured on chip (WORKLOG round-2 ablation, convnext_base @ batch 256):
the 7×7 depthwise conv is ~27% of eval runtime and the block LN another
slice of ~14% — XLA lowers the depthwise conv as VPU work over an HBM
round-trip, then LN re-reads the activation twice more. This kernel does

    y = LN(dwconv7x7(x) + b) * gamma + beta        (per channel, eps 1e-6)

in ONE VMEM-resident program per image: the 49 shifted multiply-adds
accumulate in fp32 in VMEM, the LN statistics reduce over the lane (channel)
axis, and the activation makes exactly one HBM read + one write. The halo
(3 px) is materialized by an XLA pad outside the kernel (cheap, fuses with
the previous op's epilogue).

Reference behavior being fused: ConvNeXt block structure
(reference exprs/exp/imagenet-a_o-loop/config_convnext_base.yaml model;
torchvision/facebook ConvNeXt Block: dwconv → permute → LayerNorm →
pwconv1 → GELU → pwconv2). Differentiable via custom VJP: the backward
recomputes through an XLA reference forward (jax.vjp), so attacks and
parameter gradients are exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


def dwconv_ln_reference(x, w, b, gamma, beta, eps: float = _EPS):
    """XLA reference: grouped conv (flax kernel layout (7,7,1,C)) + LN.

    Used by the CPU path, the custom-VJP backward, and parity tests.
    """
    c = x.shape[-1]
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1), padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    y = (y + b.astype(y.dtype)).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    out = (y - mean) * jax.lax.rsqrt(var + eps)
    out = out * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(x.dtype)


def _dwln_kernel(x_ref, w_ref, b_ref, g_ref, bt_ref, o_ref, *,
                 hh: int, ww: int, eps: float):
    """One image: x_ref (1, H+6, W+6, C) padded; params (7·7, C)/(1, C).

    Tap order is dj-outer so the misaligned W slice (a sublane rotation on
    the (W, C) tile layout) happens 7×, not 49× — the di row offsets inside
    are free (H is the untiled dim)."""
    x = x_ref[0].astype(jnp.float32)  # (H+6, W+6, C)
    acc = jnp.zeros((hh, ww, x_ref.shape[-1]), jnp.float32)
    for dj in range(7):
        xs = x[:, dj:dj + ww, :]  # one sublane shift per dj
        for di in range(7):
            acc = acc + xs[di:di + hh] * w_ref[di * 7 + dj].astype(jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    mean = jnp.mean(acc, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(acc - mean), axis=-1, keepdims=True)
    y = (acc - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[0].astype(jnp.float32) + bt_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _dwconv_ln_impl(x, w, b, gamma, beta, interpret: bool = False):
    n, h, ww_, c = x.shape
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    w_flat = w.reshape(49, c)  # (7,7,1,C) → taps × channels
    params2d = [p.reshape(1, c) for p in (b, gamma, beta)]
    out = pl.pallas_call(
        functools.partial(_dwln_kernel, hh=h, ww=ww_, eps=_EPS),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 6, ww_ + 6, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((49, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, ww_, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, ww_, c), x.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xp, w_flat, *params2d)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _dwconv_ln(x, w, b, gamma, beta, interpret):
    return _dwconv_ln_impl(x, w, b, gamma, beta, interpret=interpret)


def _dwconv_ln_fwd(x, w, b, gamma, beta, interpret):
    out = _dwconv_ln_impl(x, w, b, gamma, beta, interpret=interpret)
    return out, (x, w, b, gamma, beta)


def _dwconv_ln_bwd(interpret, residuals, g):
    """Exact gradients by recomputation through the XLA reference forward
    (same pattern as ops/pallas_attention.py): one fused kernel forward is
    cheaper than stashing the conv output, and XLA differentiates the
    grouped conv + LN chain natively."""
    del interpret
    x, w, b, gamma, beta = residuals
    _, vjp = jax.vjp(dwconv_ln_reference, x, w, b, gamma, beta)
    dx, dw, db, dgamma, dbeta = vjp(g.astype(x.dtype))
    return (dx.astype(x.dtype), dw.astype(w.dtype), db.astype(b.dtype),
            dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype))


_dwconv_ln.defvjp(_dwconv_ln_fwd, _dwconv_ln_bwd)


def dwconv_ln_pallas(x, w, b, gamma, beta, interpret: bool = False):
    """Fused y = LN(dwconv7×7(x) + b)·gamma + beta.

    x: (N, H, W, C); w: (7, 7, 1, C) flax grouped-conv kernel; b/gamma/beta:
    (C,). Differentiable (custom VJP → XLA reference gradients).
    """
    return _dwconv_ln(x, w, b, gamma, beta, interpret)
