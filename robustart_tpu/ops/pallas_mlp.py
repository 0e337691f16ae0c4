"""Pallas TPU kernel: fused transformer/ConvNeXt MLP.

    y = act(x @ W1 + b1) @ W2 + b2   [· gamma]   [+ shortcut]

XLA cannot fuse across two dots: the (M, F) intermediate — 4× wider than
the activation — round-trips through HBM between fc1 and fc2 (for
convnext_base that is ~93 MB/image summed over stages; similar for
ViT/Mixer/Swin MLPs). This kernel tiles M and chunks F, keeping the
intermediate in VMEM: HBM traffic drops from x + 2·4x + y to x + y (plus
one weight pass per M-tile, amortized by the M grid being outermost...
weights actually stream once per (m, f) step — the F-chunking keeps each
resident block ≤ ~8 MB so the weight re-reads ride the same stream the
matmul needs anyway).

The epilogue optionally applies the ConvNeXt layer-scale gamma and the
residual add (valid in deterministic forwards: DropPath at eval is the
identity). Differentiable via custom VJP (recompute through the XLA
reference with jax.vjp — exact input and parameter gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7) — Mosaic has
    no erf/erfc lowering, and 1.5e-7 absolute is far below bf16/f32 model
    tolerances."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741 + t * (
        -1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act_fn(name: str, in_kernel: bool = False):
    if name == "gelu":
        if in_kernel:
            return lambda h: h * 0.5 * (1.0 + _erf_poly(h / np.sqrt(2.0)))
        return lambda h: jax.nn.gelu(h, approximate=False)
    if name == "gelu_tanh":
        return lambda h: jax.nn.gelu(h, approximate=True)
    if name == "quick_gelu":
        return lambda h: h * jax.nn.sigmoid(1.702 * h)
    if name == "relu":
        return jax.nn.relu
    raise ValueError(f"unknown act {name!r}")


def mlp_reference(x, w1, b1, w2, b2, gamma=None, shortcut=None,
                  act: str = "gelu"):
    """XLA reference (used by the CPU path, the VJP, and parity tests).
    Matmuls in the input dtype with f32 accumulation — the flax
    ``nn.Dense`` contract."""
    f = _act_fn(act)
    h = jnp.dot(x, w1.astype(x.dtype),
                preferred_element_type=jnp.float32) + b1.astype(jnp.float32)
    h = f(h).astype(x.dtype)
    y = jnp.dot(h, w2.astype(x.dtype),
                preferred_element_type=jnp.float32) + b2.astype(jnp.float32)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    if shortcut is not None:
        y = y + shortcut.astype(jnp.float32)
    return y.astype(x.dtype)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, s_ref,
                o_ref, acc_ref, *, nf: int, act: str, has_gamma: bool,
                has_shortcut: bool):
    fi = pl.program_id(1)

    @pl.when(fi == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    h = jax.lax.dot_general(
        x_ref[:], w1_ref[:].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _act_fn(act, in_kernel=True)(h).astype(x_ref.dtype)
    acc_ref[:] += jax.lax.dot_general(
        h, w2_ref[:].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(fi == nf - 1)
    def _epilogue():
        y = acc_ref[:] + b2_ref[0].astype(jnp.float32)
        if has_gamma:
            y = y * g_ref[0].astype(jnp.float32)
        if has_shortcut:
            y = y + s_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "has_gamma", "has_shortcut", "interpret")
)
def _mlp_impl(x, w1, b1, w2, b2, gamma, shortcut, *, act: str,
              has_gamma: bool, has_shortcut: bool, interpret: bool = False):
    m, c = x.shape
    f = w1.shape[1]
    tm = min(256, m)
    mp = -(-m // tm) * tm
    if mp != m:
        x = jnp.pad(x, ((0, mp - m), (0, 0)))
        if has_shortcut:
            shortcut = jnp.pad(shortcut, ((0, mp - m), (0, 0)))
    # F chunk: keep each streamed W1/W2 block pair ≤ ~4 MB of VMEM — the
    # pipeline double-buffers streamed blocks, and an 8 MB pair plus the
    # x/out/acc/h tiles oversubscribed VMEM (TPU compiler crash at C=1024,
    # WORKLOG r3)
    bytes_per = jnp.dtype(w1.dtype).itemsize
    tf = f
    while 2 * c * tf * bytes_per > 4 * 1024 * 1024 and tf % 2 == 0:
        tf //= 2
    nf = f // tf
    g_arg = gamma.reshape(1, c) if has_gamma else jnp.zeros((1, c), x.dtype)
    s_arg = shortcut if has_shortcut else jnp.zeros((1, c), x.dtype)
    s_spec = (
        pl.BlockSpec((tm, c), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
        if has_shortcut
        else pl.BlockSpec((1, c), lambda i, j: (0, 0),
                          memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, nf=nf, act=act, has_gamma=has_gamma,
            has_shortcut=has_shortcut,
        ),
        grid=(mp // tm, nf),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tf, c), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(1, c), g_arg, s_arg)
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _mlp(x, w1, b1, w2, b2, gamma, shortcut, act, interpret):
    return _mlp_impl(
        x, w1, b1, w2, b2, gamma, shortcut, act=act,
        has_gamma=gamma is not None, has_shortcut=shortcut is not None,
        interpret=interpret,
    )


def _mlp_fwd(x, w1, b1, w2, b2, gamma, shortcut, act, interpret):
    out = _mlp_impl(
        x, w1, b1, w2, b2, gamma, shortcut, act=act,
        has_gamma=gamma is not None, has_shortcut=shortcut is not None,
        interpret=interpret,
    )
    return out, (x, w1, b1, w2, b2, gamma, shortcut)


def _mlp_bwd(act, interpret, residuals, g):
    del interpret
    x, w1, b1, w2, b2, gamma, shortcut = residuals
    has_gamma = gamma is not None
    has_shortcut = shortcut is not None

    def ref(x, w1, b1, w2, b2, gamma, shortcut):
        return mlp_reference(
            x, w1, b1, w2, b2,
            gamma if has_gamma else None,
            shortcut if has_shortcut else None,
            act=act,
        )

    args = (x, w1, b1, w2, b2,
            gamma if has_gamma else jnp.zeros_like(b2),
            shortcut if has_shortcut else jnp.zeros_like(x))
    _, vjp = jax.vjp(ref, *args)
    dx, dw1, db1, dw2, db2, dgamma, dshort = vjp(g.astype(x.dtype))
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dgamma.astype(gamma.dtype) if has_gamma else None,
            dshort.astype(shortcut.dtype) if has_shortcut else None)


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def mlp_pallas(x, w1, b1, w2, b2, gamma=None, shortcut=None,
               act: str = "gelu", interpret: bool = False):
    """Fused MLP: ``act(x@W1+b1)@W2+b2 [·gamma] [+shortcut]``.

    x: (..., C) — leading dims are flattened to rows; W1 (C, F), W2 (F, C).
    ``gamma`` (C,) applies the ConvNeXt layer-scale in the epilogue;
    ``shortcut`` (broadcast-compatible with x) fuses the residual add.
    Differentiable (custom VJP → exact XLA reference gradients).
    """
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    s2 = None if shortcut is None else shortcut.reshape(-1, c)
    out = _mlp(x2, w1, b1, w2, b2, gamma, s2, act, interpret)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# token-mixing MLP (MLP-Mixer): MLP along the TOKEN axis of (B, T, C)
# without materializing the (B, C, T) transpose in HBM
# ---------------------------------------------------------------------------


def token_mlp_reference(x, w1, b1, w2, b2, shortcut=None, act: str = "gelu"):
    """XLA reference for the token-mixing MLP.

    Semantically ``swapaxes(mlp(swapaxes(x, 1, 2)), 1, 2)`` for x (B, T, C),
    w1 (T, H), w2 (H, T) — written as token-axis contractions so no
    transpose is materialized. Matmuls accumulate in f32.
    """
    f = _act_fn(act)
    h = jax.lax.dot_general(
        x, w1.astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),  # (B, C, H)
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    h = f(h).astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2.astype(x.dtype),
        dimension_numbers=(((2,), (0,)), ((), ())),  # (B, C, T)
        preferred_element_type=jnp.float32,
    )
    y = jnp.swapaxes(y, 1, 2) + b2.astype(jnp.float32)[None, :, None]
    if shortcut is not None:
        y = y + shortcut.astype(jnp.float32)
    return y.astype(x.dtype)


def _token_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref, o_ref, *,
                      act: str, has_shortcut: bool):
    x_t = x_ref[0]  # (T, Cc)
    # Contract over T on the LHS dim 0 — Mosaic folds the layout swap into
    # the MXU pass, so the (C, T) view never exists in HBM.
    h = jax.lax.dot_general(
        x_t, w1_ref[:].astype(x_t.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # (Cc, H)
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    h = _act_fn(act, in_kernel=True)(h).astype(x_t.dtype)
    # (H, T) contracted with (Cc, H) over H -> (T, Cc): output lands back in
    # the (T, C) layout directly
    y = jax.lax.dot_general(
        w2_ref[:].astype(x_t.dtype), h,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    if has_shortcut:
        y = y + s_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("act", "has_shortcut", "interpret")
)
def _token_mlp_impl(x, w1, b1, w2, b2, shortcut, *, act: str,
                    has_shortcut: bool, interpret: bool = False):
    b, t, c = x.shape
    f = w1.shape[1]
    tc = min(512, c)
    while c % tc:
        tc //= 2
    s_arg = shortcut if has_shortcut else jnp.zeros((b, 1, tc), x.dtype)
    s_spec = (
        pl.BlockSpec((1, t, tc), lambda i, j: (i, 0, j),
                     memory_space=pltpu.VMEM)
        if has_shortcut
        else pl.BlockSpec((1, 1, tc), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    )

    return pl.pallas_call(
        functools.partial(
            _token_mlp_kernel, act=act, has_shortcut=has_shortcut
        ),
        grid=(b, c // tc),
        in_specs=[
            pl.BlockSpec((1, t, tc), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f, t), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            s_spec,
        ],
        out_specs=pl.BlockSpec((1, t, tc), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(t, 1), s_arg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _token_mlp(x, w1, b1, w2, b2, shortcut, act, interpret):
    return _token_mlp_impl(
        x, w1, b1, w2, b2, shortcut, act=act,
        has_shortcut=shortcut is not None, interpret=interpret,
    )


def _token_mlp_fwd(x, w1, b1, w2, b2, shortcut, act, interpret):
    out = _token_mlp_impl(
        x, w1, b1, w2, b2, shortcut, act=act,
        has_shortcut=shortcut is not None, interpret=interpret,
    )
    return out, (x, w1, b1, w2, b2, shortcut)


def _token_mlp_bwd(act, interpret, residuals, g):
    del interpret
    x, w1, b1, w2, b2, shortcut = residuals
    has_shortcut = shortcut is not None

    def ref(x, w1, b1, w2, b2, shortcut):
        return token_mlp_reference(
            x, w1, b1, w2, b2, shortcut if has_shortcut else None, act=act
        )

    args = (x, w1, b1, w2, b2,
            shortcut if has_shortcut else jnp.zeros_like(x))
    _, vjp = jax.vjp(ref, *args)
    dx, dw1, db1, dw2, db2, dshort = vjp(g.astype(x.dtype))
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dshort.astype(shortcut.dtype) if has_shortcut else None)


_token_mlp.defvjp(_token_mlp_fwd, _token_mlp_bwd)


def token_mlp_pallas(x, w1, b1, w2, b2, shortcut=None, act: str = "gelu",
                     interpret: bool = False):
    """Token-mixing MLP for (B, T, C) activations, transpose-free.

    Computes ``swapaxes(act(swapaxes(x) @ W1 + b1) @ W2 + b2)`` — the
    MLP-Mixer token-mixing step — with the token-axis contraction done
    inside one VMEM program per (batch, C-chunk): neither the (B, C, T)
    transpose nor the (B, C, H) intermediate ever touches HBM.
    ``shortcut`` fuses the residual add. Differentiable (custom VJP).
    """
    out = _token_mlp(x, w1, b1, w2, b2, shortcut, act, interpret)
    return out
