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


def _ln_f32(x, scale, bias, eps):
    """LayerNorm over the last axis with f32 statistics (the fused kernels'
    in-VMEM numerics; same formula as models/layers.py::layer_norm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def mlp_reference(x, w1, b1, w2, b2, gamma=None, shortcut=None,
                  act: str = "gelu", ln=None, ln_eps: float = 1e-6):
    """XLA reference (used by the CPU path, the VJP, and parity tests).
    Matmuls in the input dtype with f32 accumulation — the flax
    ``nn.Dense`` contract. ``ln=(scale, bias)``: x is the PRE-norm input and
    LayerNorm runs first (f32 stats)."""
    f = _act_fn(act)
    if ln is not None:
        x = _ln_f32(x, ln[0], ln[1], ln_eps).astype(x.dtype)
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
                lns_ref, lnb_ref, o_ref, *rest, nf: int, act: str,
                has_gamma: bool, has_shortcut: bool, has_ln: bool,
                ln_eps: float, residual_input: bool, emit_u: bool = False):
    if emit_u:
        u_ref, acc_ref = rest
    else:
        (acc_ref,) = rest
    fi = pl.program_id(1)

    @pl.when(fi == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    if has_ln:
        # LN prologue (recomputed per F-chunk — pure VPU math on a tile
        # already resident in VMEM; saves the standalone LayerNorm's HBM
        # round trip). M-pad rows are all-zero → var 0 → finite via eps.
        xin = _ln_f32(x_ref[:], lns_ref[0], lnb_ref[0], ln_eps).astype(
            x_ref.dtype
        )
    else:
        xin = x_ref[:]
    h = jax.lax.dot_general(
        xin, w1_ref[:].astype(x_ref.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    if emit_u:
        # grad-mode residual: the fc1 pre-activation, streamed out so the
        # backward never re-runs the fc1 matmul (stored in the activation
        # dtype — the same rounding the fwd's fc2 input already carries)
        u_ref[:] = h.astype(u_ref.dtype)
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
        if residual_input:
            # residual = the RAW pre-norm input tile (already in VMEM) —
            # no second shortcut stream from HBM
            y = y + x_ref[:].astype(jnp.float32)
        elif has_shortcut:
            y = y + s_ref[:].astype(jnp.float32)
        o_ref[:] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "act", "has_gamma", "has_shortcut", "interpret", "has_ln", "ln_eps",
        "residual_input", "emit_u",
    ),
)
def _mlp_impl(x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, *, act: str,
              has_gamma: bool, has_shortcut: bool, has_ln: bool = False,
              ln_eps: float = 1e-6, residual_input: bool = False,
              interpret: bool = False, emit_u: bool = False):
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
    # emit_u adds a double-buffered (tm, tf) output block to the pipeline —
    # include it in the streamed-bytes budget so grad mode never
    # oversubscribes VMEM where eval mode fit
    row_bytes = 2 * c * bytes_per + (
        2 * tm * jnp.dtype(x.dtype).itemsize if emit_u else 0
    )
    while row_bytes * tf > 4 * 1024 * 1024 and tf % 2 == 0:
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
    lns_arg = lns.reshape(1, c) if has_ln else jnp.zeros((1, c), x.dtype)
    lnb_arg = lnb.reshape(1, c) if has_ln else jnp.zeros((1, c), x.dtype)
    if emit_u:
        out_specs = [
            pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tf), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ]
        out_shapes = [jax.ShapeDtypeStruct((mp, c), x.dtype),
                      jax.ShapeDtypeStruct((mp, f), x.dtype)]
    else:
        out_specs = pl.BlockSpec((tm, c), lambda i, j: (i, 0),
                                 memory_space=pltpu.VMEM)
        out_shapes = jax.ShapeDtypeStruct((mp, c), x.dtype)
    out = pl.pallas_call(
        functools.partial(
            _mlp_kernel, nf=nf, act=act, has_gamma=has_gamma,
            has_shortcut=has_shortcut, has_ln=has_ln, ln_eps=ln_eps,
            residual_input=residual_input, emit_u=emit_u,
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
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((tm, c), jnp.float32)],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(1, c), g_arg, s_arg,
      lns_arg, lnb_arg)
    if emit_u:
        return out[0][:m], out[1][:m]
    return out[:m]


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def _mlp(x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, act, interpret,
         ln_eps, residual_input):
    return _mlp_impl(
        x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, act=act,
        has_gamma=gamma is not None, has_shortcut=shortcut is not None,
        has_ln=lns is not None, ln_eps=ln_eps,
        residual_input=residual_input, interpret=interpret,
    )


def _mlp_fwd(x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, act, interpret,
             ln_eps, residual_input):
    """Grad-mode forward: the kernel additionally streams out the fc1
    pre-activation ``u`` so the backward never re-runs the fc1 matmul (the
    dominant cost of the old recompute-through-XLA VJP)."""
    out, u = _mlp_impl(
        x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, act=act,
        has_gamma=gamma is not None, has_shortcut=shortcut is not None,
        has_ln=lns is not None, ln_eps=ln_eps,
        residual_input=residual_input, interpret=interpret, emit_u=True,
    )
    return out, (x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, u)


def _mlp_bwd(act, interpret, ln_eps, residual_input, residuals, g):
    """Hand-composed exact gradients from the saved pre-activation: the
    only recomputes are elementwise (LN prologue, act(u)) plus — when the
    ConvNeXt layer-scale gamma is present — the fc2 matmul for dgamma
    (dead-code-eliminated by XLA whenever the gamma cotangent is unused,
    e.g. input-gradient attacks). ``u`` carries the activation dtype: in
    bf16 models act'(u) sees the same rounding the fwd's fc2 input did."""
    del interpret
    x, w1, b1, w2, b2, gamma, shortcut, lns, lnb, u = residuals
    f32 = jnp.float32
    gf = g.astype(f32)

    if lns is not None:
        def ln_fn(xx, ss, bb):
            return _ln_f32(xx, ss, bb, ln_eps).astype(x.dtype)

        xin, ln_vjp = jax.vjp(ln_fn, x, lns, lnb)
    else:
        xin, ln_vjp = x, None
    h_f32, act_vjp = jax.vjp(_act_fn(act), u.astype(f32))
    h = h_f32.astype(x.dtype)

    if gamma is not None:
        # pre-gamma value, only consumer is dgamma (see docstring)
        pre = jnp.dot(h, w2.astype(x.dtype),
                      preferred_element_type=f32) + b2.astype(f32)
        dgamma = jnp.sum(gf * pre, axis=0).astype(gamma.dtype)
        gy = gf * gamma.astype(f32)
    else:
        dgamma = None
        gy = gf
    gyc = gy.astype(x.dtype)
    dh = jnp.dot(gyc, w2.T.astype(x.dtype), preferred_element_type=f32)
    dw2 = jnp.dot(h.T, gyc, preferred_element_type=f32).astype(w2.dtype)
    db2 = jnp.sum(gy, axis=0).astype(b2.dtype)
    du = act_vjp(dh)[0]
    duc = du.astype(x.dtype)
    dxin = jnp.dot(duc, w1.T.astype(x.dtype), preferred_element_type=f32)
    dw1 = jnp.dot(xin.T.astype(x.dtype), duc,
                  preferred_element_type=f32).astype(w1.dtype)
    db1 = jnp.sum(du, axis=0).astype(b1.dtype)
    if ln_vjp is not None:
        dx, dlns, dlnb = ln_vjp(dxin.astype(x.dtype))
        dx = dx.astype(f32)
        dlns = dlns.astype(lns.dtype)
        dlnb = dlnb.astype(lnb.dtype)
    else:
        dx, dlns, dlnb = dxin, None, None
    if residual_input:
        # residual path reuses the SAME x — its cotangent accumulates here
        dx = dx + gf
    # the shortcut is added AFTER the layer-scale (mlp_reference): its
    # cotangent is g itself, not g·gamma
    dshort = g.astype(shortcut.dtype) if shortcut is not None else None
    return (dx.astype(x.dtype), dw1, db1, dw2, db2, dgamma, dshort,
            dlns, dlnb)


_mlp.defvjp(_mlp_fwd, _mlp_bwd)


def mlp_pallas(x, w1, b1, w2, b2, gamma=None, shortcut=None,
               act: str = "gelu", interpret: bool = False, ln=None,
               ln_eps: float = 1e-6, residual_input: bool = False):
    """Fused MLP: ``[LN] → act(x@W1+b1)@W2+b2 [·gamma] [+shortcut]``.

    x: (..., C) — leading dims are flattened to rows; W1 (C, F), W2 (F, C).
    ``gamma`` (C,) applies the ConvNeXt layer-scale in the epilogue;
    ``shortcut`` (broadcast-compatible with x) fuses the residual add.
    ``ln=(scale, bias)``: x is the PRE-norm input — LayerNorm (f32 stats,
    ``ln_eps``) runs as a prologue inside the kernel, saving the standalone
    LayerNorm's HBM round trip. ``residual_input=True`` adds the raw
    pre-norm x as the residual from the tile already in VMEM (use instead
    of ``shortcut=x`` — no second HBM stream).
    Differentiable (custom VJP → exact XLA reference gradients, incl. the
    LN parameters).
    """
    shape = x.shape
    c = shape[-1]
    x2 = x.reshape(-1, c)
    s2 = None if shortcut is None else shortcut.reshape(-1, c)
    lns, lnb = ln if ln is not None else (None, None)
    out = _mlp(x2, w1, b1, w2, b2, gamma, s2, lns, lnb, act, interpret,
               ln_eps, residual_input)
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# token-mixing MLP (MLP-Mixer): MLP along the TOKEN axis of (B, T, C)
# without materializing the (B, C, T) transpose in HBM
# ---------------------------------------------------------------------------


def token_mlp_reference(x, w1, b1, w2, b2, shortcut=None, act: str = "gelu",
                        ln=None, ln_eps: float = 1e-6):
    """XLA reference for the token-mixing MLP.

    Semantically ``swapaxes(mlp(swapaxes(x, 1, 2)), 1, 2)`` for x (B, T, C),
    w1 (T, H), w2 (H, T) — written as token-axis contractions so no
    transpose is materialized. Matmuls accumulate in f32.
    ``ln=(scale, bias)``: LayerNorm over C (f32 stats) runs first.
    """
    f = _act_fn(act)
    if ln is not None:
        x = _ln_f32(x, ln[0], ln[1], ln_eps).astype(x.dtype)
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


def _token_mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, s_ref,
                      lns_ref, lnb_ref, o_ref, *rest, act: str,
                      has_shortcut: bool, has_ln: bool, ln_eps: float,
                      residual_input: bool, emit_u: bool = False):
    u_ref = rest[0] if emit_u else None
    x_raw = x_ref[0]  # (T, Cc)
    if has_ln:
        # LN over C — requires the full-C tile (tc == C, enforced below)
        x_t = _ln_f32(x_raw, lns_ref[0], lnb_ref[0], ln_eps).astype(
            x_raw.dtype
        )
    else:
        x_t = x_raw
    # Contract over T on the LHS dim 0 — Mosaic folds the layout swap into
    # the MXU pass, so the (C, T) view never exists in HBM.
    h = jax.lax.dot_general(
        x_t, w1_ref[:].astype(x_t.dtype),
        dimension_numbers=(((0,), (0,)), ((), ())),  # (Cc, H)
        preferred_element_type=jnp.float32,
    ) + b1_ref[0].astype(jnp.float32)
    if emit_u:
        # grad-mode residual: the token-mix pre-activation (see _mlp_kernel)
        u_ref[0] = h.astype(u_ref.dtype)
    h = _act_fn(act, in_kernel=True)(h).astype(x_t.dtype)
    # (H, T) contracted with (Cc, H) over H -> (T, Cc): output lands back in
    # the (T, C) layout directly
    y = jax.lax.dot_general(
        w2_ref[:].astype(x_t.dtype), h,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[:].astype(jnp.float32)
    if residual_input:
        y = y + x_raw.astype(jnp.float32)
    elif has_shortcut:
        y = y + s_ref[0].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "act", "has_shortcut", "interpret", "has_ln", "ln_eps",
        "residual_input", "emit_u",
    ),
)
def _token_mlp_impl(x, w1, b1, w2, b2, shortcut, lns, lnb, *, act: str,
                    has_shortcut: bool, has_ln: bool = False,
                    ln_eps: float = 1e-6, residual_input: bool = False,
                    interpret: bool = False, emit_u: bool = False):
    b, t, c = x.shape
    f = w1.shape[1]
    # the in-kernel LN normalizes over C, so the program must see the full
    # channel extent; without LN keep the 512-chunk streaming
    tc = c if has_ln else min(512, c)
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

    lns_arg = lns.reshape(1, c) if has_ln else jnp.zeros((1, tc), x.dtype)
    lnb_arg = lnb.reshape(1, c) if has_ln else jnp.zeros((1, tc), x.dtype)
    o_spec = pl.BlockSpec((1, t, tc), lambda i, j: (i, 0, j),
                          memory_space=pltpu.VMEM)
    if emit_u:
        out_specs = [o_spec, pl.BlockSpec((1, tc, f), lambda i, j: (i, j, 0),
                                          memory_space=pltpu.VMEM)]
        out_shapes = [jax.ShapeDtypeStruct((b, t, c), x.dtype),
                      jax.ShapeDtypeStruct((b, c, f), x.dtype)]
    else:
        out_specs = o_spec
        out_shapes = jax.ShapeDtypeStruct((b, t, c), x.dtype)
    return pl.pallas_call(
        functools.partial(
            _token_mlp_kernel, act=act, has_shortcut=has_shortcut,
            has_ln=has_ln, ln_eps=ln_eps, residual_input=residual_input,
            emit_u=emit_u,
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
            # has_ln forces tc == c (one channel block), so index (0, 0) is
            # the whole LN vector; without LN the zeros placeholder is a
            # single (1, tc) block — (0, j) would read past it when c > tc
            pl.BlockSpec((1, tc), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, w1, b1.reshape(1, f), w2, b2.reshape(t, 1), s_arg,
      lns_arg, lnb_arg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11))
def _token_mlp(x, w1, b1, w2, b2, shortcut, lns, lnb, act, interpret,
               ln_eps, residual_input):
    return _token_mlp_impl(
        x, w1, b1, w2, b2, shortcut, lns, lnb, act=act,
        has_shortcut=shortcut is not None, has_ln=lns is not None,
        ln_eps=ln_eps, residual_input=residual_input, interpret=interpret,
    )


def _token_mlp_fwd(x, w1, b1, w2, b2, shortcut, lns, lnb, act, interpret,
                   ln_eps, residual_input):
    """Grad-mode forward: also streams out the (B, C, H) token-mix
    pre-activation so the backward never re-runs the fc1 contraction."""
    out, u = _token_mlp_impl(
        x, w1, b1, w2, b2, shortcut, lns, lnb, act=act,
        has_shortcut=shortcut is not None, has_ln=lns is not None,
        ln_eps=ln_eps, residual_input=residual_input, interpret=interpret,
        emit_u=True,
    )
    return out, (x, w1, b1, w2, b2, shortcut, lns, lnb, u)


def _token_mlp_bwd(act, interpret, ln_eps, residual_input, residuals, g):
    """Hand-composed exact gradients from the saved pre-activation
    (token_mlp_reference semantics: u[b,c,h] = Σ_t LN(x)[b,t,c]·w1[t,h],
    y[b,t,c] = Σ_h act(u)[b,c,h]·w2[h,t] + b2[t] [+ shortcut])."""
    del interpret
    x, w1, b1, w2, b2, shortcut, lns, lnb, u = residuals
    f32 = jnp.float32
    gf = g.astype(f32)
    gc = g.astype(x.dtype)

    if lns is not None:
        def ln_fn(xx, ss, bb):
            return _ln_f32(xx, ss, bb, ln_eps).astype(x.dtype)

        xn, ln_vjp = jax.vjp(ln_fn, x, lns, lnb)
    else:
        xn, ln_vjp = x, None
    h_f32, act_vjp = jax.vjp(_act_fn(act), u.astype(f32))
    h = h_f32.astype(x.dtype)

    db2 = jnp.sum(gf, axis=(0, 2)).astype(b2.dtype)  # (T,)
    # y[b,t,c] = Σ_h h[b,c,h] w2[h,t]
    dh = jnp.einsum("btc,ht->bch", gc, w2.astype(x.dtype),
                    preferred_element_type=f32)
    dw2 = jnp.einsum("bch,btc->ht", h, gc,
                     preferred_element_type=f32).astype(w2.dtype)
    du = act_vjp(dh)[0]
    duc = du.astype(x.dtype)
    db1 = jnp.sum(du, axis=(0, 1)).astype(b1.dtype)  # (H,)
    # u[b,c,h] = Σ_t xn[b,t,c] w1[t,h]
    dxn = jnp.einsum("bch,th->btc", duc, w1.astype(x.dtype),
                     preferred_element_type=f32).astype(x.dtype)
    dw1 = jnp.einsum("btc,bch->th", xn.astype(x.dtype), duc,
                     preferred_element_type=f32).astype(w1.dtype)
    if ln_vjp is not None:
        dx, dlns, dlnb = ln_vjp(dxn)
        dx = dx.astype(f32)
        dlns = dlns.astype(lns.dtype)
        dlnb = dlnb.astype(lnb.dtype)
    else:
        dx, dlns, dlnb = dxn.astype(f32), None, None
    if residual_input:
        dx = dx + gf
    dshort = g.astype(shortcut.dtype) if shortcut is not None else None
    return (dx.astype(x.dtype), dw1, db1, dw2, db2, dshort, dlns, dlnb)


_token_mlp.defvjp(_token_mlp_fwd, _token_mlp_bwd)


def token_mlp_pallas(x, w1, b1, w2, b2, shortcut=None, act: str = "gelu",
                     interpret: bool = False, ln=None, ln_eps: float = 1e-6,
                     residual_input: bool = False):
    """Token-mixing MLP for (B, T, C) activations, transpose-free.

    Computes ``swapaxes(act(swapaxes(x) @ W1 + b1) @ W2 + b2)`` — the
    MLP-Mixer token-mixing step — with the token-axis contraction done
    inside one VMEM program per (batch, C-chunk): neither the (B, C, T)
    transpose nor the (B, C, H) intermediate ever touches HBM.
    ``shortcut`` fuses the residual add. ``ln=(scale, bias)`` runs
    LayerNorm over C as an in-kernel prologue (forces full-C tiles);
    ``residual_input=True`` adds the raw pre-norm x from VMEM.
    Differentiable (custom VJP).
    """
    lns, lnb = ln if ln is not None else (None, None)
    return _token_mlp(x, w1, b1, w2, b2, shortcut, lns, lnb, act, interpret,
                      ln_eps, residual_input)
