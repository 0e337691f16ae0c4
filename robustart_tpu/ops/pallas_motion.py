"""Pallas TPU kernel: motion blur with per-image (runtime) tap offsets.

motion_blur / snow pick a random angle per image (reference
corruptions.py:128-148 via ImageMagick MotionBlurImage). Keeping that
jittable in XLA forced the union-taps form (ops/image.motion_blur_bank):
every integer offset in the UNION of all 32 bank angles' kernels becomes a
full-image HBM stream weighted by an idx-selected column — ~300+ streams of
which only ~n_taps ≤ 21 are nonzero for any given image (measured 1,926
img/s in the int8 ResNet-50 pipeline, benchmarks/corruptions.json). The
lax.switch direct form executes all 32 branches under vmap AND its fusion
with the int8 ResNet crashes this build's XLA TPU compile helper.

Here the image sits in VMEM and the tap loop walks only THIS image's
kernel: the angle-selected (dy, dx, weight) rows arrive as runtime scalars
(SMEM), and each tap is a `pltpu.roll` of a statically-sliced aligned
window (the same Mosaic addressing pattern as ops/pallas_warp.py — dynamic
ref-slice starts must be provably tile-aligned, roll amounts may be
traced). HBM traffic collapses to one read + one write.

Exactness: out[i, j] = Σ_t w_t · pad[i + py + dy_t, j + px + dx_t] with
edge padding — term-for-term the per-angle tap sum of ops.image.motion_blur
(same offsets, same weights, same edge-replicate boundary, f32 accumulation
in tap order; agreement is ulp-level rather than bitwise because the VPU
fuses the multiply-accumulate — tests pin max|Δ| ≤ 2e-7, the same
summation-order tolerance class as the union-taps form's existing test).
Zero-weight padding rows (per-angle tables are padded to a common tap
count) contribute exact ``0.0 * tap``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from robustart_tpu.ops.image import motion_blur_offsets

TILE_H = 8


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _mb_kernel(dy_ref, dx_ref, wt_ref, pad_ref, o_ref, *, py: int, px: int,
               w: int, c: int, n_taps: int):
    t = pl.program_id(0)
    hw = _align(TILE_H + 2 * py, 8)
    wp = pad_ref.shape[2]  # lane-aligned by the caller
    # rows [t·TILE_H, t·TILE_H + hw) of the padded image cover every
    # (py + dy) tap row of output rows [t·TILE_H, (t+1)·TILE_H); the start
    # is t·TILE_H — statically provable sublane alignment
    window = pad_ref[:, pl.ds(t * TILE_H, hw), :]  # (C, hw, Wp)

    def body(ti, acc):
        dyt = dy_ref[0, ti]
        dxt = dx_ref[0, ti]
        wv = wt_ref[0, ti]
        # bring window row (py + dyt) to row 0 (jnp.roll semantics:
        # element k lands at k + shift mod n)
        ru = pltpu.roll(window, hw - (py + dyt), axis=1)[:, :TILE_H]
        rv = pltpu.roll(ru, wp - (px + dxt), axis=2)
        return acc + wv * rv[:, :, :w]

    acc = jax.lax.fori_loop(
        0, n_taps, body, jnp.zeros((c, TILE_H, w), jnp.float32)
    )
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("py", "px", "interpret"))
def motion_taps_pallas(img: jax.Array, dy: jax.Array, dx: jax.Array,
                       wt: jax.Array, py: int, px: int,
                       interpret: bool = False) -> jax.Array:
    """Σ_t wt[t] · edge-padded-shift(img, dy[t], dx[t]) for one (H, W, C)
    f32 image; |dy[t]| ≤ py and |dx[t]| ≤ px (static pad bounds).
    vmap-compatible (batch becomes a leading grid dimension)."""
    h, w, c = img.shape
    py, px = int(py), int(px)
    if h % TILE_H:
        raise ValueError(f"H={h} not a multiple of {TILE_H}")
    (n_taps,) = dy.shape
    pad = jnp.pad(img, ((py, py), (px, px), (0, 0)), mode="edge")
    pad = jnp.transpose(pad, (2, 0, 1)).astype(jnp.float32)  # (C, Hp, Wp)
    hw = _align(TILE_H + 2 * py, 8)
    hp_need = (h - TILE_H) + hw
    wp_need = _align(pad.shape[2], 128)
    pad = jnp.pad(pad, ((0, 0), (0, max(0, hp_need - pad.shape[1])),
                        (0, wp_need - pad.shape[2])))
    out = pl.pallas_call(
        functools.partial(_mb_kernel, py=py, px=px, w=w, c=c, n_taps=n_taps),
        grid=(h // TILE_H,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # whole padded image; constant index map — DMA'd once,
            # revisited across row tiles
            pl.BlockSpec(pad.shape, lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, TILE_H, w), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(dy.astype(jnp.int32).reshape(1, -1), dx.astype(jnp.int32).reshape(1, -1),
      wt.astype(jnp.float32).reshape(1, -1), pad)
    return jnp.transpose(out, (1, 2, 0)).astype(img.dtype)


@functools.lru_cache(maxsize=None)
def _angle_tap_table(radius: float, sigma: float, angles: tuple):
    """(A, T) dy/dx/weight tables, one row per bank angle, zero-padded to
    the max tap count; plus the (py, px) pad bounds."""
    rows = [motion_blur_offsets(radius, sigma, a) for a in angles]
    t_max = max(len(w) for _, _, w in rows)
    a = len(angles)
    DY = np.zeros((a, t_max), np.int32)
    DX = np.zeros((a, t_max), np.int32)
    WT = np.zeros((a, t_max), np.float32)
    for i, (dx_r, dy_r, w_r) in enumerate(rows):
        DY[i, :len(w_r)] = dy_r
        DX[i, :len(w_r)] = dx_r
        WT[i, :len(w_r)] = w_r
    return DY, DX, WT, int(np.abs(DY).max()), int(np.abs(DX).max())


def motion_blur_bank_pallas(x: jax.Array, idx: jax.Array, radius: float,
                            sigma: float, angles: tuple,
                            interpret: bool = False) -> jax.Array:
    """Motion blur of one (H, W, C) image at bank angle ``idx`` — the VMEM
    tap-loop replacement for ops.image.motion_blur_bank's union streams.

    The per-image tap row is selected from the host-built table by a
    one-hot contraction (a vmapped dynamic row slice would lower to the
    multi-element lax.gather this build's compile helper rejects)."""
    DY, DX, WT, py, px = _angle_tap_table(
        float(radius), float(sigma), tuple(float(a) for a in angles)
    )
    onehot = (jnp.arange(DY.shape[0]) == idx)
    dy = jnp.sum(jnp.asarray(DY) * onehot[:, None], axis=0)
    dx = jnp.sum(jnp.asarray(DX) * onehot[:, None], axis=0)
    wt = jnp.sum(jnp.asarray(WT) * onehot[:, None].astype(jnp.float32),
                 axis=0)
    return motion_taps_pallas(x, dy, dx, wt, py, px, interpret=interpret)
