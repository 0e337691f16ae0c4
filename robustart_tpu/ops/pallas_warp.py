"""Pallas TPU kernel: bounded-displacement bilinear warp (elastic hot path).

elastic_transform (reference RobustART/noise/utils/imagenet_c/
corruptions.py:392-427) is two bilinear warps, and on this chip it is the
corruption sweep's one structural outlier (148 img/s vs a 5,878 geomean,
benchmarks/corruptions.json): XLA's TPU gather lowering is rate-bound at
~380-400 img/s per warp whatever the indexing scheme, every
multi-element-slice `lax.gather` crashes this build's compile helper, and
the unrolled masked-slice band does too above ~700 taps
(scripts/bench_warp_bounded.py, WORKLOG round 4).

This kernel implements the banded-select warp with the image tile resident
in VMEM, which changes the economics twice over:

- the O((2Dy+1)(2Dx+1)) masked taps read VMEM, not HBM (the unrolled XLA
  form streams the full image from HBM per tap — layout probe: ~410 GB/s
  aggregate, no stream sharing);
- the tap loops run over the PER-TILE offset range actually present
  (runtime min/max of the integer offsets), not the static worst case.
  The displacement fields are smooth (a gaussian-blurred field and a
  near-identity affine), so an 8-row tile typically spans a small
  fraction of the static band — the static bound (Dy, Dx) only sizes the
  pad.

Exactness contract (same as ops/image._map_coords_banded): masks are
disjoint and exhaustive over the band, each output element accumulates
exactly one bilinear value plus zeros, and the bilinear arithmetic is the
gather path's expression verbatim — bitwise-equal results
(tests/test_pallas_warp.py).

Layout: channels-first (C, H, W) inside the kernel so the lane dimension
is W (224) instead of C (3); NHWC in/out at the API boundary.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8


def _kernel(cy_ref, cx_ref, pad_ref, o_ref, *, dy: int, dx: int, h: int,
            w: int, c: int):
    t = pl.program_id(0)
    cy = cy_ref[...]  # (TILE_H, W) f32
    cx = cx_ref[...]
    y0f = jnp.floor(cy)
    x0f = jnp.floor(cx)
    fy = cy - y0f  # (TILE_H, W)
    fx = cx - x0f
    rows = (t * TILE_H
            + jax.lax.broadcasted_iota(jnp.int32, (TILE_H, w), 0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, w), 1)
    oy = y0f.astype(jnp.int32) - rows  # in [-dy, dy] by caller contract
    ox = x0f.astype(jnp.int32) - cols
    # per-tile actual offset range — the smooth fields make this a small
    # fraction of the static band, and the loops below only walk it
    oy_min = jnp.min(oy)
    ox_min = jnp.min(ox)
    ny = jnp.max(oy) - oy_min + 1
    nx = jnp.max(ox) - ox_min + 1

    base_row = t * TILE_H + dy + 1  # pad row of (i + u) at u = 0
    base_col = dx + 1

    def u_body(ui, acc):
        u = oy_min + ui
        my = oy == u

        def v_body(vi, acc):
            v = ox_min + vi
            m = (my & (ox == v))[None]  # (1, TILE_H, W)
            win = pad_ref[:,
                          pl.ds(base_row + u, TILE_H + 1),
                          pl.ds(base_col + v, w + 1)]
            a = win[:, :TILE_H, :w]
            b = win[:, :TILE_H, 1:]
            cc = win[:, 1:, :w]
            d = win[:, 1:, 1:]
            top = a * (1 - fx) + b * fx
            bot = cc * (1 - fx) + d * fx
            bil = top * (1 - fy) + bot * fy
            return acc + jnp.where(m, bil, 0.0)

        return jax.lax.fori_loop(0, nx, v_body, acc)

    acc = jax.lax.fori_loop(
        0, ny, u_body, jnp.zeros((c, TILE_H, w), jnp.float32)
    )
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("dy", "dx", "interpret"))
def warp_banded_pallas(img: jax.Array, coords_y: jax.Array,
                       coords_x: jax.Array, dy: int, dx: int,
                       interpret: bool = False) -> jax.Array:
    """Bounded-band bilinear warp of one (H, W, C) f32 image.

    Caller guarantees ``floor(coords_y[i, j]) - i ∈ [-dy, dy]`` (same for
    x) — the contract of ops/image._map_coords_banded. scipy-'reflect'
    boundary via a symmetric pad (identical for overhang ≤ min(h, w)).
    vmap-compatible (the batch dim becomes a leading grid dimension).
    """
    h, w, c = img.shape
    dy, dx = int(dy), int(dx)
    if h % TILE_H:
        raise ValueError(f"H={h} not a multiple of {TILE_H}")
    if dy + 1 > h or dx + 1 > w:
        raise ValueError(f"band ({dy}, {dx}) exceeds image ({h}, {w})")
    pad = jnp.pad(img, ((dy + 1, dy + 1), (dx + 1, dx + 1), (0, 0)),
                  mode="symmetric")
    pad = jnp.transpose(pad, (2, 0, 1)).astype(jnp.float32)  # (C, Hp, Wp)
    out = pl.pallas_call(
        functools.partial(_kernel, dy=dy, dx=dx, h=h, w=w, c=c),
        grid=(h // TILE_H,),
        in_specs=[
            pl.BlockSpec((TILE_H, w), lambda t: (t, 0)),
            pl.BlockSpec((TILE_H, w), lambda t: (t, 0)),
            # whole padded image per step; the index map is constant, so
            # the block is DMA'd once and revisited across tiles
            pl.BlockSpec(pad.shape, lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, TILE_H, w), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(coords_y.astype(jnp.float32), coords_x.astype(jnp.float32), pad)
    return jnp.transpose(out, (1, 2, 0)).astype(img.dtype)
