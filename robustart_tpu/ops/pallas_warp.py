"""Pallas TPU kernel: bounded-displacement bilinear warp (elastic hot path).

elastic_transform (reference RobustART/noise/utils/imagenet_c/
corruptions.py:392-427) is two bilinear warps, and on this chip it is the
corruption sweep's one structural outlier (148 img/s vs a 5,878 geomean,
benchmarks/corruptions.json): XLA's TPU gather lowering is rate-bound at
~380-400 img/s per warp whatever the indexing scheme, every
multi-element-slice `lax.gather` crashes this build's compile helper, and
the unrolled masked-slice band does too above ~700 taps
(scripts/bench_warp_bounded.py, WORKLOG round 4).

This kernel implements the banded-select warp with the image resident in
VMEM, which changes the economics twice over:

- the masked taps read VMEM, not HBM (the unrolled XLA form streams the
  full image from HBM per tap — layout probe: ~410 GB/s aggregate, no
  stream sharing);
- the tap loops run over the PER-TILE offset range actually present
  (runtime min/max of the integer offsets), not the static worst case.
  The displacement fields are smooth (a gaussian-blurred field and a
  near-identity affine), so an 8-row tile typically spans a small
  fraction of the static band — the static bound (Dy, Dx) only sizes the
  pad.

Mosaic constraints shape the addressing (first attempt failed with
"cannot statically prove that index in dimension 2 is a multiple of 8"):
dynamic ref-slice starts on the tiled dims must be provably tile-aligned,
so per-tap offsets are realized as `pltpu.roll` (dynamic circular shifts
support traced amounts) of a STATICALLY-sliced per-tile window whose start
``t*TILE_H`` is alignment-provable, followed by static slices of the
rolled value.

Exactness contract (same as ops/image._map_coords_banded): masks are
disjoint and exhaustive over the band, each output element accumulates
exactly one bilinear value plus zeros, and the bilinear arithmetic is the
gather path's expression verbatim — bitwise-equal to the jitted gather
form in the TPU-semantics interpreter (tests/test_pallas_warp.py).

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

# Default kernel tile height cap. The per-tile offset ranges the kernel
# walks are set almost entirely by the x-variation across the 224-wide
# row, not by the tile's rows (measured: mean walk/tile 39 at T=8 vs 50
# at T=32 on elastic sev-3 draws), so taller tiles cut the loop iteration
# count near-linearly while per-iteration VPU work stays sub-dominant
# (~260 ns/iter at T=8 vs ~25 ns of raw flops — loop/roll overhead
# bound). Chip sweep (scripts/bench_warp_tile.py, batch 512, elastic
# sev-3 coords, all bitwise-equal to the gather oracle):
#   affine warp (D=29): T=8 148.3 ms, 16 102.0, 32 89.8, 56 82.8, 112 94.9
#   field warp  (D=13): T=8 141.6 ms, 16 103.4, 32 96.6, 56 88.6, 112 94.1
# T=112 loses: the per-u window roll grows with T+2D while the walk stops
# shrinking. The dispatcher picks the largest multiple-of-8 divisor of H
# not above this cap.
WARP_TILE_H = 56


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(cy_ref, cx_ref, pad_ref, o_ref, *, dy: int, dx: int, h: int,
            w: int, c: int, tile_h: int):
    t = pl.program_id(0)
    cy = cy_ref[...]  # (tile_h, W) f32
    cx = cx_ref[...]
    y0f = jnp.floor(cy)
    x0f = jnp.floor(cx)
    fy = cy - y0f  # (tile_h, W)
    fx = cx - x0f
    rows = (t * tile_h
            + jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 0))
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile_h, w), 1)
    oy = y0f.astype(jnp.int32) - rows  # in [-dy, dy] by caller contract
    ox = x0f.astype(jnp.int32) - cols
    # per-tile actual offset range — the smooth fields make this a small
    # fraction of the static band, and the loops below only walk it
    oy_min = jnp.min(oy)
    ox_min = jnp.min(ox)
    ny = jnp.max(oy) - oy_min + 1
    nx = jnp.max(ox) - ox_min + 1

    # the tile's full band window: pad rows [t·tile_h, t·tile_h + hw) cover
    # every (u, +1) tap of output rows [t·tile_h, (t+1)·tile_h); the start
    # is t·tile_h — statically provable sublane alignment (tile_h % 8 == 0)
    # and both window dims are tile-aligned (8/128) for the rolls (Mosaic:
    # "unsupported unaligned shape" otherwise)
    hw = _align(tile_h + 2 * dy + 2, 8)
    wp = pad_ref.shape[2]  # lane-aligned by the caller
    window = pad_ref[:, pl.ds(t * tile_h, hw), :]  # (C, hw, Wp)

    def u_body(ui, acc):
        u = oy_min + ui
        my = oy == u
        # bring window row (u + dy + 1) to row 0: roll by hw - k (jnp.roll
        # semantics — element i lands at i + shift mod n; shift stays ≥ 0)
        ru = pltpu.roll(window, hw - (u + dy + 1), axis=1)[:, :tile_h + 1]

        def v_body(vi, acc):
            v = ox_min + vi
            m = (my & (ox == v))[None]  # (1, tile_h, W)
            rv = pltpu.roll(ru, wp - (v + dx + 1), axis=2)
            a = rv[:, :tile_h, :w]
            b = rv[:, :tile_h, 1:w + 1]
            cc = rv[:, 1:, :w]
            d = rv[:, 1:, 1:w + 1]
            top = a * (1 - fx) + b * fx
            bot = cc * (1 - fx) + d * fx
            bil = top * (1 - fy) + bot * fy
            return acc + jnp.where(m, bil, 0.0)

        return jax.lax.fori_loop(0, nx, v_body, acc)

    acc = jax.lax.fori_loop(
        0, ny, u_body, jnp.zeros((c, tile_h, w), jnp.float32)
    )
    o_ref[...] = acc


@functools.partial(jax.jit,
                   static_argnames=("dy", "dx", "interpret", "tile_h"))
def warp_banded_pallas(img: jax.Array, coords_y: jax.Array,
                       coords_x: jax.Array, dy: int, dx: int,
                       interpret: bool = False,
                       tile_h: int | None = None) -> jax.Array:
    """Bounded-band bilinear warp of one (H, W, C) f32 image.

    Caller guarantees ``floor(coords_y[i, j]) - i ∈ [-dy, dy]`` (same for
    x) — the contract of ops/image._map_coords_banded. scipy-'reflect'
    boundary via a symmetric pad (identical for overhang ≤ min(h, w)).
    vmap-compatible (the batch dim becomes a leading grid dimension).
    ``tile_h`` (multiple of 8, default ``WARP_TILE_H``) trades grid steps
    for per-iteration width — the walk count per tile is nearly
    tile-height-invariant, so taller tiles run fewer loop iterations.
    """
    h, w, c = img.shape
    dy, dx = int(dy), int(dx)
    if tile_h is None:
        # largest multiple-of-8 divisor of h not above the default
        tile_h = max((t for t in range(8, WARP_TILE_H + 1, 8)
                      if h % t == 0), default=8)
    tile_h = int(tile_h)
    if tile_h % 8:
        raise ValueError(f"tile_h={tile_h} not a multiple of 8")
    if h % tile_h:
        raise ValueError(f"H={h} not a multiple of {tile_h}")
    if dy + 1 > h or dx + 1 > w:
        raise ValueError(f"band ({dy}, {dx}) exceeds image ({h}, {w})")
    pad = jnp.pad(img, ((dy + 1, dy + 1), (dx + 1, dx + 1), (0, 0)),
                  mode="symmetric")
    pad = jnp.transpose(pad, (2, 0, 1)).astype(jnp.float32)  # (C, Hp, Wp)
    # tile-align the roll dims: lanes to 128; rows so the LAST tile's
    # aligned window slice stays in bounds (extra rows/lanes are garbage
    # the kernel's static slices never select)
    hw = _align(tile_h + 2 * dy + 2, 8)
    hp_need = (h - tile_h) + hw
    wp_need = _align(pad.shape[2], 128)
    pad = jnp.pad(pad, ((0, 0), (0, max(0, hp_need - pad.shape[1])),
                        (0, wp_need - pad.shape[2])))
    out = pl.pallas_call(
        functools.partial(_kernel, dy=dy, dx=dx, h=h, w=w, c=c,
                          tile_h=tile_h),
        grid=(h // tile_h,),
        in_specs=[
            pl.BlockSpec((tile_h, w), lambda t: (t, 0)),
            pl.BlockSpec((tile_h, w), lambda t: (t, 0)),
            # whole padded image per step; the index map is constant, so
            # the block is DMA'd once and revisited across tiles
            pl.BlockSpec(pad.shape, lambda t: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((c, tile_h, w), lambda t: (0, t, 0)),
        out_shape=jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(coords_y.astype(jnp.float32), coords_x.astype(jnp.float32), pad)
    return jnp.transpose(out, (1, 2, 0)).astype(img.dtype)
