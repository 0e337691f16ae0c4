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

TILE_H = 8  # minimum row tile; _pick_tile_h prefers larger divisors


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _pick_tile_h(h: int) -> int:
    """Largest row tile that divides H (multiple of 8, ≤64).

    Every tap rolls the whole (tile_h + 2·py)-row halo window to produce
    tile_h output rows, so bigger tiles amortize the halo: at py=15 the
    roll work per output row drops 3.4× going 8→56 (40/8 → 88/56 rows)."""
    for t in (64, 56, 48, 40, 32, 24, 16, 8):
        if h % t == 0:
            return t
    return 8


def _mb_kernel(dy_ref, dx_ref, wt_ref, pad_ref, o_ref, *, py: int, px: int,
               w3: int, c: int, n_taps: int, tile_h: int):
    t = pl.program_id(0)
    hw = _align(tile_h + 2 * py, 8)
    wp3 = pad_ref.shape[1]  # lane-aligned by the caller
    # rows [t·tile_h, t·tile_h + hw) of the padded image cover every
    # (py + dy) tap row of output rows [t·tile_h, (t+1)·tile_h); the start
    # is t·tile_h (tile_h a multiple of 8) — statically provable alignment
    window = pad_ref[pl.ds(t * tile_h, hw), :]  # (hw, Wp·C)

    def body(ti, acc):
        dyt = dy_ref[0, ti]
        dxt = dx_ref[0, ti]
        wv = wt_ref[0, ti]
        # bring window row (py + dyt) to row 0 (jnp.roll semantics:
        # element k lands at k + shift mod n); the channel-interleaved
        # layout makes a dx-pixel shift a c·dx LANE shift — no transpose
        # ever touches the image (the (H,W,C)→(H,W·C) reshape is free)
        ru = pltpu.roll(window, hw - (py + dyt), axis=0)[:tile_h]
        rv = pltpu.roll(ru, wp3 - c * (px + dxt), axis=1)
        return acc + wv * rv[:, :w3]

    acc = jax.lax.fori_loop(
        0, n_taps, body, jnp.zeros((tile_h, w3), jnp.float32)
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
    tile_h = _pick_tile_h(h)
    (n_taps,) = dy.shape
    pad = jnp.pad(img, ((py, py), (px, px), (0, 0)), mode="edge")
    # channel-interleaved 2D view: (Hp, Wp·C). The merge of the two minor
    # dims is layout-free, unlike the previous (C, H, W) transpose whose
    # relayout dominated the kernel's cost in the int8 pipeline.
    pad = pad.reshape(pad.shape[0], pad.shape[1] * c).astype(jnp.float32)
    hw = _align(tile_h + 2 * py, 8)
    hp_need = (h - tile_h) + hw
    wp_need = _align(pad.shape[1], 128)
    # max lane index read back: (w·c - 1) + c·2px = real padded width - 1,
    # so the zero fill to the lane multiple is never sampled
    pad = jnp.pad(pad, ((0, max(0, hp_need - pad.shape[0])),
                        (0, wp_need - pad.shape[1])))
    out = pl.pallas_call(
        functools.partial(_mb_kernel, py=py, px=px, w3=w * c, c=c,
                          n_taps=n_taps, tile_h=tile_h),
        grid=(h // tile_h,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            # whole padded image; constant index map — DMA'd once,
            # revisited across row tiles
            pl.BlockSpec(pad.shape, lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((tile_h, w * c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * c), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(dy.astype(jnp.int32).reshape(1, -1), dx.astype(jnp.int32).reshape(1, -1),
      wt.astype(jnp.float32).reshape(1, -1), pad)
    return out.reshape(h, w, c).astype(img.dtype)


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


# ---------------------------------------------------------------------------
# glass_blur shuffle-select (same interleaved-layout tap pattern)
# ---------------------------------------------------------------------------


def _glass_kernel(pad_ref, code_ref, o_ref, *, d: int, w3: int, c: int,
                  tile_h: int):
    t = pl.program_id(0)
    hw = _align(tile_h + 2 * d, 8)
    wp3 = pad_ref.shape[1]
    window = pad_ref[pl.ds(t * tile_h, hw), :]  # (hw, Wp·C)
    code = code_ref[...]  # (tile_h, W·C) int32, channel-replicated
    acc = jnp.zeros((tile_h, w3), jnp.float32)
    for a in range(-d, d):
        ru = pltpu.roll(window, hw - (d + a), axis=0)[:tile_h]
        for b in range(-d, d):
            tt = (a + d) * (2 * d) + (b + d)
            rv = pltpu.roll(ru, wp3 - c * (d + b), axis=1)[:, :w3]
            acc = acc + jnp.where(code == tt, rv, 0.0)
    o_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def glass_shuffle_pallas(img: jax.Array, code: jax.Array, d: int,
                         interpret: bool = False) -> jax.Array:
    """One glass_blur swap iteration for a (H, W, C) f32 image: per pixel,
    pick the neighbor at the per-pixel offset pair encoded in ``code``
    (``(a+d)·2d + (b+d)``, a/b ∈ [-d, d) — the jax_kernels.glass_blur
    shifted-select form, reference corruptions.py:169-185). Bitwise-equal
    to the XLA roll/select loop on interior pixels (disjoint exhaustive
    masks select single values; non-interior is overwritten by the caller).

    The XLA form streams (2d)² rolled copies of the image through HBM per
    iteration (measured 3,333 img/s at severity 3 in the int8 pipeline);
    here the image sits in VMEM once, rolls are register shuffles, and HBM
    traffic is one image read + one code read + one write."""
    h, w, c = img.shape
    if h % TILE_H:
        raise ValueError(f"H={h} not a multiple of {TILE_H}")
    tile_h = _pick_tile_h(h)
    pad = jnp.pad(img, ((d, d), (d, d), (0, 0)), mode="edge")
    pad = pad.reshape(pad.shape[0], pad.shape[1] * c).astype(jnp.float32)
    hw = _align(tile_h + 2 * d, 8)
    hp_need = (h - tile_h) + hw
    wp_need = _align(pad.shape[1], 128)
    pad = jnp.pad(pad, ((0, max(0, hp_need - pad.shape[0])),
                        (0, wp_need - pad.shape[1])))
    code3 = jnp.repeat(code, c, axis=-1)  # (H, W·C)
    out = pl.pallas_call(
        functools.partial(_glass_kernel, d=d, w3=w * c, c=c, tile_h=tile_h),
        grid=(h // tile_h,),
        in_specs=[
            pl.BlockSpec(pad.shape, lambda t: (0, 0)),
            pl.BlockSpec((tile_h, w * c), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((tile_h, w * c), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((h, w * c), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(pad, code3.astype(jnp.int32))
    return out.reshape(h, w, c).astype(img.dtype)


# ---------------------------------------------------------------------------
# chamfer distance propagation (spatter's water mask, cv2.distanceTransform
# DIST_L2/maskSize=5 analog — jax_kernels._chamfer_distance)
# ---------------------------------------------------------------------------


def _chamfer_kernel(d_ref, o_ref, *, h: int, w: int, cap: float, iters: int,
                    offsets: tuple):
    wp = d_ref.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, wp), 1)

    def body(_, dist):
        best = dist
        for dy, dx, wt in offsets:
            # shifted[i, j] = dist[i+dy, j+dx]; positions whose source is
            # outside the real (h, w) map — including everything the roll
            # wraps in from the cap-filled lane padding — are masked to cap
            sh = pltpu.roll(dist, (-dy) % h, axis=0)
            sh = pltpu.roll(sh, (-dx) % wp, axis=1)
            valid = ((row + dy >= 0) & (row + dy < h)
                     & (col + dx >= 0) & (col + dx < w))
            best = jnp.minimum(best, jnp.where(valid, sh + wt, cap))
        return jnp.minimum(best, cap)

    o_ref[...] = jax.lax.fori_loop(0, iters, body, d_ref[...])


@functools.partial(jax.jit, static_argnames=("cap", "iters", "interpret"))
def chamfer_pallas(dist0: jax.Array, cap: float, iters: int,
                   interpret: bool = False) -> jax.Array:
    """``iters`` rounds of capped chamfer min-propagation over one (H, W)
    f32 map, entirely in VMEM (the XLA form streams iters×16 shifted HBM
    copies). Bitwise-equal to jax_kernels._chamfer_distance's non-wrap
    slice form: min is exact, the tap adds see identical f32 values, and
    out-of-image sources (h % 8 == 0 required; lane padding holds cap)
    contribute exactly ``cap``. vmap adds a leading grid dimension."""
    from robustart_tpu.noise.corruptions.jax_kernels import _CHAMFER_OFFSETS

    h, w = dist0.shape
    if h % TILE_H:
        raise ValueError(f"H={h} not a multiple of {TILE_H}")
    wp = _align(w, 128)
    d = jnp.pad(dist0.astype(jnp.float32), ((0, 0), (0, wp - w)),
                constant_values=cap)
    out = pl.pallas_call(
        functools.partial(_chamfer_kernel, h=h, w=w, cap=float(cap),
                          iters=int(iters), offsets=_CHAMFER_OFFSETS),
        grid=(1,),
        in_specs=[pl.BlockSpec((h, wp), lambda t: (0, 0))],
        out_specs=pl.BlockSpec((h, wp), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((h, wp), jnp.float32),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(d)
    return out[:, :w].astype(dist0.dtype)
