"""Chip probe: bounded-band exact warp formulations for elastic sev 3-5.

The unrolled masked-slice band crashes the TPU compile helper above ~700
taps, and the probe's (2,2,C) CLIP-mode gather crashed too. This times the
candidate EXACT bounded forms at elastic severity-3 band sizes:

  patch    — ops/image._map_coords_patch (symmetric pad, PROMISE_IN_BOUNDS,
             one (2,2,C) gather)
  pair1d   — symmetric pad, flatten to 1D, TWO gathers of (2*C,) contiguous
             slices (x-neighbor pair per y level)
  flat     — unbounded flat-take baseline (4 single-element-row takes)

Usage: python scripts/bench_warp_bounded.py [variant ...]
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, H, W, C = 256, 224, 224, 3
D = 13  # elastic severity-3 field band
ITERS = 10


def warp_patch(img, cy, cx):
    """symmetric pad + ONE (2,2,C) PROMISE_IN_BOUNDS gather (chip: crashes
    the compile helper — kept here as the crash repro, not in ops/)."""
    d = D
    pad = jnp.pad(img, ((d + 1, d + 1), (d + 1, d + 1), (0, 0)),
                  mode="symmetric")
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i = y0.astype(jnp.int32) + (d + 1)
    x0i = x0.astype(jnp.int32) + (d + 1)
    idx = jnp.stack([y0i.reshape(-1), x0i.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patches = jax.lax.gather(
        pad, idx, dn, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
    ).reshape(H, W, 2, 2, C)
    top = patches[:, :, 0, 0] * (1 - fx) + patches[:, :, 0, 1] * fx
    bot = patches[:, :, 1, 0] * (1 - fx) + patches[:, :, 1, 1] * fx
    return top * (1 - fy) + bot * fy


def warp_pair1d(img, cy, cx):
    d = D
    pad = jnp.pad(img, ((d + 1, d + 1), (d + 1, d + 1), (0, 0)),
                  mode="symmetric")
    hp, wp = pad.shape[0], pad.shape[1]
    flat = pad.reshape(hp * wp * C)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i = y0.astype(jnp.int32) + (d + 1)
    x0i = x0.astype(jnp.int32) + (d + 1)
    base = (y0i * wp + x0i) * C

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
    )

    def pair(rowbase):
        g = jax.lax.gather(
            flat, rowbase.reshape(-1, 1), dn, slice_sizes=(2 * C,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(H, W, 2, C)
        return g[:, :, 0], g[:, :, 1]

    a, b_ = pair(base)
    c_, dd = pair(base + wp * C)
    top = a * (1 - fx) + b_ * fx
    bot = c_ * (1 - fx) + dd * fx
    return top * (1 - fy) + bot * fy


def warp_flat(img, cy, cx):
    from robustart_tpu.ops.image import map_coordinates_bilinear_reflect

    return map_coordinates_bilinear_reflect(img, cy, cx)


def _sym_pad_concat(img, d):
    """symmetric pad of d via concat of flipped slices (no jnp.pad)."""
    top = img[:d][::-1]
    bot = img[-d:][::-1]
    img = jnp.concatenate([top, img, bot], axis=0)
    left = img[:, :d][:, ::-1]
    right = img[:, -d:][:, ::-1]
    return jnp.concatenate([left, img, right], axis=1)


def warp_pair1d_concat(img, cy, cx):
    d = D
    pad = _sym_pad_concat(img, d + 1)
    hp, wp = pad.shape[0], pad.shape[1]
    flat = pad.reshape(hp * wp * C)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i = y0.astype(jnp.int32) + (d + 1)
    x0i = x0.astype(jnp.int32) + (d + 1)
    base = (y0i * wp + x0i) * C

    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,),
    )

    def pair(rowbase):
        g = jax.lax.gather(
            flat, rowbase.reshape(-1, 1), dn, slice_sizes=(2 * C,),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        ).reshape(H, W, 2, C)
        return g[:, :, 0], g[:, :, 1]

    a, b_ = pair(base)
    c_, dd = pair(base + wp * C)
    top = a * (1 - fx) + b_ * fx
    bot = c_ * (1 - fx) + dd * fx
    return top * (1 - fy) + bot * fy


def warp_flat_nopad(img, cy, cx):
    """flat single-row takes, but indices pre-shifted into a concat-built
    symmetric pad (isolates: gather slice>1 vs pad op as the crasher)."""
    d = D
    pad = _sym_pad_concat(img, d + 1)
    hp, wp = pad.shape[0], pad.shape[1]
    flat = pad.reshape(hp * wp, C)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i = y0.astype(jnp.int32) + (d + 1)
    x0i = x0.astype(jnp.int32) + (d + 1)

    def at(yy, xx):
        idx = yy * wp + xx
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(H, W, C)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x0i + 1) * fx
    bot = at(y0i + 1, x0i) * (1 - fx) + at(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


VARIANTS = {"patch": warp_patch, "pair1d": warp_pair1d, "flat": warp_flat,
            "pair1d_concat": warp_pair1d_concat,
            "flat_nopad": warp_flat_nopad}


def bench(name, fn):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-D + 1, D - 1, (B, H, W)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-D + 1, D - 1, (B, H, W)), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    @jax.jit
    def mega(imgs, iters):
        def body(i, acc):
            x = imgs + acc * 1e-24
            out = jax.vmap(fn)(x, yy[None] + dy, xx[None] + dx)
            return acc + out.sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        t0 = time.perf_counter()
        float(mega(imgs, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(mega(imgs, ITERS))
        dt = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {e}"[:160]}),
              flush=True)
        return
    print(json.dumps({
        "variant": name, "img_per_sec": round(B * ITERS / dt, 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    names = sys.argv[1:] or ["patch", "pair1d"]
    for n in names:
        bench(n, VARIANTS[n])
