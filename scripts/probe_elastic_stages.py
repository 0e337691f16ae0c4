"""elastic_transform stage-cost attribution on chip (round 5 tail).

After the banded Pallas warp, elastic severity-3 measures 1,618 img/s in
the int8 pipeline vs clean 15,038 — ~280 ms/batch-512 of corruption
overhead, 6x worse than the next dragger (spatter 6,180). elastic is two
bounded-band bilinear warps (reference corruptions.py:392-427): a random
affine (static band D=29 at sev 3) then a gaussian-smoothed displacement
field (D=13). This times each stage as its own vmapped megastep:

  solve   : the two 3x3 affine solves + coord grid (expected ~free)
  warp_aff: the affine warp alone (real per-draw coords, D=29 band)
  field   : dx/dy uniform + 2x gaussian_blur(sigma=2.44) + scale
  warp_fld: the field warp alone (real smoothed field, D=13 band)
  full    : the whole elastic_transform severity 3

Also prints host-side per-tile (ny, nx) offset-range statistics for both
warps — the kernel's inner loop walks ny*nx masked taps per 8-row tile,
so sum(ny*nx) across tiles is the VPU work actually done vs the static
band's worst case.

Usage: python scripts/probe_elastic_stages.py [--batch 512] [--iters 10]
       python scripts/probe_elastic_stages.py --ranges   (host, no chip)
"""

from __future__ import annotations

import argparse
import json
import math
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

SEV = 3


def _elastic_parts(x, key, severity=SEV):
    """Re-derive elastic's intermediates (mirrors jax_kernels.elastic)."""
    from robustart_tpu.noise.corruptions import jax_kernels as K

    ca, cb, cc = [
        (244 * 2, 244 * 0.7, 244 * 0.1),
        (244 * 2, 244 * 0.08, 244 * 0.2),
        (244 * 0.05, 244 * 0.01, 244 * 0.02),
        (244 * 0.07, 244 * 0.01, 244 * 0.02),
        (244 * 0.12, 244 * 0.01, 244 * 0.02),
    ][severity - 1]
    h, w = x.shape[0], x.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    center = jnp.asarray([h // 2, w // 2], jnp.float32)
    square = float(min(h, w) // 3)
    pts1 = jnp.asarray(
        [
            [center[1] + square, center[0] + square],
            [center[1] + square, center[0] - square],
            [center[1] - square, center[0] - square],
        ],
        jnp.float32,
    )
    pts2 = pts1 + jax.random.uniform(k1, (3, 2), jnp.float32, -cc, cc)
    ones = jnp.ones((3, 1), jnp.float32)
    minv_t = jnp.linalg.solve(jnp.concatenate([pts2, ones], axis=1), pts1)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    srcpts = coords @ minv_t
    dx = jax.random.uniform(k2, (h, w), jnp.float32, -1.0, 1.0)
    dy = jax.random.uniform(k3, (h, w), jnp.float32, -1.0, 1.0)
    dx = K.gaussian_blur(dx[..., None], float(cb), truncate=3.0)[..., 0] * ca
    dy = K.gaussian_blur(dy[..., None], float(cb), truncate=3.0)[..., 0] * ca
    aff_band = K._band(K._affine_band_bound(h, w, float(cc)))
    fld_band = K._band(float(ca))
    return (srcpts, dx, dy, yy, xx, aff_band, fld_band)


def stage_fns():
    from robustart_tpu.noise.corruptions import jax_kernels as K
    from robustart_tpu.ops.image import map_coordinates_bilinear_reflect

    def solve(x, key):
        srcpts, *_ = _elastic_parts(x, key)
        return x + srcpts.sum() * 1e-24

    def warp_aff(x, key):
        srcpts, _, _, _, _, aff_band, _ = _elastic_parts(x, key)
        out = map_coordinates_bilinear_reflect(
            x, srcpts[..., 1], srcpts[..., 0], max_offset=aff_band)
        # charge only the warp: subtract nothing, the parts above are
        # measured separately by `solve`+`field` and are ~free vs warps
        return out

    def field(x, key):
        _, dx, dy, _, _, _, _ = _elastic_parts(x, key)
        return x + (dx.sum() + dy.sum()) * 1e-24

    def warp_fld(x, key):
        _, dx, dy, yy, xx, _, fld_band = _elastic_parts(x, key)
        # warp the ORIGINAL x (not x_aff) — same cost shape, one warp
        return map_coordinates_bilinear_reflect(
            x, yy + dy, xx + dx, max_offset=fld_band)

    def full(x, key):
        return K.elastic_transform(x, key, severity=SEV)

    return {"solve": solve, "warp_aff": warp_aff, "field": field,
            "warp_fld": warp_fld, "full": full}


def range_stats(batch: int = 64, seed: int = 0):
    """Host-side per-tile (ny, nx) walk statistics for both warps."""
    from robustart_tpu.ops.pallas_warp import TILE_H

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(0, 1, (224, 224, 3)), jnp.float32)
    totals = {"aff": [], "fld": []}
    for i in range(batch):
        key = jax.random.fold_in(jax.random.key(0), i)
        srcpts, dx, dy, yy, xx, aff_band, fld_band = jax.jit(
            _elastic_parts)(x, key)
        for name, (cy, cx), band in (
            ("aff", (np.asarray(srcpts[..., 1]), np.asarray(srcpts[..., 0])),
             aff_band),
            ("fld", (np.asarray(yy + dy), np.asarray(xx + dx)), fld_band),
        ):
            h, w = cy.shape
            rows = np.arange(h)[:, None]
            cols = np.arange(w)[None, :]
            oy = np.floor(cy).astype(np.int64) - rows
            ox = np.floor(cx).astype(np.int64) - cols
            walk = 0
            for t in range(h // TILE_H):
                sy = slice(t * TILE_H, (t + 1) * TILE_H)
                ny = oy[sy].max() - oy[sy].min() + 1
                nx = ox[sy].max() - ox[sy].min() + 1
                walk += int(ny * nx)
            totals[name].append(walk)
    for name, band in (("aff", None), ("fld", None)):
        arr = np.asarray(totals[name])
        print(json.dumps({
            "warp": name, "batch": batch,
            "mean_walk_taps_per_img": round(float(arr.mean()), 1),
            "max": int(arr.max()), "min": int(arr.min()),
            "tiles": 224 // TILE_H,
        }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="solve,warp_aff,field,warp_fld,full")
    ap.add_argument("--ranges", action="store_true",
                    help="host-side per-tile walk statistics only")
    args = ap.parse_args()

    if args.ranges:
        range_stats()
        return

    fns = stage_fns()
    rng0 = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng0.uniform(0, 1, (args.batch, 224, 224, 3)), jnp.float32
    )

    for name in args.stages.split(","):
        fn = fns[name]

        @jax.jit
        def mega(x0, iters, _fn=fn):
            base = jax.random.key(0)

            def body(i, carry):
                acc, x = carry
                ks = jax.random.split(jax.random.fold_in(base, i),
                                      x.shape[0])
                y = jax.vmap(_fn)(x + acc * 1e-24, ks)
                return acc + y.sum() * 1e-24, x

            return jax.lax.fori_loop(
                0, iters, body, (jnp.float32(0.0), x0)
            )[0]

        try:
            t0 = time.perf_counter()
            float(mega(x0, 1))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(mega(x0, args.iters))
            dt = time.perf_counter() - t0
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
            continue
        print(json.dumps({
            "stage": name, "batch": args.batch,
            "ms_per_batch": round(dt / args.iters * 1e3, 2),
            "img_per_sec": round(args.batch * args.iters / dt, 1),
            "compile_s": round(compile_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
