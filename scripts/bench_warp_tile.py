"""Tile-height sweep for the Pallas banded warp (elastic's two warps).

probe_elastic_stages.py attributed elastic sev-3 to the two warps (148 +
142 of 286 ms/batch-512); host stats show the per-tile offset walk is
nearly tile-height-invariant (mean walk/img both warps: 2,184 @ T=8,
1,228 @ T=16, 708 @ T=32), so taller tiles cut kernel loop iterations
~3x. This sweeps tile_h on chip with REAL elastic severity-3 coords
(affine warp D=29, field warp D=13) and checks bitwise equality vs the
jitted gather oracle at every tile height first.

Usage: python scripts/bench_warp_tile.py [--batch 512] [--iters 10]
           [--tiles 8,16,32,56] [--check-only]
"""

from __future__ import annotations

import argparse
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

from scripts.probe_elastic_stages import _elastic_parts


def _coords(x, key):
    srcpts, dx, dy, yy, xx, aff_band, fld_band = _elastic_parts(x, key)
    return {
        "aff": (srcpts[..., 1], srcpts[..., 0], aff_band),
        "fld": (yy + dy, xx + dx, fld_band),
    }


def check(tiles):
    """Bitwise equality vs the gather oracle, one real draw per warp."""
    from robustart_tpu.ops.image import map_coordinates_bilinear_reflect
    from robustart_tpu.ops.pallas_warp import warp_banded_pallas

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(0, 1, (224, 224, 3)), jnp.float32)
    cs = _coords(x, jax.random.key(42))  # unjitted: bands stay Python ints
    for name, (cy, cx, band) in cs.items():
        oracle = np.asarray(jax.jit(
            lambda x, cy, cx: map_coordinates_bilinear_reflect(x, cy, cx)
        )(x, cy, cx))
        for t in tiles:
            got = np.asarray(warp_banded_pallas(
                x, cy, cx, band[0], band[1], tile_h=t))
            n_bad = int((got != oracle).sum())
            print(json.dumps({"warp": name, "tile_h": t,
                              "bitwise_equal": n_bad == 0,
                              "n_mismatch": n_bad,
                              "max_abs_err": float(
                                  np.abs(got - oracle).max())}),
                  flush=True)
            if n_bad:
                raise SystemExit(f"mismatch at tile_h={t} warp={name}")


def bench(tiles, batch, iters):
    from robustart_tpu.ops.pallas_warp import warp_banded_pallas

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)

    for name in ("aff", "fld"):
        for t in tiles:

            @jax.jit
            def mega(x0, iters, _n=name, _t=t):
                base = jax.random.key(0)

                def one(x, key):
                    cy, cx, band = _coords(x, key)[_n]
                    return warp_banded_pallas(
                        x, cy, cx, band[0], band[1], tile_h=_t)

                def body(i, carry):
                    acc, x = carry
                    ks = jax.random.split(
                        jax.random.fold_in(base, i), x.shape[0])
                    y = jax.vmap(one)(x + acc * 1e-24, ks)
                    return acc + y.sum() * 1e-24, x

                return jax.lax.fori_loop(
                    0, iters, body, (jnp.float32(0.0), x0))[0]

            try:
                t0 = time.perf_counter()
                float(mega(x0, 1))
                compile_s = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(mega(x0, iters))
                dt = time.perf_counter() - t0
            except Exception as e:
                print(json.dumps({"warp": name, "tile_h": t,
                                  "error": f"{type(e).__name__}: {e}"[:160]}),
                      flush=True)
                continue
            print(json.dumps({
                "warp": name, "tile_h": t, "batch": batch,
                "ms_per_batch": round(dt / iters * 1e3, 2),
                "img_per_sec": round(batch * iters / dt, 1),
                "compile_s": round(compile_s, 1),
            }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--tiles", default="8,16,32,56")
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--no-check", action="store_true")
    args = ap.parse_args()
    tiles = [int(t) for t in args.tiles.split(",")]
    if not args.no_check:
        check(tiles)
    if not args.check_only:
        bench(tiles, args.batch, args.iters)


if __name__ == "__main__":
    main()
