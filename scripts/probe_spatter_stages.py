"""Spatter stage-cost attribution on chip (VERDICT r4 task 4).

spatter severity-3 measures 2,458 img/s in the int8 pipeline vs clean
15,287 — ~175 ms/batch-512 of corruption overhead. This times each stage
of the water branch (reference corruptions.py:327-350) as its own vmapped
megastep to find the hotspot:

  liquid  : normal + gaussian_blur + threshold
  sobel   : canny-style edges
  chamfer : 12-iter 16-offset roll+min distance propagation
  equalize: one-hot histogram equalization
  tail    : emboss conv + blurs + color compose
  full    : the whole spatter kernel

Usage: python scripts/probe_spatter_stages.py [--batch 512]
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


def stage_fns():
    from robustart_tpu.noise.corruptions import jax_kernels as K

    c = (0.65, 0.3, 2, 0.68, 0.5, 0)  # severity 3

    def liquid(x, key):
        h, w = x.shape[0], x.shape[1]
        liq = c[0] + c[1] * jax.random.normal(key, (h, w), x.dtype)
        liq = K.gaussian_blur(liq[..., None], float(c[2]))[..., 0]
        return jnp.where(liq < c[3], 0.0, liq)

    def sobel(x, key):
        liq = liquid(x, key)
        u8 = jnp.floor(jnp.clip(liq, 0.0, 1.0) * 255.0)
        return K._sobel_edges(u8, 50.0, 150.0)

    def chamfer(x, key):
        return K._chamfer_distance(sobel(x, key) > 0, cap=20.0, iters=12)

    def equalize(x, key):
        d = chamfer(x, key)
        d = K.filter2d_same(d[..., None],
                            np.ones((3, 3), np.float32) / 9.0)[..., 0]
        return K._equalize_hist(jnp.floor(jnp.clip(d, 0, 255)))

    def full(x, key):
        return K.spatter(x, key, severity=3)

    return {"liquid": liquid, "sobel": sobel, "chamfer": chamfer,
            "equalize": equalize, "full": full}


def bench(name, fn, batch, iters=8, warm=2):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)
    keys0 = jax.random.split(jax.random.key(0), batch)

    @jax.jit
    def mega(x, keys, iters):
        def body(i, carry):
            acc, keys = carry
            out = jax.vmap(fn)(x, keys)
            s = out.sum().astype(jnp.float32)
            keys = jax.vmap(jax.random.fold_in)(
                keys, jnp.full((keys.shape[0],),
                               i + (s * 1e-24).astype(jnp.int32)))
            return acc + s, keys

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), keys))[0]

    t0 = time.perf_counter()
    float(mega(x, keys0, warm))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mega(x, keys0, iters))
    dt = time.perf_counter() - t0
    return {"stage": name, "ms_per_batch": round(dt / iters * 1e3, 1),
            "img_per_sec": round(batch * iters / dt, 1),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--stages", default="liquid,sobel,chamfer,equalize,full")
    args = ap.parse_args()
    fns = stage_fns()
    for name in args.stages.split(","):
        try:
            print(json.dumps(bench(name, fns[name], args.batch)), flush=True)
        except Exception as e:
            print(json.dumps({"stage": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
