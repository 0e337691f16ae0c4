"""glass_blur stage-cost attribution on chip (VERDICT r5 task 4 tail).

After the VMEM shuffle kernel, glass_blur severity-3 measures 5,566 img/s
in the int8 pipeline vs clean 15,129 — ~58 ms/batch-512 of corruption
overhead, the last kernel-wave dragger above elastic. Severity 3 is
(sigma=1, d=2, iters=3). This times each stage as its own vmapped
megastep (batch 512, no model forward; carry-threaded, one scalar):

  rng     : 3x (split + randint(h,w,2) + code arithmetic)
  kernel  : 3x shuffle kernel with a FIXED precomputed code plane
  kernel1 : 1x shuffle kernel (dispatch/fusion overhead scaling)
  blurs   : the two gaussian_blur(sigma=1) passes + uint8 roundtrip
  full    : the whole glass_blur corruption

Usage: python scripts/probe_glass_stages.py [--batch 512] [--iters 10]
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

SIGMA, D, ITS = 1.0, 2, 3  # severity 3 constants (jax_kernels.glass_blur)


def stage_fns():
    from robustart_tpu.noise.corruptions import jax_kernels as K
    from robustart_tpu.ops.pallas_motion import glass_shuffle_pallas

    def rng(x, key):
        acc = jnp.float32(0.0)
        for _ in range(ITS):
            key, sub = jax.random.split(key)
            off = jax.random.randint(sub, (x.shape[0], x.shape[1], 2), -D, D)
            code = (off[..., 0] + D) * (2 * D) + (off[..., 1] + D)
            acc = acc + code.sum().astype(jnp.float32)
        return x + acc * 1e-24

    def kernel_n(n):
        def f(x, key):
            h, w = x.shape[0], x.shape[1]
            code = (
                jnp.abs(jnp.arange(h * w).reshape(h, w)) % ((2 * D) * (2 * D))
            ).astype(jnp.int32)
            for _ in range(n):
                x = glass_shuffle_pallas(x, code, D)
            return x

        return f

    def blurs(x, key):
        x = K._uint8_roundtrip(K.gaussian_blur(x, SIGMA))
        return jnp.clip(K.gaussian_blur(x, SIGMA), 0.0, 1.0)

    def full(x, key):
        return K.glass_blur(x, key, severity=3)

    return {"rng": rng, "kernel": kernel_n(ITS), "kernel1": kernel_n(1),
            "blurs": blurs, "full": full}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--stages", default="rng,kernel,kernel1,blurs,full")
    args = ap.parse_args()

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
