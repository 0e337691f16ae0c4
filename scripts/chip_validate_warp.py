"""Chip validation of the Pallas banded warp (elastic severities 3-5).

1. correctness: elastic_transform sev 3/5 on a small batch, Pallas-routed
   vs the gather form (ELASTIC_TAPS_MAX=0 hook) — expect bitwise or ~ulp
   agreement (Mosaic vs XLA FMA contraction may differ in the last bit).
2. throughput: kernel-alone megastep at the severity-3 field band (D=13)
   and the affine band (D=29), batch 256.

Usage: python scripts/chip_validate_warp.py
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

B, H, W = 256, 224, 224
ITERS = 10


def correctness():
    from robustart_tpu.noise.corruptions import jax_kernels as K

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (4, H, W, 3)), jnp.float32)
    for sev in (3, 5):
        fn = jax.jit(jax.vmap(
            lambda im, k: K.elastic_transform(im, k, severity=sev)))
        keys = jax.random.split(jax.random.key(sev), 4)
        got = np.asarray(fn(x, keys))
        orig = K.ELASTIC_TAPS_MAX
        K.ELASTIC_TAPS_MAX = 0  # force the gather oracle
        try:
            fn2 = jax.jit(jax.vmap(
                lambda im, k: K.elastic_transform(im, k, severity=sev)))
            want = np.asarray(fn2(x, keys))
        finally:
            K.ELASTIC_TAPS_MAX = orig
        maxd = float(np.abs(got - want).max())
        print(json.dumps({"check": f"elastic_sev{sev}", "max_abs_delta": maxd,
                          "bitwise": bool(np.array_equal(got, want))}),
              flush=True)
        assert maxd < 1e-5, maxd


def kernel_rate(d):
    from robustart_tpu.ops.pallas_warp import warp_banded_pallas

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    dy = jnp.asarray(rng.uniform(-d + 1, d - 1, (B, H, W)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-d + 1, d - 1, (B, H, W)), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    @jax.jit
    def mega(imgs, iters):
        def body(i, carry):
            acc, x = carry
            out = jax.vmap(
                lambda im, cy, cx: warp_banded_pallas(im, cy, cx, d, d)
            )(x, yy[None] + dy, xx[None] + dx)
            s = out.sum()
            return acc + s, x + (s * 1e-24).astype(x.dtype)

        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), imgs))[0]

    try:
        t0 = time.perf_counter()
        float(mega(imgs, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(mega(imgs, ITERS))
        dt = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"kernel_band": d,
                          "error": f"{type(e).__name__}: {e}"[:200]}),
              flush=True)
        return
    print(json.dumps({"kernel_band": d,
                      "img_per_sec": round(B * ITERS / dt, 1),
                      "compile_s": round(compile_s, 1)}), flush=True)


if __name__ == "__main__":
    if "--skip-correctness" not in sys.argv:
        correctness()
    kernel_rate(13)
    kernel_rate(29)
