"""Layout probe: is NHWC C=3 lane padding crippling the corruption taps?

TPU vector tiles are (8 sublanes, 128 lanes) over the two minor dims. A
(B, H, W, 3) f32 elementwise chain puts C=3 in the lanes — 125/128 wasted
if XLA keeps the natural layout. Every tap-sum corruption kernel
(motion_blur_bank, glass_blur selects, banded elastic) measured ~50-120
Gop/s effective — ~2 orders under VPU peak. This times ONE 200-tap
static-slice accumulation (the motion_blur_bank inner loop) on the same
data in three layouts:

  nhwc    (B, 224, 224, 3)  — shipped layout, shifts on (H, W)
  chw     (B, 3, 224, 224)  — channels-first, shifts on the two minor dims
  flat    (B, 224, 672)     — W and C folded, shifts by (dy, 3*dx)

plus a binary-tree vs linear accumulation variant to separate the
dependence-chain effect from the layout effect.

Usage: python scripts/bench_layout_probe.py
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
ITERS = 10
PY = PX = 12
rng = np.random.default_rng(0)
# ~200 taps like motion_blur_bank at severity 3
OFFS = [(int(dy), int(dx)) for dy in range(-PY, PY + 1, 2)
        for dx in range(-PX, PX + 1, 2)][:200]
WVS = rng.uniform(0.001, 0.01, len(OFFS)).astype(np.float32)


def taps_nhwc(x, wv, tree):
    xp = jnp.pad(x, ((0, 0), (PY, PY), (PX, PX), (0, 0)), mode="edge")
    parts = []
    out = jnp.zeros_like(x)
    for t, (dy, dx) in enumerate(OFFS):
        s = jax.lax.slice(xp, (0, PY + dy, PX + dx, 0),
                          (B, PY + dy + H, PX + dx + W, C))
        if tree:
            parts.append(wv[t] * s)
        else:
            out = out + wv[t] * s
    if tree:
        while len(parts) > 1:
            parts = [a + b for a, b in zip(parts[::2], parts[1::2])] + (
                [parts[-1]] if len(parts) % 2 else [])
        out = parts[0]
    return out


def taps_chw(x, wv):
    xp = jnp.pad(x, ((0, 0), (0, 0), (PY, PY), (PX, PX)), mode="edge")
    out = jnp.zeros_like(x)
    for t, (dy, dx) in enumerate(OFFS):
        s = jax.lax.slice(xp, (0, 0, PY + dy, PX + dx),
                          (B, C, PY + dy + H, PX + dx + W))
        out = out + wv[t] * s
    return out


def taps_flat(x, wv):
    # x: (B, H, W*C); a dx shift is a 3*dx lane shift
    xp = jnp.pad(x, ((0, 0), (PY, PY), (PX * C, PX * C)), mode="edge")
    out = jnp.zeros_like(x)
    for t, (dy, dx) in enumerate(OFFS):
        s = jax.lax.slice(xp, (0, PY + dy, (PX + dx) * C),
                          (B, PY + dy + H, (PX + dx) * C + W * C))
        out = out + wv[t] * s
    return out


def bench(name, fn, x):
    wv = jnp.asarray(WVS)

    @jax.jit
    def mega(x0, iters):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur, wv)
            s = out.sum()
            return acc + s, x0 + (s * 1e-30).astype(x0.dtype)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), x))[0]

    try:
        t0 = time.perf_counter()
        float(mega(x, 1))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(mega(x, ITERS))
        dt = time.perf_counter() - t0
    except Exception as e:
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {e}"[:160]}),
              flush=True)
        return
    gops = len(OFFS) * B * H * W * C * 2 / 1e9
    print(json.dumps({
        "variant": name, "ms_per_batch": round(dt / ITERS * 1e3, 2),
        "eff_gops_per_s": round(gops / (dt / ITERS), 1),
        "compile_s": round(compile_s, 1),
    }), flush=True)


def main():
    x_nhwc = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)
    bench("nhwc_linear", lambda x, wv: taps_nhwc(x, wv, False), x_nhwc)
    bench("nhwc_tree", lambda x, wv: taps_nhwc(x, wv, True), x_nhwc)
    bench("chw_linear", taps_chw, jnp.transpose(x_nhwc, (0, 3, 1, 2)))
    bench("flat_linear", taps_flat, x_nhwc.reshape(B, H, W * C))
    # bf16 variant of the best-guess layout (half the bytes)
    bench("flat_bf16", taps_flat,
          x_nhwc.reshape(B, H, W * C).astype(jnp.bfloat16))


if __name__ == "__main__":
    main()
