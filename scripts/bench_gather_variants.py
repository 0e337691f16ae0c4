"""Micro-benchmark: TPU formulations of the bilinear warp gather.

elastic_transform is the slowest corruption on chip (170 img/s vs 14.9k
clean — an 88× slowdown) and its cost is two map_coordinates calls = 8
full-image 2D gathers. This measures alternative XLA formulations of ONE
bilinear warp (B, 224, 224, 3) to pick the fastest:

  a. fancy2d  — img[Y, X] per image under vmap (shipped baseline)
  b. flat     — jnp.take(img.reshape(HW, C), Y*W+X, axis=0) per image
  c. flatbatch— one take over the whole batch's flattened table
  d. onehotx  — x-axis interp via bf16 one-hot matmul (MXU), y via flat take
  e. patch    — lax.gather slice_sizes=(2,2,C), reflect-padded, fold-exact
                only in the interior (measures the lowering's ceiling)

Megastep rules per CLAUDE.md. Usage: python scripts/bench_gather_variants.py
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


def reflect(idx, n):
    period = 2 * n
    idx = jnp.mod(idx, period)
    return jnp.where(idx >= n, period - 1 - idx, idx)


def warp_fancy2d(img, cy, cx):
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    def at(yy, xx):
        return img[reflect(yy, H), reflect(xx, W)]

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x0i + 1) * fx
    bot = at(y0i + 1, x0i) * (1 - fx) + at(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


def warp_flat(img, cy, cx):
    flatimg = img.reshape(H * W, C)
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)

    def at(yy, xx):
        idx = reflect(yy, H) * W + reflect(xx, W)
        return jnp.take(flatimg, idx.reshape(-1), axis=0).reshape(H, W, C)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x0i + 1) * fx
    bot = at(y0i + 1, x0i) * (1 - fx) + at(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


def warp_flatbatch(imgs, cys, cxs):
    # single gather over the batch-flattened value table
    flat = imgs.reshape(B * H * W, C)
    y0 = jnp.floor(cys)
    x0 = jnp.floor(cxs)
    fy = (cys - y0)[..., None]
    fx = (cxs - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    base = (jnp.arange(B) * (H * W))[:, None, None]

    def at(yy, xx):
        idx = base + reflect(yy, H) * W + reflect(xx, W)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(B, H, W, C)

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x0i + 1) * fx
    bot = at(y0i + 1, x0i) * (1 - fx) + at(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


def warp_onehotx(img, cy, cx):
    """x-interp via one-hot matmul (MXU), then row gather via flat take.

    rowinterp[i, j, :] = (1-fx)·img[:, x0] + fx·img[:, x0+1] needs per-(i,j)
    columns — not expressible per-row; instead interp X FIRST on a per-
    output-row basis is wrong. Here: gather rows flatly for the two y
    levels, and do the X mix via one-hot bf16 matmuls per y level:
      lev_l[i, j, :] = Σ_k Wx[i,j,k] · img[y_l(i,j), k, :]
    still needs the row gather — so formulation: flat-gather FULL rows at
    y (2 gathers of (HW) row indices → (HW, W, C) too big). Fallback: this
    variant does the X one-hot AFTER a per-row flat take of row indices
    broadcast — skipped if too slow to build. Placeholder = flat.
    """
    return warp_flat(img, cy, cx)


def warp_patch(img, cy, cx):
    """One lax.gather fetching (2,2,C) patches (interior-exact only)."""
    pad = jnp.pad(img, ((1, 1), (1, 1), (0, 0)), mode="reflect")
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    fy = (cy - y0)[..., None]
    fx = (cx - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)  # into padded coords
    x0i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    idx = jnp.stack([y0i.reshape(-1), x0i.reshape(-1)], axis=-1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    patches = jax.lax.gather(
        pad, idx, dn, slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (HW, 2, 2, C)
    patches = patches.reshape(H, W, 2, 2, C)
    top = patches[:, :, 0, 0] * (1 - fx) + patches[:, :, 0, 1] * fx
    bot = patches[:, :, 1, 0] * (1 - fx) + patches[:, :, 1, 1] * fx
    return top * (1 - fy) + bot * fy


def bench(name, fn, batched=False):
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.float32)
    # elastic-like coords: identity + smooth-ish displacement ±6 px
    dy = jnp.asarray(rng.uniform(-6, 6, (B, H, W)), jnp.float32)
    dx = jnp.asarray(rng.uniform(-6, 6, (B, H, W)), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")

    @jax.jit
    def mega(imgs, iters):
        def body(i, acc):
            x = imgs + acc * 1e-24
            cys, cxs = yy[None] + dy, xx[None] + dx
            if batched:
                out = fn(x, cys, cxs)
            else:
                out = jax.vmap(fn)(x, cys, cxs)
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


VARIANTS = {
    "fancy2d": (warp_fancy2d, False),
    "flat": (warp_flat, False),
    "flatbatch": (warp_flatbatch, True),
    "patch": (warp_patch, False),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        fn, batched = VARIANTS[name]
        bench(name, fn, batched=batched)
