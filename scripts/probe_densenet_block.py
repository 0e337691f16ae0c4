"""DenseNet block-2 structural probe (VERDICT r4 task 3).

The concat-free slab formulation measured 5,564 img/s end-to-end vs 6,329
for the mixed concat/buffer baseline: per-slab dots emit (M,128) partial
products whose tree-sum materializes MORE traffic than the saved concat
writes. This probes the remaining pure-XLA structures on block-2 shapes
(batch 256, 28x28, c0=128, 12 layers, growth 32, mid 128 — the block the
round-3 study measured at concat 14.4 ms / buffer 17.0 vs a 5.0 ms floor):

- concat      : rebuild concat(x, out) per layer (r3 'concat')
- slab        : per-slab dots + tree-sum (round-5 first attempt)
- bundle      : per-slab dots but new slabs concat into K=128 bundles every
                4 layers (4x fewer sum terms, full-depth MXU K)
- fori_pad    : lax.fori_loop over layers; ONE (B,H,W,c_max) carry buffer
                (in-place DUS guaranteed by the loop), stacked
                zero-padded weights (n, c_max, mid) — every layer pays the
                full c_max read+FLOPs but writes only its slab
- fori_pad_nodus : fori_pad but the slab is accumulated via add into a
                zero-initialized buffer region mask (isolates DUS lane-
                offset cost if fori_pad disappoints)

All variants compute the SAME function (asserted vs concat, small shapes)
— BN eval affines folded, bf16.

Usage: python scripts/probe_densenet_block.py [--variants a,b] [--check]
"""

from __future__ import annotations

import argparse
import functools
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

DT = jnp.bfloat16


def make_weights(c0=128, n=12, g=32, mid=128, seed=0):
    rng = np.random.default_rng(seed)
    ws = []
    for i in range(n):
        c = c0 + i * g
        ws.append({
            "a1": rng.normal(1, 0.1, (c,)).astype(np.float32),
            "b1": rng.normal(0, 0.1, (c,)).astype(np.float32),
            "w1": (rng.normal(0, 0.05, (c, mid)) / np.sqrt(c)).astype(np.float32),
            "a2": rng.normal(1, 0.1, (mid,)).astype(np.float32),
            "b2": rng.normal(0, 0.1, (mid,)).astype(np.float32),
            "w2": (rng.normal(0, 0.05, (3, 3, mid, g)) / 34.0).astype(np.float32),
        })
    return ws


def conv3(h, w2):
    return jax.lax.conv_general_dilated(
        h, w2.astype(DT), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def fwd_concat(ws, x):
    for lw in ws:
        y = jax.nn.relu(x * lw["a1"].astype(DT) + lw["b1"].astype(DT))
        h = jnp.einsum("bhwc,cm->bhwm", y, lw["w1"].astype(DT))
        h = jax.nn.relu(h * lw["a2"].astype(DT) + lw["b2"].astype(DT))
        out = conv3(h, lw["w2"])
        x = jnp.concatenate([x, out], -1)
    return x


def _tree_sum(terms):
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def fwd_slab(ws, x):
    g = ws[0]["w2"].shape[-1]
    slabs, offs = [x], [0]
    c0 = x.shape[-1]
    for i, lw in enumerate(ws):
        terms = []
        for s, off in zip(slabs, offs):
            c = s.shape[-1]
            y = jax.nn.relu(s * lw["a1"][off:off + c].astype(DT)
                            + lw["b1"][off:off + c].astype(DT))
            terms.append(jnp.einsum("bhwc,cm->bhwm", y,
                                    lw["w1"][off:off + c].astype(DT)))
        h = _tree_sum(terms)
        h = jax.nn.relu(h * lw["a2"].astype(DT) + lw["b2"].astype(DT))
        slabs.append(conv3(h, lw["w2"]))
        offs.append(c0 + i * g)
    return jnp.concatenate(slabs, -1)


def fwd_bundle(ws, x, bundle=4):
    g = ws[0]["w2"].shape[-1]
    c0 = x.shape[-1]
    bundles, offs = [x], [0]   # closed K>=128 groups
    partial, poffs = [], []    # < `bundle` fresh slabs
    for i, lw in enumerate(ws):
        terms = []
        for s, off in zip(bundles + partial, offs + poffs):
            c = s.shape[-1]
            y = jax.nn.relu(s * lw["a1"][off:off + c].astype(DT)
                            + lw["b1"][off:off + c].astype(DT))
            terms.append(jnp.einsum("bhwc,cm->bhwm", y,
                                    lw["w1"][off:off + c].astype(DT)))
        h = _tree_sum(terms)
        h = jax.nn.relu(h * lw["a2"].astype(DT) + lw["b2"].astype(DT))
        partial.append(conv3(h, lw["w2"]))
        poffs.append(c0 + i * g)
        if len(partial) == bundle:
            bundles.append(jnp.concatenate(partial, -1))
            offs.append(poffs[0])
            partial, poffs = [], []
    return jnp.concatenate(bundles + partial, -1)


def _stack_padded(ws, c_max):
    n = len(ws)
    mid = ws[0]["w1"].shape[1]
    a1 = np.zeros((n, c_max), np.float32)
    b1 = np.zeros((n, c_max), np.float32)
    w1 = np.zeros((n, c_max, mid), np.float32)
    a2 = np.stack([w["a2"] for w in ws])
    b2 = np.stack([w["b2"] for w in ws])
    w2 = np.stack([w["w2"] for w in ws])
    for i, lw in enumerate(ws):
        c = lw["w1"].shape[0]
        a1[i, :c] = lw["a1"]
        b1[i, :c] = lw["b1"]
        w1[i, :c] = lw["w1"]
    return [jnp.asarray(t) for t in (a1, b1, w1, a2, b2, w2)]


def fwd_fori_pad(stacked, x, n, g):
    a1, b1, w1, a2, b2, w2 = stacked
    c0 = x.shape[-1]
    c_max = c0 + n * g
    b, hh, wwd = x.shape[0], x.shape[1], x.shape[2]
    buf = jnp.zeros((b, hh, wwd, c_max), DT)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 0, 0, 0))

    def body(i, buf):
        y = jax.nn.relu(buf * a1[i].astype(DT) + b1[i].astype(DT))
        h = jnp.einsum("bhwc,cm->bhwm", y, w1[i].astype(DT))
        h = jax.nn.relu(h * a2[i].astype(DT) + b2[i].astype(DT))
        out = conv3(h, w2[i])
        return jax.lax.dynamic_update_slice(buf, out, (0, 0, 0, c0 + i * g))

    return jax.lax.fori_loop(0, n, body, buf)


def megabench(fn, args, batch, iters=8, warm=2):
    @jax.jit
    def mega(args, x0, iters):
        def body(i, carry):
            acc, x = carry
            out = fn(args, x)
            s = out.sum().astype(jnp.float32)
            # thread dependence: next input = first c0 channels of out
            return acc + s, (x + (s * 1e-24).astype(DT) * 0 +
                             out[..., : x.shape[-1]] * 1e-24)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), x0))[0]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (batch, 28, 28, 128)), DT)
    t0 = time.perf_counter()
    float(mega(args, x0, warm))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mega(args, x0, iters))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3, compile_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="concat,slab,bundle,fori_pad")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--check", action="store_true",
                    help="numeric equivalence on tiny shapes (CPU ok)")
    args = ap.parse_args()

    n, g, c0, mid = 12, 32, 128, 128
    ws = make_weights(c0, n, g, mid)
    stacked = _stack_padded(ws, c0 + n * g)

    if args.check:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.uniform(0, 1, (2, 28, 28, c0)), DT)
        ref = np.asarray(fwd_concat(ws, x), np.float32)
        for name, fn in [
            ("slab", lambda: fwd_slab(ws, x)),
            ("bundle", lambda: fwd_bundle(ws, x)),
            ("fori_pad", lambda: fwd_fori_pad(stacked, x, n, g)),
        ]:
            got = np.asarray(fn(), np.float32)
            err = np.abs(got - ref).max()
            print(json.dumps({"check": name, "max_abs_err": float(err)}))
            assert err < 0.25, (name, err)
        return

    ws_d = jax.device_put(ws)
    stacked_d = jax.device_put(stacked)
    for v in args.variants.split(","):
        fn = {"concat": lambda a, x: fwd_concat(a, x),
              "slab": lambda a, x: fwd_slab(a, x),
              "bundle": lambda a, x: fwd_bundle(a, x),
              "fori_pad": lambda a, x: fwd_fori_pad(a, x, n, g)}[v]
        arg = stacked_d if v == "fori_pad" else ws_d
        try:
            ms, cs = megabench(fn, arg, args.batch)
            print(json.dumps({"variant": v, "ms_per_block": round(ms, 2),
                              "compile_s": round(cs, 1)}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": v,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
