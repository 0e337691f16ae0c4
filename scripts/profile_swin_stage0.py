"""Microbench the fused window-block kernel at Swin's small-C stage shapes.

Stage attribution (scripts/profile_swin.py) shows stage0 (56², C=128) at
~14 TF/s vs stage2's ~60 — each Swin stage has equal matmul FLOPs, so the
small-C stages are kernel-shape-bound. This sweeps windows-per-program
(wpb) and compares against the XLA einsum path (window_block_reference) and
the fused MLP kernel at the same shapes.

Run: python scripts/profile_swin_stage0.py [--batch 256]
"""

from __future__ import annotations

import argparse
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def mega_time(fn, x, iters=30, warm=2):
    @jax.jit
    def mega(xx, it):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur)
            return acc + out.sum().astype(jnp.float32), out

        return jax.lax.fori_loop(0, it, body, (jnp.float32(0.0), xx))[0]

    float(mega(x, warm))
    t0 = time.perf_counter()
    float(mega(x, iters))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    b = args.batch

    from robustart_tpu.ops.pallas_attention import (
        window_block_pallas,
        window_block_reference,
    )
    from robustart_tpu.ops.pallas_mlp import mlp_pallas

    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    # (label, nW/img, n, C, H)
    stages = [("stage0", 64, 49, 128, 4), ("stage1", 16, 49, 256, 8)]
    for label, nw, n, c, h in stages:
        bnw = b * nw
        x = jax.device_put(
            (rng.standard_normal((bnw, n, c)) * 0.5).astype(np.float32)
        ).astype(bf)
        ln_s = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32) * 0.05, bf
        )
        wq, wk, wv, wp = mk(c, c), mk(c, c), mk(c, c), mk(c, c)
        zb = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(
            rng.standard_normal((h, n, n)).astype(np.float32) * 0.02
        )
        mask = jnp.asarray(
            (rng.standard_normal((nw, n, n)) > 1.5).astype(np.float32) * -100.0
        )

        gflop = 2 * bnw * n * 4 * c * c / 1e9  # qkv+proj matmuls only

        for masked in (False, True):
            m = mask if masked else None
            for wpb in (8, 16, 32, 64):
                if bnw % wpb or (masked and nw % wpb):
                    continue
                try:
                    fn = functools.partial(
                        window_block_pallas, ln_scale=ln_s, ln_bias=ln_b,
                        wq=wq, bq=zb, wk=wk, bk=zb, wv=wv, bv=zb, wp=wp,
                        bp=zb, rel_bias=bias, mask=m, num_windows=nw,
                        eps=1e-5, wpb=wpb,
                    )
                    ms = mega_time(lambda xx: fn(xx), x)
                    print(f"{label} masked={masked} wpb={wpb:3d}: "
                          f"{ms:7.3f} ms  ({gflop / ms:6.1f} TF/s qkv+proj)",
                          flush=True)
                except Exception as e:  # VMEM overflow etc.
                    print(f"{label} masked={masked} wpb={wpb:3d}: FAIL "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)

        ref = functools.partial(
            window_block_reference, ln_scale=ln_s, ln_bias=ln_b,
            wq=wq, bq=zb, wk=wk, bk=zb, wv=wv, bv=zb, wp=wp, bp=zb,
            rel_bias=bias, mask=None, num_windows=nw, eps=1e-5,
        )
        ms = mega_time(lambda xx: ref(xx), x)
        print(f"{label} XLA einsum reference: {ms:7.3f} ms  "
              f"({gflop / ms:6.1f} TF/s qkv+proj)", flush=True)

        # fused MLP kernel at this stage's token count
        xt = x.reshape(-1, c)
        w1, b1 = mk(c, 4 * c), jnp.zeros((4 * c,), jnp.float32)
        w2, b2 = mk(4 * c, c), jnp.zeros((c,), jnp.float32)
        mlp = lambda xx: mlp_pallas(  # noqa: E731
            xx, w1, b1, w2, b2, act="gelu", ln=(ln_s, ln_b), ln_eps=1e-5,
            residual_input=True,
        )
        ms = mega_time(mlp, xt)
        mlp_gflop = 2 * xt.shape[0] * 8 * c * c / 1e9
        print(f"{label} fused MLP kernel: {ms:7.3f} ms  "
              f"({mlp_gflop / ms:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
