"""Two-point attribution of swin_base_224 eval time on the real chip.

Times depth-zeroed SwinTransformer variants with one jitted megastep each
(loop-carried checksum — see CLAUDE.md on fori_loop hoisting); the delta
between the full model and a variant with stage *i*'s blocks removed is the
cost of that stage's blocks (window layout + fused block-half kernels).
Also microbenches the fused window-block kernel and the fused MLP kernel
alone at the stage-2 shape to split kernel time from HBM layout passes.

Run: python scripts/profile_swin.py [--batch 256]
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def time_model(module, batch, iters=10, warm=2):
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, 224, 224, 3)).astype(np.float32)
    )
    variables = module.init(
        {"params": jax.random.key(0)}, np.zeros((2, 224, 224, 3), np.float32),
        train=False,
    )

    @jax.jit
    def mega(v, xx, iters):
        def body(i, carry):
            acc, im = carry
            logits = module.apply(v, im, train=False)
            s = logits.sum().astype(jnp.float32)
            return acc + s, im + (s * 0).astype(im.dtype)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    float(mega(variables, x, warm))
    t0 = time.perf_counter()
    float(mega(variables, x, iters))
    dt = time.perf_counter() - t0
    return dt / iters * 1e3  # ms per batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from robustart_tpu.models.swin import SwinTransformer

    full = (2, 2, 18, 2)
    variants = {"full": full}
    for si in range(4):
        d = list(full)
        d[si] = 0
        variants[f"no_stage{si}"] = tuple(d)

    base_kw = dict(
        embed_dim=128, num_heads=(4, 8, 16, 32), dtype=jnp.bfloat16,
        drop_path=0.0,
    )
    times = {}
    for name, depths in variants.items():
        m = SwinTransformer(depths=depths, **base_kw)
        ms = time_model(m, args.batch, iters=args.iters)
        times[name] = ms
        print(f"{name:12s} depths={depths}  {ms:8.2f} ms/batch "
              f"({args.batch / ms * 1e3:,.0f} img/s)", flush=True)

    for si in range(4):
        delta = times["full"] - times[f"no_stage{si}"]
        n = full[si]
        print(f"stage{si}: {delta:7.2f} ms for {n} blocks "
              f"({delta / max(n, 1):.2f} ms/block)")
    resid = times["full"] - sum(
        times["full"] - times[f"no_stage{si}"] for si in range(4)
    )
    print(f"stem+merges+head+overlap: {resid:.2f} ms")

    # kernel-only microbench at the stage-2 shape (14x14, C=512, 18 blocks)
    from robustart_tpu.ops.pallas_attention import window_block_pallas
    from robustart_tpu.ops.pallas_mlp import mlp_pallas

    b, n, c, h = args.batch * 4, 49, 512, 16
    rng = np.random.default_rng(1)
    bf = jnp.bfloat16
    xw = jax.device_put(rng.standard_normal((b, n, c)).astype(np.float32)).astype(bf)
    ln_s = jnp.ones((c,), jnp.float32)
    ln_b = jnp.zeros((c,), jnp.float32)
    mk = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.02, bf
    )
    wq, wk, wv, wp = mk(c, c), mk(c, c), mk(c, c), mk(c, c)
    bq = bk = bv = bp = jnp.zeros((c,), jnp.float32)
    bias = jnp.zeros((h, n, n), jnp.float32)

    @jax.jit
    def mega_blk(xx, iters):
        def body(i, carry):
            acc, cur = carry
            out = window_block_pallas(
                cur, ln_s, ln_b, wq, bq, wk, bk, wv, bv, wp, bp,
                bias, None, num_windows=1, eps=1e-5,
            )
            return acc + out.sum().astype(jnp.float32), out

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    float(mega_blk(xw, 2))
    t0 = time.perf_counter()
    float(mega_blk(xw, 36))
    blk_ms = (time.perf_counter() - t0) / 36 * 1e3
    print(f"window_block kernel alone (stage2 shape): {blk_ms:.3f} ms/call "
          f"-> {blk_ms * 18:.2f} ms per 18 blocks")

    w1, b1 = mk(c, 4 * c), jnp.zeros((4 * c,), jnp.float32)
    w2, b2 = mk(4 * c, c), jnp.zeros((c,), jnp.float32)
    xt = xw.reshape(-1, c)

    @jax.jit
    def mega_mlp(xx, iters):
        def body(i, carry):
            acc, cur = carry
            out = mlp_pallas(
                cur, w1, b1, w2, b2, act="gelu",
                ln=(ln_s, ln_b), ln_eps=1e-5, residual_input=True,
            )
            return acc + out.sum().astype(jnp.float32), out

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    float(mega_mlp(xt, 2))
    t0 = time.perf_counter()
    float(mega_mlp(xt, 36))
    mlp_ms = (time.perf_counter() - t0) / 36 * 1e3
    print(f"mlp kernel alone (stage2 shape): {mlp_ms:.3f} ms/call "
          f"-> {mlp_ms * 18:.2f} ms per 18 blocks")


if __name__ == "__main__":
    main()


def stem_only(batch=256, iters=10):
    """Time the trunk with ZERO blocks: stem + 3 patch-merges + norm +
    head — isolates the 13.3 ms 'stem+merges+head+overlap' residual from
    the stage attribution (is it layout-op slack or irreducible?)."""
    from robustart_tpu.models.swin import SwinTransformer

    m = SwinTransformer(depths=(0, 0, 0, 0), embed_dim=128,
                        num_heads=(4, 8, 16, 32), dtype=jnp.bfloat16,
                        drop_path=0.0)
    ms = time_model(m, batch, iters=iters)
    print(f"depths=(0,0,0,0) stem+merges+head: {ms:.2f} ms/batch "
          f"({batch / ms * 1e3:,.0f} img/s)", flush=True)
