"""Measure the fused ConvNeXt dwconv+LN Pallas kernel on the real TPU.

Compares convnext_base eval throughput with block_impl xla vs pallas
(batch 256, bf16), plus a microbench of the kernel itself per stage shape.
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


def measure_model(impl: str, batch: int) -> float:
    from robustart_tpu.models import create_classifier

    clf = create_classifier(
        "convnext_base", rng=0, input_size=224, dtype=jnp.bfloat16,
        block_impl=impl,
    )
    rng = np.random.default_rng(0)
    x_u8 = jax.device_put(
        rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
    )

    @jax.jit
    def mega(variables, xx, iters):
        def body(i, carry):
            acc, im = carry
            logits = clf.apply_fn(
                variables, im.astype(jnp.float32) / 255.0, train=False
            )
            s = logits.sum()
            return acc + s, im ^ (s.astype(jnp.int32) >> 31).astype(jnp.uint8)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    float(mega(clf.variables, x_u8, 2))
    t0 = time.perf_counter()
    float(mega(clf.variables, x_u8, 10))
    dt = time.perf_counter() - t0
    return batch * 10 / dt


def microbench(batch: int):
    """Per-stage kernel vs XLA reference timing."""
    from robustart_tpu.ops.pallas_convnext import (
        dwconv_ln_pallas,
        dwconv_ln_reference,
    )

    shapes = [(56, 128), (28, 256), (14, 512), (7, 1024)]
    for h, c in shapes:
        rng = np.random.default_rng(0)
        x = jax.device_put(
            jnp.asarray(rng.standard_normal((batch, h, h, c)), jnp.bfloat16)
        )
        w = jnp.asarray(rng.standard_normal((7, 7, 1, c)) * 0.1, jnp.float32)
        b, g, bt = (jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
                    for _ in range(3))

        for tag, fn in (("pallas", dwconv_ln_pallas),
                        ("xla", dwconv_ln_reference)):
            @jax.jit
            def mega(x, iters, fn=fn):
                def body(i, xx):
                    return fn(xx, w, b, g, bt)

                return jax.lax.fori_loop(0, iters, body, x).sum()

            # relay dispatch overhead is tens of ms — amortize over many
            # in-loop iterations (CLAUDE.md megastep rule)
            iters = 500
            float(mega(x, 10))
            t0 = time.perf_counter()
            float(mega(x, iters))
            dt = (time.perf_counter() - t0) / iters
            gb = 2 * batch * h * h * c * 2 / 1e9  # bf16 read+write
            print(f"  ({h:3d},{h:3d},{c:4d}) {tag:6s} {dt*1e3:7.3f} ms "
                  f"{gb/dt:6.1f} GB/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--impl", default=None, help="only measure one impl")
    args = ap.parse_args()
    if args.micro:
        microbench(args.batch)
        return
    impls = [args.impl] if args.impl else ["xla", "pallas"]
    for impl in impls:
        r = measure_model(impl, args.batch)
        print(f"convnext_base {impl}: {r:.0f} img/s")


if __name__ == "__main__":
    main()
