"""int8-vs-bf16 matmul microbench at ViT-B block shapes (VERDICT r4 task 6).

Grounds the int8-transformer decision: the fused bf16 whole-block kernel
runs vit_b16 at 3,371 img/s; an int8 fused kernel could only win if the
int8 MXU rate on the block's matmuls beats bf16 by more than the requant
epilogue cost. This measures the raw dot_general rates at the exact
(M,K,N) shapes a ViT-B/16 batch-64 block issues:

  qkv   (12608, 768)  x (768, 2304)
  proj  (12608, 768)  x (768, 768)
  fc1   (12608, 768)  x (768, 3072)
  fc2   (12608, 3072) x (3072, 768)

plus the int8+requant form (int32 accum -> f32 scale -> clip -> int8) that
a fused int8 block would actually pay between consecutive matmuls.

Usage: python scripts/probe_int8_matmul.py
"""

from __future__ import annotations

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

SHAPES = {
    "qkv": (12608, 768, 2304),
    "proj": (12608, 768, 768),
    "fc1": (12608, 768, 3072),
    "fc2": (12608, 3072, 768),
}


def bench(kind: str, m: int, k: int, n: int, iters=30, warm=3) -> float:
    rng = np.random.default_rng(0)
    if kind == "bf16":
        a = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)

        @jax.jit
        def mega(a, b, iters):
            def body(i, carry):
                acc, a = carry
                y = jax.lax.dot(a, b)
                # thread the output back (nothing hoists): reuse y's first
                # k columns as the next a
                # recycle output columns as the next input (tile when
                # n < k, e.g. fc2's 768 -> 3072 carry)
                reps = -(-k // y.shape[1])
                nxt = jnp.tile(y, (1, reps))[:, :k].astype(a.dtype)
                return acc + y[0, 0].astype(jnp.float32), nxt

            return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), a))[0]

    else:  # int8 / int8_requant
        a = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)

        @jax.jit
        def mega(a, b, iters):
            def body(i, carry):
                acc, a = carry
                y32 = jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if kind == "int8_requant":
                    # the inter-matmul epilogue a fused int8 block pays:
                    # int32 -> f32 scale -> round -> clip -> int8
                    yq = jnp.clip(
                        jnp.round(y32.astype(jnp.float32) * 0.0003),
                        -127, 127,
                    ).astype(jnp.int8)
                    reps = -(-k // yq.shape[1])
                    nxt = jnp.tile(yq, (1, reps))[:, :k]
                    chk = y32[0, 0].astype(jnp.float32)
                else:
                    reps = -(-k // y32.shape[1])
                    nxt = jnp.clip(jnp.tile(y32, (1, reps))[:, :k] >> 7,
                                   -127, 127).astype(jnp.int8)
                    chk = y32[0, 0].astype(jnp.float32)
                return acc + chk, nxt

            return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), a))[0]

    float(mega(a, b, warm))
    t0 = time.perf_counter()
    float(mega(a, b, iters))
    dt = time.perf_counter() - t0
    return 2.0 * m * k * n * iters / dt / 1e12  # TFLOP/s


def main():
    for name, (m, k, n) in SHAPES.items():
        row = {"shape": name, "mkn": [m, k, n]}
        for kind in ("bf16", "int8", "int8_requant"):
            try:
                row[f"{kind}_tflops"] = round(bench(kind, m, k, n), 1)
            except Exception as e:
                row[f"{kind}_error"] = f"{type(e).__name__}: {e}"[:120]
        if "bf16_tflops" in row and "int8_tflops" in row:
            row["int8_over_bf16"] = round(
                row["int8_tflops"] / row["bf16_tflops"], 3
            )
        if "bf16_tflops" in row and "int8_requant_tflops" in row:
            row["int8_requant_over_bf16"] = round(
                row["int8_requant_tflops"] / row["bf16_tflops"], 3
            )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
