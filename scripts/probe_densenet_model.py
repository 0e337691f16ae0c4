"""densenet121 end-to-end concat_impl sweep on chip (VERDICT r4 task 3).

The block-2 standalone probe (probe_densenet_block.py) measured plain
concat at 9.63 ms — faster than every concat-free structure AND faster
than the r3 in-model concat attribution (14.78 ms), suggesting the current
all-'buffer' default (6,329 img/s) is not the XLA ceiling. This sweeps the
full model: concat_impl in {buffer, concat, auto} plus block_impl=slab.

Usage: python scripts/probe_densenet_model.py [--variants a,b]
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


def bench(variant: str, batch: int, iters=10, warm=2) -> dict:
    from robustart_tpu.models import create_classifier

    kwargs = {"dtype": jnp.bfloat16}
    if variant == "slab":
        kwargs["block_impl"] = "slab"
    else:
        kwargs["concat_impl"] = variant
    clf = create_classifier("densenet121", rng=0, input_size=224, **kwargs)
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

    t0 = time.perf_counter()
    float(mega(clf.variables, x_u8, warm))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mega(clf.variables, x_u8, iters))
    dt = time.perf_counter() - t0
    return {"variant": variant, "img_per_sec": round(batch * iters / dt, 1),
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="concat,auto,buffer")
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()
    for v in args.variants.split(","):
        try:
            print(json.dumps(bench(v, args.batch)), flush=True)
        except Exception as e:
            print(json.dumps({"variant": v,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
