"""Chip trial of the DenseNet whole-block Pallas kernel (VERDICT r3 task 2).

The kernel (ops/pallas_densenet.py) was built from the measured concat/DUS
bottleneck study but wedged the TPU worker on its first chip attempt and
has been opt-in (`block_impl='pallas'`) and chip-unvalidated since. This
runs, in order of increasing risk:

  1. correctness at batch 64 (argmax agreement + max|delta| vs the XLA
     path — the runbook section-6 check),
  2. throughput megasteps for block_impl='auto' (XLA baseline) and
     'pallas' at batch 256.

Target from the r3 verdict: >= 7,600 img/s (from 6,329) to flip the
default; otherwise bury with numbers in WORKLOG.

Usage: python scripts/bench_densenet_pallas.py [--batch 256 --iters 10]
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


def make(impl: str):
    from robustart_tpu.models import create_classifier

    clf = create_classifier("densenet121", rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    if impl != "auto":
        clf.module = clf.module.clone(block_impl=impl)
    return clf


def correctness(batch=64):
    ref_clf, pal_clf = make("auto"), make("pallas")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)
    ref = np.asarray(ref_clf.apply_fn(ref_clf.variables, x, train=False),
                     np.float32)
    got = np.asarray(pal_clf.apply_fn(pal_clf.variables, x, train=False),
                     np.float32)
    agree = float((ref.argmax(1) == got.argmax(1)).mean())
    maxd = float(np.abs(ref - got).max())
    print(json.dumps({"check": "correctness", "batch": batch,
                      "argmax_agreement": agree, "max_abs_delta": maxd}),
          flush=True)
    return agree


def throughput(impl: str, batch: int, iters: int):
    clf = make(impl)

    @jax.jit
    def mega(v, xx, iters):
        def body(i, carry):
            acc, im = carry
            logits = clf.apply_fn(v, im, train=False)
            s = logits.sum().astype(jnp.float32)
            return acc + s, im + (s * 1e-24).astype(im.dtype)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)
    t0 = time.perf_counter()
    float(mega(clf.variables, x, 2))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mega(clf.variables, x, iters))
    dt = time.perf_counter() - t0
    row = {"model": "densenet121", "block_impl": impl, "batch": batch,
           "img_per_sec": round(batch * iters / dt, 1),
           "compile_s": round(compile_s, 1)}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-correctness", action="store_true")
    args = ap.parse_args()
    if not args.skip_correctness:
        agree = correctness()
        assert agree >= 0.99, f"pallas path diverges: {agree}"
    throughput("auto", args.batch, args.iters)
    throughput("pallas", args.batch, args.iters)


if __name__ == "__main__":
    main()
