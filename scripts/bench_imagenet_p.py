"""ImageNet-P online perturbation-sequence throughput on the real chip.

The mFR benchmark (reference exprs/exp/imagenet-p-loop-mini/eval.sh;
evaluator protocol SURVEY.md §3.5) scores 31-frame perturbation videos.
The stored-video path runs at the plain model rate (decode + one big
forward); this measures the STORAGE-FREE online mode
(imgnet_p_eval_solver.perturb_frame): synthesize each frame on device and
classify it, for every default perturbation.

Megastep rules (CLAUDE.md): the whole (iters × n_frames × batch) sweep is
ONE XLA program — a nested fori_loop generating frame f from the carried
image batch, running the int8 ResNet-50 forward, and accumulating a logits
checksum that is threaded back into the next frame's input (· 1e-24) so
deterministic ramps (brightness, affine warps) cannot hoist.

Unit: img·frames/s — frames classified per second; one 31-frame video
costs 31 frames. Writes benchmarks/imagenet_p.json.

Usage: python scripts/bench_imagenet_p.py [--perts a,b] [--iters N]
"""

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

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
N_FRAMES = 31  # reference ImageNet-P video length
WARM = 1


def make_megastep(pert, forward, n_frames):
    from robustart_tpu.solvers.imgnet_p_eval_solver import perturb_frame

    @jax.jit
    def megastep(qparams, images_u8, iters):
        base = jax.random.key(0)
        x01_const = images_u8.astype(jnp.float32) / 255.0

        def video(i, acc):
            def frame(f, acc2):
                # carry-threaded input: numerically invisible, defeats
                # loop-invariant hoisting of deterministic ramps
                x01 = x01_const + acc2 * 1e-24
                ks = jax.random.split(
                    jax.random.fold_in(jax.random.fold_in(base, i), f),
                    x01.shape[0],
                )
                fr = jax.vmap(
                    lambda img, k: perturb_frame(pert, img, f, k, n_frames)
                )(x01, ks)
                k8 = jnp.floor(jnp.clip(fr, 0.0, 1.0) * 255.0)
                logits = forward(qparams, (k8 - 128).astype(jnp.int8))
                return acc2 + logits.astype(jnp.float32).sum()

            return jax.lax.fori_loop(0, n_frames, frame, acc)

        return jax.lax.fori_loop(0, iters, video, jnp.float32(0.0))

    return megastep


def main(argv=None):
    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.quantize import quantize_classifier
    from robustart_tpu.solvers.imgnet_p_eval_solver import (
        DEFAULT_PERTURBATIONS,
    )

    ap = argparse.ArgumentParser()
    ap.add_argument("--perts", default=",".join(DEFAULT_PERTURBATIONS))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args(argv)

    clf = create_classifier(
        "resnet50_official", rng=0, input_size=224, dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (args.batch, 224, 224, 3), dtype=np.uint8)
    q = quantize_classifier(clf, images, calib_batch_size=min(64, args.batch))
    qparams = jax.device_put(q.qparams)
    images_d = jax.device_put(images)

    rows = []
    for pert in args.perts.split(","):
        mega = make_megastep(pert, q.apply_fn, N_FRAMES)
        try:
            t0 = time.perf_counter()
            float(mega(qparams, images_d, WARM))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            checksum = float(mega(qparams, images_d, args.iters))
            dt = time.perf_counter() - t0
            assert np.isfinite(checksum)
            rate = args.batch * N_FRAMES * args.iters / dt
            row = {
                "perturbation": pert, "pipeline": "resnet50_int8",
                "batch": args.batch, "n_frames": N_FRAMES,
                "img_frames_per_sec": round(rate, 1),
                "videos_per_sec": round(rate / N_FRAMES, 1),
                "compile_s": round(compile_s, 1),
            }
        except Exception as e:  # keep sweeping; record the failure
            row = {"perturbation": pert, "pipeline": "resnet50_int8",
                   "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row))
        rows.append(row)

    ok = [r["img_frames_per_sec"] for r in rows if "img_frames_per_sec" in r]
    summary = {}
    if ok:
        summary = {
            "geomean_img_frames_per_sec": round(
                float(np.exp(np.mean(np.log(ok)))), 1),
            "n_measured": len(ok),
        }
        print(json.dumps({"summary": summary}))
    with open(osp.join(REPO, "benchmarks", "imagenet_p.json"), "w") as f:
        json.dump({"n_frames": N_FRAMES, "rows": rows, "summary": summary},
                  f, indent=1)


if __name__ == "__main__":
    main()
