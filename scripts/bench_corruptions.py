"""Per-corruption ImageNet-C pipeline throughput on the real chip.

The headline bench (bench.py) synthesizes only gaussian_noise — the single
cheapest corruption. This measures the SAME per-batch program the online
fused evaluator runs (multi_eval_solver._eval_online_fused: uint8 → /255 →
vmap corrupt(severity 3) → floor·255 → forward) for EVERY on-device
corruption, on two pipelines:

- resnet50_official int8 PTQ eval path, batch 512 (the headline config),
- vit_b16_224 bf16 fused-block path, batch 256 (the zoo config).

jpeg_compression runs on device (bit-exact integer libjpeg transcode,
noise/corruptions/jpeg_jax.py); the legacy host PIL path is timed too as a
comparison row (pipeline "host_pil").

Megastep rules (CLAUDE.md): one jitted fori_loop over whole corrupted-eval
batches, ONE scalar fetched. Deterministic corruptions (contrast,
brightness, ...) have loop-invariant bodies, so the accumulated checksum is
threaded back into the next iteration's input (x01 + acc·1e-24) — without
this XLA hoists the body and the row measures nothing.

Writes benchmarks/corruptions.json; prints one JSON line per row plus the
geomean over the 15 standard ImageNet-C corruptions.

Usage: python scripts/bench_corruptions.py [--models resnet50,vit] [--iters N]
"""

import argparse
import json
import math
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
SEVERITY = 3
WARM = 1

# the 15 standard ImageNet-C corruptions (reference __init__.py:5-24 order)
STANDARD_15 = (
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression",
)
EXTRA_4 = ("speckle_noise", "gaussian_blur", "spatter", "saturate")


def make_megastep(corrupt_fn, severity, forward, int8):
    """One XLA program: iters × (corrupt → quantize → forward), checksum out.

    Mirrors multi_eval_solver._eval_online_fused's per-batch graph exactly
    (same corrupt→floor→forward chain, per-batch fold_in key), looped.
    """

    @jax.jit
    def megastep(params, images_u8, iters):
        base = jax.random.key(0)
        x01_const = images_u8.astype(jnp.float32) / 255.0

        def body(i, acc):
            # thread the carry into the input: invisible numerically
            # (|acc|·1e-24 ≪ f32 eps at 1.0) but defeats loop-invariant
            # hoisting for deterministic corruptions
            x01 = x01_const + acc * 1e-24
            ks = jax.random.split(
                jax.random.fold_in(base, i), x01.shape[0]
            )
            c = jax.vmap(
                lambda img, k: corrupt_fn(img, k, severity)
            )(x01, ks)
            k8 = jnp.floor(jnp.clip(c, 0.0, 1.0) * 255.0)
            if int8:
                logits = forward(params, (k8 - 128).astype(jnp.int8))
            else:
                logits = forward(params, k8 / 255.0)
            return acc + logits.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    return megastep


def build_pipelines(which, batch_override=0):
    """name -> (params_on_device, images_u8_on_device, forward, int8, batch)."""
    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.quantize import quantize_classifier

    rng = np.random.default_rng(0)
    out = {}
    if "resnet50" in which:
        clf = create_classifier(
            "resnet50_official", rng=0, input_size=224, dtype=jnp.bfloat16
        )
        batch = batch_override or 512
        images = rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
        ncal = min(128, batch)
        noisy = np.clip(
            images[:ncal] / 255.0
            + 0.18 * rng.standard_normal((ncal, 224, 224, 3)),
            0.0, 1.0,
        )
        q = quantize_classifier(
            clf, (noisy * 255).astype(np.uint8),
            calib_batch_size=min(64, batch),
        )
        out["resnet50_int8"] = (
            jax.device_put(q.qparams), jax.device_put(images),
            q.apply_fn, True, batch,
        )
    if "vit" in which:
        clf = create_classifier(
            "vit_b16_224", rng=0, input_size=224, dtype=jnp.bfloat16
        )
        batch = batch_override or 256
        images = rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)

        def fwd(params, x01, _clf=clf):
            return _clf.apply_fn(params, x01, train=False)

        out["vit_b16_bf16"] = (
            jax.device_put(clf.variables), jax.device_put(images),
            fwd, False, batch,
        )
    return out


def bench_host_jpeg(n=256):
    """Host-side PIL JPEG round-trip rate (single worker)."""
    from robustart_tpu.noise.corruptions import jpeg_compression_batch

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (n, 224, 224, 3), dtype=np.uint8)
    jpeg_compression_batch(imgs[:16], SEVERITY)  # warm PIL
    t0 = time.perf_counter()
    jpeg_compression_batch(imgs, SEVERITY)
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="resnet50,vit")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument(
        "--corruptions", default="",
        help="comma list; default = all 18 on-device + host jpeg",
    )
    args = ap.parse_args()

    from robustart_tpu.noise.corruptions.jax_kernels import CORRUPTIONS

    names = (
        args.corruptions.split(",") if args.corruptions
        else list(STANDARD_15 + EXTRA_4)
    )
    partial = bool(args.corruptions)
    pipelines = build_pipelines(args.models.split(","), args.batch)

    rows = []
    # clean-forward reference rows (corruption-cost denominator)
    for pname, (params, images, fwd, int8, batch) in pipelines.items():
        ident = lambda img, k, s: img  # noqa: E731
        mega = make_megastep(ident, SEVERITY, fwd, int8)
        float(mega(params, images, WARM))
        t0 = time.perf_counter()
        float(mega(params, images, args.iters))
        rate = batch * args.iters / (time.perf_counter() - t0)
        rows.append({"corruption": "clean", "pipeline": pname,
                     "img_per_sec": round(rate, 1)})
        print(json.dumps(rows[-1]), flush=True)

    for name in names:
        fn = CORRUPTIONS[name]
        for pname, (params, images, fwd, int8, batch) in pipelines.items():
            mega = make_megastep(fn, SEVERITY, fwd, int8)
            try:
                t_c0 = time.perf_counter()
                float(mega(params, images, WARM))
                compile_s = time.perf_counter() - t_c0
                t0 = time.perf_counter()
                float(mega(params, images, args.iters))
                dt = time.perf_counter() - t0
            except Exception as e:  # keep sweeping past one bad kernel
                rows.append({"corruption": name, "pipeline": pname,
                             "error": f"{type(e).__name__}: {e}"[:200]})
                print(json.dumps(rows[-1]), flush=True)
                continue
            rate = batch * args.iters / dt
            rows.append({
                "corruption": name, "pipeline": pname, "severity": SEVERITY,
                "batch": batch, "img_per_sec": round(rate, 1),
                "compile_s": round(compile_s, 1),
            })
            print(json.dumps(rows[-1]), flush=True)

    # reference comparison row: the old host PIL jpeg path (the device
    # jpeg_jax kernel above is bitwise-identical to it — tests/test_jpeg_jax)
    jpeg_rate = bench_host_jpeg(min(256, args.batch or 256))
    rows.append({"corruption": "jpeg_compression", "pipeline": "host_pil",
                 "severity": SEVERITY, "img_per_sec": round(jpeg_rate, 1)})
    print(json.dumps(rows[-1]), flush=True)

    # partial sweeps (--corruptions) merge into the existing table so a
    # single re-measured kernel updates its rows + the geomean in place
    json_path = osp.join(REPO, "benchmarks", "corruptions.json")
    if partial and osp.exists(json_path):
        with open(json_path) as f:
            old = json.load(f)
        fresh = {(r["corruption"], r["pipeline"]) for r in rows}
        rows = [
            r for r in old.get("rows", [])
            if (r["corruption"], r["pipeline"]) not in fresh
        ] + rows

    summary = {}
    for pname in pipelines:
        clean = next(r["img_per_sec"] for r in rows
                     if r["corruption"] == "clean" and r["pipeline"] == pname)
        vals = []
        for cname in STANDARD_15:
            r = next((r for r in rows if r["corruption"] == cname
                      and r["pipeline"] == pname), None)
            if r is None or "img_per_sec" not in r:
                vals.append(float("nan"))
            else:
                vals.append(r["img_per_sec"])
        ok = [v for v in vals if v == v]
        summary[pname] = {
            "geomean_15_img_per_sec": round(
                math.exp(sum(math.log(v) for v in ok) / len(ok)), 1
            ) if ok else 0,
            "n_measured": len(ok),
            "clean_img_per_sec": clean,
        }
    out = {"severity": SEVERITY, "rows": rows, "summary": summary}
    with open(json_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"summary": summary}), flush=True)


if __name__ == "__main__":
    main()
