"""Host-fed end-to-end pipeline benchmark (VERDICT r4 task 1).

Every published throughput number times DEVICE-RESIDENT batches; this
measures the stages a real stored-data run adds, then the true end-to-end
rate with host decode overlapped against device eval:

1. native C++ loader ABSOLUTE img/s — 480x640 JPEG -> resize-shorter-256
   -> center-crop-224, decoded by the libjpeg thread pool
   (native/loader.cpp), for 1/2/4/8/16 threads. The JPEGs are synthesized
   locally (no dataset needed; mixed-frequency content so decode cost is
   realistic, ~40-60 KB files like ImageNet val).
2. host->device transfer rate for uint8 (256,224,224,3) batches over the
   TPU relay (device_put + per-batch dispatch chain, one final fetch).
3. host-fed eval: loader batches -> device_put -> int8 ResNet-50 forward
   per batch (logit checksum accumulated ON DEVICE, fetched once) —
   (a) clean eval, (b) online ImageNet-C (fused gaussian-noise kernel).

This is what the reference needs DALI for (reference
exprs/robust_baseline_exp/resnet/resnet50/config.yaml:38 `use_dali: True`).

Usage: python scripts/bench_host_fed.py [--n-images 2048] [--batch 256]
Writes benchmarks/host_fed.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

JPEG_DIR = "/tmp/robustart_synth_jpeg"
REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def synth_jpegs(n: int, size=(640, 480), quality=87) -> list[str]:
    """Synthesize n JPEGs with photo-like spectra (smooth fields + texture +
    edges) so libjpeg decode cost matches real photos, ~40-70 KB each."""
    from PIL import Image

    os.makedirs(JPEG_DIR, exist_ok=True)
    paths = []
    rng = np.random.default_rng(0)
    base = None
    for i in range(n):
        p = osp.join(JPEG_DIR, f"img_{i:05d}.jpg")
        paths.append(p)
        if osp.exists(p):
            continue
        if base is None or i % 64 == 0:
            # low-freq field (upsampled noise) + texture + hard edges
            low = rng.normal(128, 48, (size[1] // 16, size[0] // 16, 3))
            low = np.kron(low, np.ones((16, 16, 1)))
            tex = rng.normal(0, 14, (size[1], size[0], 3))
            yy, xx = np.mgrid[0 : size[1], 0 : size[0]]
            edges = 40.0 * ((xx // 80 + yy // 60) % 2)
            base = low + tex + edges[..., None]
        arr = np.clip(base + rng.normal(0, 6, base.shape), 0, 255)
        Image.fromarray(arr.astype(np.uint8)).save(
            p, quality=quality, subsampling=2
        )
    return paths


def bench_loader(paths, batch, threads, input_size=224, test_resize=256,
                 dct_scale=False):
    from robustart_tpu.data.native_loader import NativeDataLoader

    labels = np.zeros(len(paths), np.int32)
    idx = np.arange(len(paths))
    loader = NativeDataLoader(
        paths, labels, idx, batch, input_size=input_size,
        test_resize=test_resize, mode="onecrop", num_threads=threads,
        dct_scale=dct_scale,
    )
    n = 0
    t0 = time.perf_counter()
    for b in loader:
        n += int(b.mask.sum())
    dt = time.perf_counter() - t0
    return n / dt


def _device_setup(batch):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/robustart_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.quantize import quantize_classifier
    from robustart_tpu.ops.pallas_noise import fused_noise_normalize

    clf = create_classifier("resnet50_official", rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    calib = rng.integers(0, 256, (128, 224, 224, 3), np.uint8)
    qclf = quantize_classifier(clf, calib, calib_batch_size=64)
    qparams = jax.device_put(qclf.qparams)

    @jax.jit
    def eval_clean(qparams, acc, images_u8):
        x_i8 = (images_u8.astype(jnp.int32) - 128).astype(jnp.int8)
        logits = qclf.apply_fn(qparams, x_i8)
        return acc + logits.sum()

    @jax.jit
    def eval_corrupt(qparams, acc, images_u8, i):
        x_i8 = fused_noise_normalize(
            images_u8, i, noise="gaussian_noise", sigma=0.18,
            out_dtype=jnp.int8, output="centered_u8",
        )
        logits = qclf.apply_fn(qparams, x_i8)
        return acc + logits.sum()

    return qparams, eval_clean, eval_corrupt


def bench_device_put(batch, iters=24):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    bufs = [
        rng.integers(0, 256, (batch, 224, 224, 3), np.uint8)
        for _ in range(4)
    ]
    tiny = jax.jit(lambda a, x: a + x.astype(jnp.float32).sum())
    acc = jax.device_put(jnp.float32(0.0))
    float(tiny(acc, jax.device_put(bufs[0])))  # warm the program
    t0 = time.perf_counter()
    for i in range(iters):
        x = jax.device_put(bufs[i % 4])
        acc = tiny(acc, x)
    assert np.isfinite(float(acc))
    dt = time.perf_counter() - t0
    mb = batch * 224 * 224 * 3 / 1e6
    return iters * mb / dt, iters * batch / dt


def bench_host_fed(paths, batch, threads, mode, qparams, eval_clean,
                   eval_corrupt):
    import jax
    import jax.numpy as jnp

    from robustart_tpu.data.native_loader import NativeDataLoader

    labels = np.zeros(len(paths), np.int32)
    idx = np.arange(len(paths))
    loader = NativeDataLoader(
        paths, labels, idx, batch, input_size=224, test_resize=256,
        mode="onecrop", num_threads=threads, dct_scale=True,
    )
    # warm compile outside the timed region
    warm = np.zeros((batch, 224, 224, 3), np.uint8)
    acc = jax.device_put(jnp.float32(0.0))
    if mode == "clean":
        float(eval_clean(qparams, acc, jax.device_put(warm)))
    else:
        float(eval_corrupt(qparams, acc, jax.device_put(warm),
                           jnp.int32(0)))
    n = 0
    acc = jax.device_put(jnp.float32(0.0))
    t0 = time.perf_counter()
    for i, b in enumerate(loader):
        x = jax.device_put(b.image)  # async; decode of next batch overlaps
        if mode == "clean":
            acc = eval_clean(qparams, acc, x)
        else:
            acc = eval_corrupt(qparams, acc, x, jnp.int32(i))
        n += int(b.mask.sum())
    checksum = float(acc)  # one fetch observes completion of the chain
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)
    return n / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-images", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--threads", default="1,2,4,8,16")
    ap.add_argument("--skip-device", action="store_true",
                    help="loader-only rows (no TPU)")
    args = ap.parse_args()

    out: dict = {"n_images": args.n_images, "batch": args.batch,
                 "jpeg": "640x480 q87 synthesized", "rows": {}}
    t0 = time.perf_counter()
    paths = synth_jpegs(args.n_images)
    print(json.dumps({"synth_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    sizes = [os.path.getsize(p) for p in paths[:200]]
    out["jpeg_kb_mean"] = round(float(np.mean(sizes)) / 1024, 1)

    best_th, best_rate = 8, 0.0
    for th in [int(t) for t in args.threads.split(",")]:
        r = bench_loader(paths, args.batch, th)
        out["rows"][f"loader_{th}t_img_per_sec"] = round(r, 1)
        rd = bench_loader(paths, args.batch, th, dct_scale=True)
        out["rows"][f"loader_dct_{th}t_img_per_sec"] = round(rd, 1)
        print(json.dumps({f"loader_{th}t": round(r, 1),
                          f"loader_dct_{th}t": round(rd, 1)}), flush=True)
        if rd > best_rate:
            best_th, best_rate = th, rd
    out["host_cores"] = os.cpu_count()

    if not args.skip_device:
        qparams, ec, ek = _device_setup(args.batch)
        mbps, ips = bench_device_put(args.batch)
        out["rows"]["device_put_MB_per_sec"] = round(mbps, 1)
        out["rows"]["device_put_img_per_sec"] = round(ips, 1)
        print(json.dumps({"device_put_MBps": round(mbps, 1),
                          "img_per_sec": round(ips, 1)}), flush=True)
        for mode in ("clean", "imagenet_c_online"):
            r = bench_host_fed(paths, args.batch, best_th, mode, qparams,
                               ec, ek)
            out["rows"][f"host_fed_{mode}_img_per_sec"] = round(r, 1)
            print(json.dumps({f"host_fed_{mode}": round(r, 1)}), flush=True)

    with open(osp.join(REPO, "benchmarks", "host_fed.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
