"""Headline benchmark: ImageNet-C eval throughput, ResNet-50, one TPU chip.

Measures the full on-device ImageNet-C evaluation pipeline — batched
corruption synthesis (gaussian_noise, the ImageNet-C flagship) + uint8
quantization + ResNet-50 forward at 224² — i.e. what ``multi_eval_solver``
does per batch in online mode (BASELINE.json config #2, north-star ≥5×
reference A100 images/sec).

The forward runs the framework's **int8 quantized eval path**
(robustart_tpu/models/quantize.py): BN-folded per-channel-int8 convs on the
TPU's int8 MXU (measured ~1.76× the bf16 conv rate on this chip), activation
scales calibrated on the corrupted eval distribution, and an *exact* int8
stem (normalized uint8 images have only 256 levels/channel, folded into the
stem weights). Numeric parity with the float forward is asserted by
tests/test_quantize.py (BN-fold exact; int8 argmax agreement ≥90%, logit
cosine >0.98). The fused Pallas noise kernel emits the int8 stem input
directly, so the pre-model chain is one VMEM pass. bf16 reference point:
10.9k img/s (round 1); int8 path: ~14.5k img/s.

``vs_baseline`` uses 2500 img/s as the reference point: an A100 running the
reference's eval loop (torch fp16 ResNet-50 inference with DALI decode,
corruptions precomputed on disk — the reference cannot synthesize corruptions
at eval speed at all; its PIL loop runs ~50-100 img/s, add_noise_utils.py:
22-31, so on-the-fly corruption is counted at the precomputed-dataset rate to
be conservative). This anchor is an assumption, not a measurement (see
BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: amortizes the multi-minute remote compile
# across bench invocations/rounds
jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REFERENCE_A100_IMG_PER_SEC = 2500.0  # assumed anchor, see BASELINE.md
BATCH = 512
ITERS = 20
WARMUP = 3
GAUSSIAN_SIGMA_SEV3 = 0.18  # reference severity-3 constant (corruptions.py:123)


def main() -> None:
    from robustart_tpu.models import create_classifier
    from robustart_tpu.models.quantize import quantize_classifier
    from robustart_tpu.ops.pallas_noise import fused_noise_normalize

    clf = create_classifier(
        "resnet50_official", rng=0, input_size=224, dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, size=(BATCH, 224, 224, 3), dtype=np.uint8)

    # calibrate activation scales on the corrupted eval distribution
    noisy = np.clip(
        images[:128] / 255.0
        + GAUSSIAN_SIGMA_SEV3 * rng.standard_normal((128, 224, 224, 3)),
        0.0,
        1.0,
    )
    calib = (noisy * 255).astype(np.uint8)
    qclf = quantize_classifier(clf, calib, calib_batch_size=64)
    qparams = jax.device_put(qclf.qparams)
    images_d = jax.device_put(images)

    # The relay transport makes per-call timing unreliable (completion is only
    # observable at host fetch), so the whole measured run is ONE XLA program:
    # a fori_loop of `iters` corrupted-eval batches accumulating a checksum,
    # fetched as a single scalar. Pre-model chain (noise + uint8 quantize →
    # int8 stem grid) is the fused Pallas kernel with on-chip PRNG.
    @jax.jit
    def megastep(qparams, images_u8, iters):
        def body(i, acc):
            x_i8 = fused_noise_normalize(
                images_u8,
                i,
                noise="gaussian_noise",
                sigma=GAUSSIAN_SIGMA_SEV3,
                out_dtype=jnp.int8,
                output="centered_u8",
            )
            logits = qclf.apply_fn(qparams, x_i8)
            return acc + logits.sum()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(megastep(qparams, images_d, WARMUP))  # compile + warmup

    t0 = time.perf_counter()
    checksum = float(megastep(qparams, images_d, ITERS))
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum)

    img_per_sec = BATCH * ITERS / dt
    line = {
        "metric": "imagenet_c_eval_images_per_sec_per_chip_resnet50",
        "value": round(img_per_sec, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / REFERENCE_A100_IMG_PER_SEC, 3),
    }
    # gaussian_noise is the CHEAPEST corruption; quote the measured
    # geomean over all 15 standard ImageNet-C corruptions next to it so
    # the headline can't be read as the whole-benchmark rate
    # (benchmarks/corruptions.json, scripts/bench_corruptions.py).
    try:
        import os.path as osp

        with open(osp.join(osp.dirname(osp.abspath(__file__)),
                           "benchmarks", "corruptions.json")) as f:
            summ = json.load(f)["summary"]["resnet50_int8"]
        if summ.get("n_measured", 0) >= 15:
            line["geomean_15_corruptions_img_per_sec"] = (
                summ["geomean_15_img_per_sec"])
    except (OSError, KeyError, ValueError):
        pass
    print(json.dumps(line))


def _main_with_watchdog(budget_s: float = 1500.0) -> None:
    """Run the bench in a worker thread with a hard deadline.

    The TPU relay has a known wedge mode where executions hang at host
    fetch (WORKLOG round 3) — a native-code hang can't be interrupted, so
    on timeout the main thread emits ONE structured error line (value 0)
    and hard-exits instead of hanging the driver's bench step forever.
    """
    import os
    import threading

    state: dict = {}

    def run():
        try:
            main()
            state["ok"] = True
        except BaseException as e:  # report, don't swallow silently
            state["err"] = f"{type(e).__name__}: {e}"

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(budget_s)
    if state.get("ok"):
        return
    err = state.get(
        "err",
        f"timeout after {budget_s:.0f}s (TPU worker unresponsive/wedged)",
    )
    print(json.dumps({
        "metric": "imagenet_c_eval_images_per_sec_per_chip_resnet50",
        "value": 0,
        "unit": "img/s/chip",
        "vs_baseline": 0,
        "error": err[:300],
    }))
    os._exit(1)


if __name__ == "__main__":
    _main_with_watchdog()
