"""Eval-throughput sweep across the model zoo on the real TPU chip.

For each model: one jitted megastep (fori_loop of forward passes with a
loop-carried dependency — see CLAUDE.md on hoisting) at 224² bf16, plus the
int8 PTQ path where the family supports it. Writes benchmarks/RESULTS.md
and benchmarks/results.json.

Run: python scripts/bench_models.py [--models a,b,c] [--batch 256]
(~1-2 min compile per model on the relay; cached afterwards.)
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

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

DEFAULT_MODELS = [
    "resnet50_official", "resnet18_official", "vit_b16_224",
    "deit_tiny_b16_224", "mixer_b16_224", "mobilenet_v2",
    "efficientnet_b0", "convnext_base", "swin_base_224",
    "shufflenet_v2_x1_0", "regnetx_3200m", "densenet121", "repvgg_A0",
    "mobilenet_v3_large_x1_0", "clip_vit_l_14",
]

INT8_FAMILIES = (
    "ResNet", "VisionTransformer", "MobileNetV2",
    "EfficientNet", "DenseNet", "RegNetX", "RepVGG", "ShuffleNetV2",
    "MlpMixer", "ConvNeXt", "SwinTransformer", "MobileNetV3",
)


def _measure(step_fn, params, x, batch, iters=10, warm=2):
    float(step_fn(params, x, warm))
    t0 = time.perf_counter()
    float(step_fn(params, x, iters))
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_model(name: str, batch: int, skip_int8: bool = False) -> dict:
    from robustart_tpu.models import create_classifier

    row = {"model": name, "batch": batch}
    clf = create_classifier(name, rng=0, input_size=224, dtype=jnp.bfloat16)
    if type(clf.module).__name__ == "RepVGG":
        # eval runs the re-parameterized deploy form (solver default,
        # solvers/base.py::maybe_deploy)
        from robustart_tpu.models.repvgg import deploy_classifier

        clf = deploy_classifier(clf)
    rng = np.random.default_rng(0)
    module = clf.module
    x_u8 = jax.device_put(
        rng.integers(0, 256, (batch, 224, 224, 3), dtype=np.uint8)
    )

    @jax.jit
    def mega_bf(variables, xx, iters):
        def body(i, carry):
            acc, im = carry
            logits = clf.apply_fn(
                variables, im.astype(jnp.float32) / 255.0, train=False
            )
            s = logits.sum()
            return acc + s, im ^ (s.astype(jnp.int32) >> 31).astype(jnp.uint8)

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

    row["bf16_img_per_sec"] = round(
        _measure(mega_bf, clf.variables, x_u8, batch), 1
    )

    if not skip_int8 and type(module).__name__ in INT8_FAMILIES:
        clf32 = create_classifier(name, rng=0, input_size=224)
        calib = rng.integers(0, 256, (128, 224, 224, 3), np.uint8)
        fam = type(module).__name__
        if fam == "ResNet":
            from robustart_tpu.models.quantize import quantize_classifier as qf
        elif fam == "VisionTransformer":
            from robustart_tpu.models.quantize_vit import quantize_vit as qf
        elif fam == "MobileNetV2":
            from robustart_tpu.models.quantize_mobilenet import (
                quantize_mobilenet_v2 as qf,
            )
        elif fam == "EfficientNet":
            from robustart_tpu.models.quantize_efficientnet import (
                quantize_efficientnet as qf,
            )
        elif fam == "DenseNet":
            from robustart_tpu.models.quantize_densenet import (
                quantize_densenet as qf,
            )
        elif fam == "RepVGG":
            from robustart_tpu.models.quantize_repvgg import (
                quantize_repvgg as qf,
            )
        elif fam == "ShuffleNetV2":
            from robustart_tpu.models.quantize_shufflenet import (
                quantize_shufflenet as qf,
            )
        elif fam == "MlpMixer":
            from robustart_tpu.models.quantize_mixer import (
                quantize_mixer as qf,
            )
        elif fam == "ConvNeXt":
            from robustart_tpu.models.quantize_convnext import (
                quantize_convnext as qf,
            )
        elif fam == "SwinTransformer":
            from robustart_tpu.models.quantize_swin import (
                quantize_swin as qf,
            )
        elif fam == "MobileNetV3":
            from robustart_tpu.models.quantize_mobilenet_v3 import (
                quantize_mobilenet_v3 as qf,
            )
        else:
            from robustart_tpu.models.quantize_regnet import (
                quantize_regnet as qf,
            )
        q = qf(clf32, calib, calib_batch_size=64)
        qp = jax.device_put(q.qparams)
        x_i8 = jax.device_put(
            (rng.integers(0, 256, (batch, 224, 224, 3)).astype(np.int32) - 128)
            .astype(np.int8)
        )

        @jax.jit
        def mega_i8(qp, xx, iters):
            def body(i, carry):
                acc, im = carry
                logits = q.apply_fn(qp, im)
                s = logits.sum()
                return acc + s, im ^ (
                    s.astype(jnp.int32) >> 31
                ).astype(jnp.int8)

            return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), xx))[0]

        row["int8_img_per_sec"] = round(_measure(mega_i8, qp, x_i8, batch), 1)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default=",".join(DEFAULT_MODELS))
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--out", default=osp.join(REPO, "benchmarks"))
    ap.add_argument("--skip-int8", action="store_true")
    args = ap.parse_args(argv)

    import os

    os.makedirs(args.out, exist_ok=True)
    rows = []
    for name in args.models.split(","):
        try:
            row = bench_model(name.strip(), args.batch,
                              skip_int8=args.skip_int8)
        except Exception as e:  # keep the sweep alive past one bad model
            row = {"model": name, "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row))
        rows.append(row)

    dev = jax.devices()[0]
    # merge into existing results so a partial --models run updates rows
    # instead of clobbering the full table
    res_path = osp.join(args.out, "results.json")
    merged: dict[str, dict] = {}
    if osp.exists(res_path):
        try:
            with open(res_path) as f:
                for r in json.load(f).get("rows", []):
                    merged[r["model"]] = r
        except (json.JSONDecodeError, KeyError):
            pass
    for r in rows:
        merged[r["model"]] = r
    rows = list(merged.values())
    payload = {"device": str(dev), "batch": args.batch, "rows": rows}
    with open(res_path, "w") as f:
        json.dump(payload, f, indent=2)

    lines = [
        "## Model-zoo eval throughput (one TPU chip, measured)",
        "",
        f"Device: `{dev}` — batch {args.batch}, 224², bf16 forward "
        "(uint8 in, /255 + normalize fused); int8 = PTQ eval path where the "
        "family supports it. Generated by `scripts/bench_models.py`.",
        "",
        "| model | bf16 img/s | int8 img/s |",
        "|---|---|---|",
    ]
    for r in rows:
        if "error" in r:
            lines.append(f"| {r['model']} | error: {r['error']} | |")
        else:
            lines.append(
                "| {model} | {bf} | {i8} |".format(
                    model=r["model"],
                    bf=f"{r['bf16_img_per_sec']:,.0f}",
                    i8=(
                        f"{r['int8_img_per_sec']:,.0f}"
                        if "int8_img_per_sec" in r
                        else "—"
                    ),
                )
            )
    md_path = osp.join(args.out, "RESULTS.md")
    prefix = ""
    notes = ""
    if osp.exists(md_path):
        with open(md_path) as f:
            old = f.read()
        marker = "## Model-zoo eval throughput"
        rest = old
        if marker in old:  # other sections before ours survive regeneration
            prefix, tail = old.split(marker, 1)
            rest = marker + tail
        if "\nNotes:" in rest:  # hand-written notes survive regeneration
            notes = "\nNotes:" + rest.split("\nNotes:", 1)[1]
    with open(md_path, "w") as f:
        f.write(prefix + "\n".join(lines) + "\n" + notes)
    print(f"wrote {md_path}")


if __name__ == "__main__":
    main()
