"""Adversarial-attack throughput on the real chip — the cost driver of the
AR/WCAR benchmarks (reference budget: PGD/MIM 20 steps over 50k val images,
add_noise_utils.py:12-17).

Measures jitted attack generation rate (img/s and img·steps/s) for
fgsm / pgd_linf-20 / mim_linf-20 on resnet50_official and vit_b16_224
(bf16 forwards, f32 perturbation math). Megastep rules per CLAUDE.md: one
fori_loop over whole attack invocations, the adversarial output XORed back
into the next iteration's input so nothing hoists, one scalar fetched.

Writes benchmarks/attacks.json and prints one JSON line per row.
"""

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
BATCH = 64
ITERS = 6
WARM = 1
ATTACKS = {  # name -> (fn-name, steps per invocation, kwargs)
    "fgsm": ("fgsm", 1, {}),
    "pgd_linf_20": ("pgd_linf", 20, {}),
    "mim_linf_20": ("mim_linf", 20, {}),
}


def bench(model_name: str) -> list[dict]:
    from robustart_tpu.attacks import gradient
    from robustart_tpu.models import create_classifier

    clf = create_classifier(model_name, rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (BATCH, 224, 224, 3)), jnp.float32)
    # labels = model's own argmax (random labels leave an empty worklist,
    # see .claude/skills/verify). argmax on HOST: fusing argmax behind a
    # CNN forward aborts this XLA TPU build (CLAUDE.md).
    logits0 = np.asarray(clf.apply_fn(clf.variables, x0, train=False))
    labels = jnp.asarray(np.argmax(logits0, -1))

    rows = []
    for disp, (fn_name, steps, kw) in ATTACKS.items():
        fn = getattr(gradient, fn_name)

        @jax.jit
        def mega(variables, x_init, iters):
            def body(i, carry):
                acc, x = carry
                adv = fn(clf.apply_fn, variables, x, labels,
                         jax.random.key(0), **kw)
                s = jnp.sum(adv)
                # thread the adversarial image back in (hoisting guard)
                x = jnp.clip(x + (adv - x) * 1e-3, 0.0, 1.0)
                return acc + s, x

            return jax.lax.fori_loop(0, iters, body,
                                     (jnp.float32(0.0), x_init))[0]

        float(mega(clf.variables, x0, WARM))
        t0 = time.perf_counter()
        float(mega(clf.variables, x0, ITERS))
        dt = time.perf_counter() - t0
        img_s = BATCH * ITERS / dt
        row = {
            "model": model_name, "attack": disp, "batch": BATCH,
            "img_per_sec": round(img_s, 1),
            "img_steps_per_sec": round(img_s * steps, 1),
        }
        print(json.dumps(row))
        rows.append(row)
    return rows


def autoattack_wallclock(model_name: str = "resnet50_official",
                         bs: int = 250) -> dict:
    """One standard-cascade AutoAttack wall-clock at the reference's eval
    batch size (reference autoattack run_standard_evaluation bs=250) —
    full budget: apgd-ce / apgd-t / fab-t / square, n_iter=100, 5000
    square queries. Host orchestration + dispatch latency included: this
    is the number a user's robust-accuracy eval actually pays."""
    from robustart_tpu.attacks.autoattack.core import AutoAttack
    from robustart_tpu.models import create_classifier

    clf = create_classifier(model_name, rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (bs, 224, 224, 3)), jnp.float32)
    logits0 = np.asarray(clf.apply_fn(clf.variables, x0, train=False))
    y = jnp.asarray(np.argmax(logits0, -1))
    aa = AutoAttack(clf, norm="Linf", eps=4 / 255, version="standard")
    t0 = time.perf_counter()
    adv = aa.run_standard_evaluation(x0, y, bs=bs)
    np.asarray(adv)  # force fetch (relay: completion observable at fetch)
    dt = time.perf_counter() - t0
    row = {
        "model": model_name, "attack": "autoattack_standard_linf",
        "batch": bs, "wallclock_s": round(dt, 1),
        "img_per_sec": round(bs / dt, 2),
    }
    print(json.dumps(row))
    return row


def main():
    import os

    all_rows = []
    for m in ("resnet50_official", "vit_b16_224"):
        all_rows += bench(m)
    try:
        all_rows.append(autoattack_wallclock())
    except Exception as e:
        all_rows.append({"attack": "autoattack_standard_linf",
                         "error": f"{type(e).__name__}: {e}"[:200]})
    os.makedirs(osp.join(REPO, "benchmarks"), exist_ok=True)
    with open(osp.join(REPO, "benchmarks", "attacks.json"), "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": all_rows}, f,
                  indent=1)


if __name__ == "__main__":
    main()
