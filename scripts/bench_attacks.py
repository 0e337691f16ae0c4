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
    # reference adversarial-benchmark grid: pgd_l2 @ {0.5,2,8} and
    # pgd_l1 @ {100,400,1600} (reference exprs/nips_benchmark/
    # batch_eval_adv/eval.sh:9-13); l1 eps_step scales with eps like the
    # reference default ratio 120/1600 (add_noise_utils.py:9-18)
    "pgd_l2_20_eps0.5": ("pgd_l2", 20, {"eps": 0.5}),
    "pgd_l2_20_eps2": ("pgd_l2", 20, {"eps": 2.0}),
    "pgd_l2_20_eps8": ("pgd_l2", 20, {"eps": 8.0}),
    "pgd_l1_20_eps100": ("pgd_l1", 20, {"eps": 100.0, "eps_step": 7.5}),
    "pgd_l1_20_eps400": ("pgd_l1", 20, {"eps": 400.0, "eps_step": 30.0}),
    "pgd_l1_20_eps1600": ("pgd_l1", 20, {"eps": 1600.0, "eps_step": 120.0}),
}


def bench(model_name: str, attacks: dict | None = None) -> list[dict]:
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
    for disp, (fn_name, steps, kw) in (attacks or ATTACKS).items():
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
                         bs: int = 250, version: str = "standard",
                         norm: str = "Linf") -> dict:
    """One standard-cascade AutoAttack wall-clock at the reference's eval
    batch size (reference autoattack run_standard_evaluation bs=250) —
    full budget: apgd-ce / apgd-t / fab-t / square, n_iter=100, 5000
    square queries. Host orchestration + dispatch latency included: this
    is the number a user's robust-accuracy eval actually pays. L1 runs the
    reference's L1 `standard` settings (largereps schedule, 5 APGD
    restarts, 5 target classes; autoattack.py:258-262) at eps=1600 — the
    repo's pgd_l1 grid scale (reference eval.sh:13)."""
    from robustart_tpu.attacks.autoattack.core import AutoAttack
    from robustart_tpu.models import create_classifier

    clf = create_classifier(model_name, rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (bs, 224, 224, 3)), jnp.float32)
    logits0 = np.asarray(clf.apply_fn(clf.variables, x0, train=False))
    y = jnp.asarray(np.argmax(logits0, -1))
    eps = {"Linf": 4 / 255, "L2": 2.0, "L1": 1600.0}[norm]
    aa = AutoAttack(clf, norm=norm, eps=eps, version=version)
    t0 = time.perf_counter()
    adv = aa.run_standard_evaluation(x0, y, bs=bs)
    np.asarray(adv)  # force fetch (relay: completion observable at fetch)
    dt = time.perf_counter() - t0
    row = {
        "model": model_name,
        "attack": f"autoattack_{version}_{norm.lower()}",
        "batch": bs, "wallclock_s": round(dt, 1),
        "img_per_sec": round(bs / dt, 2),
    }
    print(json.dumps(row))
    return row


def clip_pgd_row(batch: int = 32) -> dict:
    """Robust-CLIP eval axis (reference FARE2/TeCoA2 configs, exprs/exp/
    imagenet-a_o-loop): PGD-20 through clip_vit_l_14's fused-block tower."""
    from robustart_tpu.attacks import gradient
    from robustart_tpu.models import create_classifier

    clf = create_classifier("clip_vit_l_14", rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)
    logits0 = np.asarray(clf.apply_fn(clf.variables, x0, train=False))
    labels = jnp.asarray(np.argmax(logits0, -1))

    @jax.jit
    def mega(variables, x_init, iters):
        def body(i, carry):
            acc, x = carry
            adv = gradient.pgd_linf(clf.apply_fn, variables, x, labels,
                                    jax.random.key(0))
            s = jnp.sum(adv)
            return acc + s, jnp.clip(x + (adv - x) * 1e-3, 0.0, 1.0)

        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), x_init))[0]

    float(mega(clf.variables, x0, WARM))
    t0 = time.perf_counter()
    float(mega(clf.variables, x0, ITERS))
    dt = time.perf_counter() - t0
    img_s = batch * ITERS / dt
    row = {"model": "clip_vit_l_14", "attack": "pgd_linf_20",
           "batch": batch, "img_per_sec": round(img_s, 1),
           "img_steps_per_sec": round(img_s * 20, 1)}
    print(json.dumps(row))
    return row


def main(argv=None):
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="",
                    help="comma list: grid, aa_standard, aa_rand, aa_l1, "
                         "clip; empty = all. Partial runs merge into "
                         "attacks.json")
    ap.add_argument("--models", default="resnet50_official,vit_b16_224")
    ap.add_argument("--attacks", default=",".join(ATTACKS),
                    help="grid attack subset")
    args = ap.parse_args(argv)
    only = set(args.only.split(",")) if args.only else {
        "grid", "aa_standard", "aa_rand", "aa_l1", "clip"}

    sel = {k: v for k, v in ATTACKS.items()
           if k in set(args.attacks.split(","))}
    all_rows = []
    if "grid" in only:
        for m in args.models.split(","):
            all_rows += bench(m, sel)
    for tag, version, norm in (("aa_standard", "standard", "Linf"),
                               ("aa_rand", "rand", "Linf"),
                               ("aa_l1", "standard", "L1")):
        if tag in only:
            try:
                all_rows.append(
                    autoattack_wallclock(version=version, norm=norm))
            except Exception as e:
                all_rows.append(
                    {"attack": f"autoattack_{version}_{norm.lower()}",
                     "error": f"{type(e).__name__}: {e}"[:200]})
    if "clip" in only:
        try:
            all_rows.append(clip_pgd_row())
        except Exception as e:
            all_rows.append({"model": "clip_vit_l_14",
                             "attack": "pgd_linf_20",
                             "error": f"{type(e).__name__}: {e}"[:200]})

    os.makedirs(osp.join(REPO, "benchmarks"), exist_ok=True)
    path = osp.join(REPO, "benchmarks", "attacks.json")
    merged: dict[tuple, dict] = {}
    if osp.exists(path):
        try:
            with open(path) as f:
                for r in json.load(f).get("rows", []):
                    merged[(r.get("model"), r.get("attack"))] = r
        except (json.JSONDecodeError, KeyError):
            pass
    for r in all_rows:
        merged[(r.get("model"), r.get("attack"))] = r
    with open(path, "w") as f:
        json.dump({"device": str(jax.devices()[0]),
                   "rows": list(merged.values())}, f, indent=1)


if __name__ == "__main__":
    main()
