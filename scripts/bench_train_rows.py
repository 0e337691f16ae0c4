"""Train-step throughput rows: fwd+bwd+update on the real chip.

VERDICT r3 task 7: RESULTS.md had only the r2 resnet50 train number.
Measures the per-batch optimizer-step rate (the unit the reference's
``pgd_adv_train``/``new_adv_train`` benchmark axes bill by — reference
exprs/nips_benchmark/pgd_adv_train/resnet50/run.sh:2) for:

- resnet50_official bf16, CE + SGD-momentum (the reference SGD recipe)
- vit_b16_224 bf16 fused-block path, CE + AdamW (the new_adv_train recipe)
- resnet50_official PGD-3 adversarial training (eps 4/255, the
  solvers/adv_cls_solver_train_pgd.py default): 3 sign-grad inner steps
  w.r.t. x THEN the parameter update, all inside one jitted program —
  mirrors ClsSolver's adv_train step structure exactly.

Megastep rules per CLAUDE.md: one jitted lax.fori_loop; the carry threads
params/opt_state (genuinely loop-carried — nothing hoists); ONE scalar
fetched. Weights ride as jit arguments.

Usage: python scripts/bench_train_rows.py [--iters N]
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
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

# fwd GFLOPs per image at 224^2 (standard published counts); train step
# ~= 3x fwd (bwd is ~2x fwd), PGD-k adds k (fwd + input-bwd) ~= k*2x fwd
FWD_GFLOPS = {"resnet50_official": 4.1, "vit_b16_224": 17.6}
PEAK_BF16_TFLOPS = 197.0  # v5e MXU peak


def make_classifier(name):
    from robustart_tpu.models import create_classifier

    kwargs = {}
    if name.startswith("vit"):
        kwargs.update(attention_impl="pallas", dropout=0.0,
                      attention_dropout=0.0, drop_path=0.0)
    return create_classifier(name, rng=0, input_size=224,
                             dtype=jnp.bfloat16, **kwargs)


def measure(name, batch, opt, adv_steps=0, iters=10, warm=2):
    clf = make_classifier(name)
    labels = jnp.asarray(np.arange(batch) % 1000)
    tx = (optax.sgd(0.1, momentum=0.9, nesterov=True) if opt == "sgd"
          else optax.adamw(1e-3, weight_decay=0.05))

    def loss_fn(variables, x01):
        out = clf.apply_fn(variables, x01, train=True,
                           rngs={"dropout": jax.random.key(0)})
        logits = out[0] if isinstance(out, tuple) else out
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    eps = 4.0 / 255.0

    @jax.jit
    def mega(variables, opt_state, x0, iters):
        def body(i, carry):
            acc, variables, opt_state = carry
            x = x0 + (acc * 1e-24).astype(x0.dtype)  # defeat hoisting
            if adv_steps:
                def inner(_, xa):
                    g = jax.grad(loss_fn, argnums=1)(variables, xa)
                    xa = xa + (eps / adv_steps) * jnp.sign(g)
                    xa = jnp.clip(jnp.clip(xa, x - eps, x + eps), 0.0, 1.0)
                    return xa
                x = jax.lax.fori_loop(0, adv_steps, inner, x)
            l, grads = jax.value_and_grad(loss_fn)(variables, x)
            updates, opt_state = tx.update(
                grads["params"] if "params" in grads else grads,
                opt_state,
                variables["params"],
            )
            params = optax.apply_updates(variables["params"], updates)
            variables = {**variables, "params": params}
            return acc + l, variables, opt_state

        out = jax.lax.fori_loop(
            0, iters, body, (jnp.float32(0.0), variables, opt_state)
        )
        return out[0]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (batch, 224, 224, 3)), jnp.float32)
    opt_state = tx.init(clf.variables["params"])
    t0 = time.perf_counter()
    float(mega(clf.variables, opt_state, x0, warm))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(mega(clf.variables, opt_state, x0, iters))
    dt = time.perf_counter() - t0
    rate = batch * iters / dt
    step_flops = FWD_GFLOPS[name] * (3.0 + 2.0 * adv_steps) * 1e9
    mfu = rate * step_flops / (PEAK_BF16_TFLOPS * 1e12)
    return {
        "model": name, "batch": batch, "opt": opt,
        "adv_steps": adv_steps, "img_per_sec": round(rate, 1),
        "mfu_est": round(mfu, 3), "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    rows = []
    for name, batch, opt, adv in (
        ("resnet50_official", 256, "sgd", 0),
        ("vit_b16_224", 128, "adamw", 0),
        ("resnet50_official", 128, "sgd", 3),
    ):
        try:
            row = measure(name, batch, opt, adv_steps=adv,
                          iters=args.iters)
        except Exception as e:
            row = {"model": name, "adv_steps": adv,
                   "error": f"{type(e).__name__}: {e}"[:200]}
        rows.append(row)
        print(json.dumps(row), flush=True)
    out = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "benchmarks", "train_steps.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
