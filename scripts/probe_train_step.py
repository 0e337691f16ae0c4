"""Train-step two-point attribution probes (VERDICT r4 task 2).

resnet50 train measured 2,499 img/s vs a ~3,745 flops-scaled ceiling;
vit_b16 774 vs ~1,124. This script isolates where the extra time goes by
measuring megastep variants that each remove ONE cost component:

- full        : the published row (CE + optimizer + train-mode BN)
- b512        : same at batch 512 (fixed-cost amortization / BN reduction
                efficiency)
- evalbn      : loss_fn with train=False — BN uses running stats (no batch
                moments, no stat updates); grads differ, cost is the point
- nosgd       : no optimizer update (grads summed into the carry) — isolates
                tx.update + apply_updates bandwidth
- sumloss     : sum() loss instead of CE (isolates log_softmax/one_hot; the
                constant cotangent also lets XLA fold parts of the bwd —
                interpret with care, same caveat as WORKLOG r4 stem probe)
- fwdtrain    : train-mode forward only (no grad) — the train-vs-eval
                forward gap (batch-moment compute)
- fwddx       : eval-mode fwd + grad w.r.t. x only (the attack step shape)
- fwddx_train : train-mode fwd + grad w.r.t. x only

Megastep rules per CLAUDE.md (one fori_loop, carry-threaded, one scalar).
Usage: python scripts/probe_train_step.py --model resnet50_official
         [--variants full,b512,...] [--batch 256]
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


def make_classifier(name, s2d=False):
    from robustart_tpu.models import create_classifier

    kwargs = {}
    if s2d:
        kwargs["stem_s2d"] = True
    if name.startswith("vit"):
        kwargs.update(attention_impl="pallas", dropout=0.0,
                      attention_dropout=0.0, drop_path=0.0)
    return create_classifier(name, rng=0, input_size=224,
                             dtype=jnp.bfloat16, **kwargs)


def measure(name, batch, variant, opt, iters=10, warm=2, s2d=False):
    clf = make_classifier(name, s2d=s2d)
    labels = jnp.asarray(np.arange(batch) % 1000)
    tx = (optax.sgd(0.1, momentum=0.9, nesterov=True) if opt == "sgd"
          else optax.adamw(1e-3, weight_decay=0.05))

    train_mode = variant not in ("evalbn", "fwddx")

    def loss_fn(variables, x01):
        out = clf.apply_fn(variables, x01, train=train_mode,
                           rngs={"dropout": jax.random.key(0)})
        logits = out[0] if isinstance(out, tuple) else out
        if variant == "sumloss":
            return logits.sum() * 1e-6
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    @jax.jit
    def mega(variables, opt_state, x0, iters):
        def body(i, carry):
            acc, variables, opt_state = carry
            x = x0 + (acc * 1e-24).astype(x0.dtype)
            if variant == "fwdtrain":
                l = loss_fn(variables, x)
                return acc + l, variables, opt_state
            if variant in ("fwddx", "fwddx_train"):
                g = jax.grad(loss_fn, argnums=1)(variables, x)
                return acc + g.sum(), variables, opt_state
            l, grads = jax.value_and_grad(loss_fn)(variables, x)
            gp = grads["params"] if "params" in grads else grads
            if variant == "nosgd":
                acc = acc + sum(
                    jnp.sum(g).astype(jnp.float32)
                    for g in jax.tree.leaves(gp)
                ) * 1e-24
                return acc + l, variables, opt_state
            updates, opt_state = tx.update(gp, opt_state,
                                           variables["params"])
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
    return {
        "model": name, "variant": variant, "batch": batch,
        "img_per_sec": round(batch * iters / dt, 1),
        "ms_per_step": round(dt / iters * 1e3, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet50_official")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--variants",
                    default="full,b512,evalbn,nosgd,fwdtrain,fwddx,"
                            "fwddx_train")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--s2d", action="store_true",
                    help="ResNet stem_s2d=True (symmetric-pad s2d stem)")
    args = ap.parse_args()
    opt = "adamw" if args.model.startswith("vit") else "sgd"
    for variant in args.variants.split(","):
        batch = args.batch
        v = variant.strip()
        if v.startswith("b") and v[1:].isdigit():
            batch, v = int(v[1:]), "full"
        try:
            row = measure(args.model, batch, v, opt, iters=args.iters,
                          s2d=args.s2d)
            row["variant"] = variant + ("+s2d" if args.s2d else "")
        except Exception as e:
            row = {"model": args.model, "variant": variant,
                   "error": f"{type(e).__name__}: {e}"[:200]}
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
