"""Train-mode fwd+bwd step rate for ViT-B — quantifies the zero-rate fused
train gate (models/vit.py, VERDICT r2 weak-6: adversarial TRAINING used to
run at einsum speed).

Measures grad-of-loss steps/s (the unit of both PGD adversarial-training
inner steps and optimizer steps) with the fused Pallas path (attention_impl
='pallas', dropout/drop_path all zero → the gate fuses train=True forwards)
vs the einsum path, batch 64 bf16 at 224².

Megastep rules per CLAUDE.md: one jitted lax.fori_loop, loop-carried input
(FGSM-style sign step keeps the body live), weights as jit ARGUMENTS, one
scalar fetched.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = 64
ITERS = 10
WARM = 2


def build(impl: str):
    from robustart_tpu.models import create_classifier

    clf = create_classifier(
        "vit_b16_224", rng=0, input_size=224, dtype=jnp.bfloat16,
        attention_impl=impl, dropout=0.0, attention_dropout=0.0,
        drop_path=0.0,
    )
    labels = jnp.asarray(np.arange(BATCH) % 1000)

    def loss(variables, x01):
        logits, _ = clf.apply_fn(
            variables, x01, train=True, rngs={"dropout": jax.random.key(0)}
        )
        onehot = jax.nn.one_hot(labels, logits.shape[-1])
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    @jax.jit
    def mega(variables, x0, iters):
        def body(i, carry):
            acc, x = carry
            l, g = jax.value_and_grad(loss, argnums=1)(variables, x)
            # FGSM sign step: the next iteration's input depends on this
            # one's gradient — nothing hoists
            x = jnp.clip(x + (1.0 / 255.0) * jnp.sign(g), 0.0, 1.0)
            return acc + l, x

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), x0))[0]

    return clf, mega


def measure(impl: str) -> float:
    clf, mega = build(impl)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (BATCH, 224, 224, 3)), jnp.float32)
    float(mega(clf.variables, x0, WARM))
    t0 = time.perf_counter()
    float(mega(clf.variables, x0, ITERS))
    dt = time.perf_counter() - t0
    return ITERS / dt


def main():
    rows = {}
    for impl in ("xla", "pallas"):
        rows[impl] = round(measure(impl), 2)
    rows["speedup"] = round(rows["pallas"] / rows["xla"], 3)
    print(json.dumps({
        "metric": "vit_b16 train fwd+bwd steps/s (batch 64, bf16)",
        **rows,
    }))


if __name__ == "__main__":
    main()
