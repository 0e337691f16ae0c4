"""Chip probe: where does the ViT attack step's time go?

Measures PGD-20 img·steps/s for vit_b16_224 with (a) the default fused
Pallas forward (whose custom VJPs re-forward through the XLA reference)
vs (b) attention_impl='xla' end to end, plus the plain forward rate of
both paths. Decides whether the grad path should bypass the fused
kernels and how much a residual-saving backward can recover.
Megastep rules per CLAUDE.md.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

BATCH = 64
ITERS = 6


def probe(impl: str):
    from robustart_tpu.attacks import gradient
    from robustart_tpu.models import create_classifier

    clf = create_classifier("vit_b16_224", rng=0, input_size=224,
                            dtype=jnp.bfloat16, attention_impl=impl)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.uniform(0, 1, (BATCH, 224, 224, 3)), jnp.float32)
    logits0 = np.asarray(clf.apply_fn(clf.variables, x0, train=False))
    labels = jnp.asarray(np.argmax(logits0, -1))

    # forward-only megastep
    @jax.jit
    def fwd_mega(variables, x_init, iters):
        def body(i, carry):
            acc, x = carry
            logits = clf.apply_fn(variables, x, train=False)
            s = jnp.sum(logits.astype(jnp.float32))
            x = jnp.clip(x + s * 1e-12, 0.0, 1.0)
            return acc + s, x

        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), x_init))[0]

    float(fwd_mega(clf.variables, x0, 1))
    t0 = time.perf_counter()
    float(fwd_mega(clf.variables, x0, 3 * ITERS))
    fwd_rate = BATCH * 3 * ITERS / (time.perf_counter() - t0)

    @jax.jit
    def pgd_mega(variables, x_init, iters):
        def body(i, carry):
            acc, x = carry
            adv = gradient.pgd_linf(clf.apply_fn, variables, x, labels,
                                    jax.random.key(0))
            s = jnp.sum(adv)
            x = jnp.clip(x + (adv - x) * 1e-3, 0.0, 1.0)
            return acc + s, x

        return jax.lax.fori_loop(0, iters, body,
                                 (jnp.float32(0.0), x_init))[0]

    float(pgd_mega(clf.variables, x0, 1))
    t0 = time.perf_counter()
    float(pgd_mega(clf.variables, x0, ITERS))
    pgd_rate = BATCH * ITERS / (time.perf_counter() - t0)
    print(f"impl={impl:6s} fwd {fwd_rate:8,.0f} img/s   "
          f"pgd20 {pgd_rate * 20:7,.1f} img·steps/s "
          f"(= {pgd_rate:6.2f} img/s)", flush=True)


if __name__ == "__main__":
    for impl in sys.argv[1:] or ("pallas", "xla"):
        probe(impl)
