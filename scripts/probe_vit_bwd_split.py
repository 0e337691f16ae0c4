"""Chip probe: split the ViT grad-step cost between the two fused kernels.

probe_vit_grad.py showed PGD-20 at 506.6 img·steps/s vs the 956 fwd+bwd
ceiling (batch 64): the hand-composed backwards (pallas_attention /
pallas_mlp custom VJPs) cost ~4.7x the Pallas forward where an
at-forward-efficiency bwd would cost ~2x. This times fwd-only and
grad megasteps for a 12-deep stack of each kernel ALONE at exact
ViT-B/16 shapes (B=64, N=197, C=768, F=3072, bf16) to find which
backward is off the MXU. Megastep rules per CLAUDE.md.
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

B, N, C, F, H = 64, 197, 768, 3072, 12
DEPTH = 12
ITERS = 8


def _params(seed):
    rng = np.random.default_rng(seed)

    def w(*s):
        return jnp.asarray(rng.standard_normal(s) * 0.02, jnp.float32)

    return w


def time_pair(name, fwd_fn, args, x):
    """Time fwd-only and grad-wrt-x megasteps of fn(params..., x)."""

    @jax.jit
    def fwd_mega(args, x, iters):
        def body(i, carry):
            acc, xx = carry
            out = fwd_fn(args, xx)
            s = jnp.sum(out.astype(jnp.float32))
            xx = xx + (s * 1e-24).astype(xx.dtype)
            return acc + s, xx

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), x))[0]

    @jax.jit
    def grad_mega(args, x, iters):
        def loss(xx):
            return jnp.sum(fwd_fn(args, xx).astype(jnp.float32))

        def body(i, carry):
            acc, xx = carry
            g = jax.grad(loss)(xx)
            s = jnp.sum(g.astype(jnp.float32))
            xx = xx + (g * 1e-6).astype(xx.dtype)
            return acc + s, xx

        return jax.lax.fori_loop(0, iters, body, (jnp.float32(0.0), x))[0]

    for disp, mega in (("fwd ", fwd_mega), ("grad", grad_mega)):
        float(mega(args, x, 1))
        t0 = time.perf_counter()
        float(mega(args, x, ITERS))
        dt = (time.perf_counter() - t0) / ITERS / DEPTH * 1e3
        print(f"{name} {disp}: {dt:7.3f} ms/block-call "
              f"({B / dt * 1e3:8,.0f} img/s-equiv)", flush=True)


def attn_stack():
    from robustart_tpu.ops.pallas_attention import window_block_pallas

    w = _params(0)
    blocks = [
        dict(lns=w(C) + 1, lnb=w(C), wq=w(C, C), bq=w(C), wk=w(C, C),
             bk=w(C), wv=w(C, C), bv=w(C), wp=w(C, C), bp=w(C),
             rb=jnp.zeros((H, N, N), jnp.float32))
        for _ in range(DEPTH)
    ]
    blocks = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.ndim >= 2 else a, blocks)

    def fwd(blocks, x):
        for b in blocks:
            x = window_block_pallas(
                x, b["lns"], b["lnb"], b["wq"], b["bq"], b["wk"], b["bk"],
                b["wv"], b["bv"], b["wp"], b["bp"], b["rb"],
                num_windows=1, eps=1e-6)
        return x

    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, N, C)),
                    jnp.bfloat16)
    time_pair("attn-block", fwd, blocks, x)


def mlp_stack():
    from robustart_tpu.ops.pallas_mlp import mlp_pallas

    w = _params(2)
    blocks = [
        dict(lns=w(C) + 1, lnb=w(C), w1=w(C, F).astype(jnp.bfloat16),
             b1=w(F), w2=w(F, C).astype(jnp.bfloat16), b2=w(C))
        for _ in range(DEPTH)
    ]

    def fwd(blocks, x):
        for b in blocks:
            x = mlp_pallas(x, b["w1"], b["b1"], b["w2"], b["b2"],
                           ln=(b["lns"], b["lnb"]), ln_eps=1e-6,
                           residual_input=True)
        return x

    x = jnp.asarray(np.random.default_rng(3).standard_normal((B, N, C)),
                    jnp.bfloat16)
    time_pair("mlp-block ", fwd, blocks, x)




def interleaved_stack():
    """attn+mlp alternating like the real trunk — tests whether XLA's
    scheduling of the combined bwd loses what the isolated stacks keep."""
    from robustart_tpu.ops.pallas_attention import window_block_pallas
    from robustart_tpu.ops.pallas_mlp import mlp_pallas

    w = _params(4)
    blocks = [
        dict(l1s=w(C) + 1, l1b=w(C), wq=w(C, C), bq=w(C), wk=w(C, C),
             bk=w(C), wv=w(C, C), bv=w(C), wp=w(C, C), bp=w(C),
             rb=jnp.zeros((H, 1, 1), jnp.float32),
             l2s=w(C) + 1, l2b=w(C), w1=w(C, F), b1=w(F), w2=w(F, C),
             b2=w(C))
        for _ in range(DEPTH)
    ]
    blocks = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.ndim >= 2 else a, blocks)

    def fwd(blocks, x):
        for b in blocks:
            x = window_block_pallas(
                x, b["l1s"], b["l1b"], b["wq"], b["bq"], b["wk"], b["bk"],
                b["wv"], b["bv"], b["wp"], b["bp"], b["rb"],
                num_windows=1, eps=1e-6)
            x = mlp_pallas(x, b["w1"], b["b1"], b["w2"], b["b2"],
                           ln=(b["l2s"], b["l2b"]), ln_eps=1e-6,
                           residual_input=True)
        return x

    x = jnp.asarray(np.random.default_rng(5).standard_normal((B, N, C)),
                    jnp.bfloat16)
    time_pair("interleaved", fwd, blocks, x)


def full_model():
    """The production classifier's pure input-grad megastep (no PGD
    extras): isolates model-specific overhead (stem/head/normalize bwd)."""
    from robustart_tpu.models import create_classifier

    clf = create_classifier("vit_b16_224", rng=0, input_size=224,
                            dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (B, 224, 224, 3)),
                    jnp.float32)

    def fwd(variables, xx):
        return clf.apply_fn(variables, xx, train=False)

    time_pair("full-model ", fwd, clf.variables, x)


if __name__ == "__main__":
    table = {"attn": attn_stack, "mlp": mlp_stack,
             "inter": interleaved_stack, "model": full_model}
    for which in sys.argv[1:] or ("attn", "mlp", "inter", "model"):
        table[which]()
