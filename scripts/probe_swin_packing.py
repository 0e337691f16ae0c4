"""Probe: swin window-block attention-core variants at stage0/1 shapes.

V0: repo kernel (paired windows, f32 score matmuls)
V1: paired windows, bf16 score/AV operands (reference rounds q*scale to bf16)
V2: unpaired, packed-heads block-diag K (bf16): one (n, C)x(C, H*n) score
    matmul + one (n, H*n)x(H*n, C) AV matmul per window
"""
import argparse
import functools
import os.path as osp
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from robustart_tpu.ops.pallas_attention import (
    window_block_pallas,
    window_block_reference,
    _ln_f32,
)


def mega_time(fn, x, iters=30, warm=2):
    @jax.jit
    def mega(xx, it):
        def body(i, carry):
            acc, cur = carry
            out = fn(cur)
            return acc + out.sum().astype(jnp.float32), out
        return jax.lax.fori_loop(0, it, body, (jnp.float32(0.0), xx))[0]
    float(mega(x, warm))
    t0 = time.perf_counter()
    float(mega(x, iters))
    return (time.perf_counter() - t0) / iters * 1e3


# ---------------- V1: paired windows, bf16 score operands -----------------
def _kernel_v1(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wp_ref, bp_ref, b_ref, m_ref, o_ref,
               attn_ref, *, scale, with_mask, num_heads, head_dim, n, wpb,
               eps, pair):
    c = num_heads * head_dim
    xw = x_ref[:].reshape(wpb * n, c)
    xn = _ln_f32(xw, lns_ref[0], lnb_ref[0], eps).astype(xw.dtype)

    def branch(w_ref2, b_ref2):
        out = jax.lax.dot_general(
            xn, w_ref2[:].astype(xn.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref2[0].astype(jnp.float32)
        return out.astype(xn.dtype)

    q = branch(wq_ref, bq_ref)
    k = branch(wk_ref, bk_ref)
    v = branch(wv_ref, bv_ref)
    d = head_dim
    n_iter = n * 2 if pair else n
    for w in range(wpb // 2 if pair else wpb):
        rows = slice(w * n_iter, (w + 1) * n_iter)
        # bf16 operands: q*scale rounded back to input dtype (= reference
        # semantics, window_block_reference casts (q*scale) to x.dtype)
        qw = (q[rows].astype(jnp.float32) * scale).astype(q.dtype)
        kw = k[rows]
        vw = v[rows]
        maskw = m_ref[w].astype(jnp.float32) if with_mask else None
        for hh in range(num_heads):
            cols = slice(hh * d, (hh + 1) * d)
            s = jax.lax.dot_general(
                qw[:, cols], kw[:, cols],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = s + b_ref[hh].astype(jnp.float32)
            if with_mask:
                s = s + maskw
            s = s - jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            attn_ref[rows, cols] = jnp.dot(
                p.astype(vw.dtype), vw[:, cols],
                preferred_element_type=jnp.float32,
            ).astype(attn_ref.dtype)
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[:].astype(xw.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    y = y + xw.astype(jnp.float32)
    o_ref[:] = y.reshape(wpb, n, c).astype(o_ref.dtype)


# ---------------- V2: packed heads, block-diag K ---------------------------
def _kernel_v2(x_ref, lns_ref, lnb_ref, wq_ref, bq_ref, wk_ref, bk_ref,
               wv_ref, bv_ref, wp_ref, bp_ref, b_ref, m_ref, o_ref,
               attn_ref, *, scale, with_mask, num_heads, head_dim, n, wpb,
               eps):
    c = num_heads * head_dim
    h = num_heads
    xw = x_ref[:].reshape(wpb * n, c)
    xn = _ln_f32(xw, lns_ref[0], lnb_ref[0], eps).astype(xw.dtype)

    def branch(w_ref2, b_ref2):
        out = jax.lax.dot_general(
            xn, w_ref2[:].astype(xn.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref2[0].astype(jnp.float32)
        return out.astype(xn.dtype)

    q = branch(wq_ref, bq_ref)
    k = branch(wk_ref, bk_ref)
    v = branch(wv_ref, bv_ref)
    d = head_dim
    hp = min(h, 128 // d)       # heads packed per matmul (K fill)
    npk = h // hp
    gk = hp * d                 # K cols per pack
    # block-diag mask (hp*n, gk): row block i pairs with col block i
    rowi = jax.lax.broadcasted_iota(jnp.int32, (hp * n, gk), 0)
    coli = jax.lax.broadcasted_iota(jnp.int32, (hp * n, gk), 1)
    bd = (rowi // n) == (coli // d)
    for w in range(wpb):
        rows = slice(w * n, (w + 1) * n)
        qw = (q[rows].astype(jnp.float32) * scale).astype(q.dtype)
        kw = k[rows]
        vw = v[rows]
        maskw = m_ref[w].astype(jnp.float32) if with_mask else None
        for g in range(npk):
            colsg = slice(g * gk, (g + 1) * gk)
            kt = jnp.concatenate([kw[:, colsg]] * hp, axis=0)  # (hp*n, gk)
            R = jnp.where(bd, kt, jnp.zeros_like(kt))
            s = jax.lax.dot_general(
                qw[:, colsg], R,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (n, hp*n) — head hh of this pack at cols [hh*n,(hh+1)*n)
            # packed bias (n, hp*n) comes pre-laid-out in b_ref[g]
            s = s + b_ref[g].astype(jnp.float32)
            if with_mask:
                s = s + jnp.concatenate([maskw] * hp, axis=1)
            # blockwise softmax per n-column block (static slices)
            parts = []
            for hh in range(hp):
                sb = s[:, hh * n:(hh + 1) * n]
                sb = sb - jnp.max(sb, axis=-1, keepdims=True)
                pb = jnp.exp(sb)
                parts.append(pb / jnp.sum(pb, axis=-1, keepdims=True))
            p = jnp.concatenate(parts, axis=1).astype(vw.dtype)  # (n, hp*n)
            vt = jnp.concatenate([vw[:, colsg]] * hp, axis=0)
            Vbd = jnp.where(bd, vt, jnp.zeros_like(vt))
            attn_ref[rows, colsg] = jax.lax.dot_general(
                p, Vbd,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(attn_ref.dtype)
    y = jax.lax.dot_general(
        attn_ref[:], wp_ref[:].astype(xw.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bp_ref[0].astype(jnp.float32)
    y = y + xw.astype(jnp.float32)
    o_ref[:] = y.reshape(wpb, n, c).astype(o_ref.dtype)


def build_variant(kernel_fn, x, ln_s, ln_b, wq, wk, wv, wp, zb, rel_bias,
                  mask, num_heads, num_windows, wpb, eps=1e-5, pair=None,
                  packed_bias=False):
    bnw, n, c = x.shape
    d = c // num_heads
    scale = 1.0 / np.sqrt(d)
    with_mask = mask is not None
    if pair:
        neg = jnp.full((num_heads, n, n), -1e30, rel_bias.dtype)
        rel_bias = jnp.concatenate([
            jnp.concatenate([rel_bias, neg], axis=2),
            jnp.concatenate([neg, rel_bias], axis=2),
        ], axis=1)
        if with_mask:
            zero = jnp.zeros_like(mask[0::2])
            mask = jnp.concatenate([
                jnp.concatenate([mask[0::2], zero], axis=2),
                jnp.concatenate([zero, mask[1::2]], axis=2),
            ], axis=1)
    if packed_bias:
        # (H, n, n) -> (npk, n, hp*n): pack hp heads side by side in lanes
        hp = min(num_heads, 128 // d)
        npk = num_heads // hp
        rb = rel_bias.reshape(npk, hp, n, n).transpose(0, 2, 1, 3)
        rel_bias = rb.reshape(npk, n, hp * n)

    def row(v):
        return v.reshape(1, -1)

    x_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    const2 = lambda i: (0, 0)  # noqa: E731
    w_spec = pl.BlockSpec((c, c), const2, memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, c), const2, memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(rel_bias.shape, lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    if pair:
        mask_block = (wpb // 2, 2 * n, 2 * n)
    else:
        mask_block = (wpb, n, n)
    mask_map = (lambda i: (i % (num_windows // wpb), 0, 0)) if with_mask \
        else (lambda i: (0, 0, 0))
    in_specs = [x_spec, b_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
                w_spec, b_spec, w_spec, b_spec, bias_spec,
                pl.BlockSpec(mask_block, mask_map, memory_space=pltpu.VMEM)]
    out_spec = pl.BlockSpec((wpb, n, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    kw = dict(scale=scale, with_mask=with_mask, num_heads=num_heads,
              head_dim=d, n=n, wpb=wpb, eps=eps)
    if pair is not None:
        kw["pair"] = pair
    kernel = functools.partial(kernel_fn, **kw)
    grid = (bnw // wpb,)
    f = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((bnw, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((wpb * n, c), x.dtype)],
    )
    margs = [mask if with_mask else jnp.zeros(mask_block, jnp.float32)]

    def run(xx):
        return f(xx, row(ln_s), row(ln_b), wq, row(zb), wk, row(zb), wv,
                 row(zb), wp, row(zb), rel_bias, *margs)

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--stages", default="stage0,stage1")
    args = ap.parse_args()
    b = args.batch
    rng = np.random.default_rng(0)
    bf = jnp.bfloat16

    stages = {"stage0": (64, 49, 128, 4), "stage1": (16, 49, 256, 8),
              "stage2": (4, 49, 512, 16)}
    for label in args.stages.split(","):
        nw, n, c, h = stages[label]
        bnw = b * nw
        x = jax.device_put(
            (rng.standard_normal((bnw, n, c)) * 0.5).astype(np.float32)
        ).astype(bf)
        ln_s = jnp.ones((c,), jnp.float32)
        ln_b = jnp.zeros((c,), jnp.float32)
        mk = lambda *s: jnp.asarray(  # noqa: E731
            rng.standard_normal(s).astype(np.float32) * 0.05, bf)
        wq, wk, wv, wp = mk(c, c), mk(c, c), mk(c, c), mk(c, c)
        zb = jnp.zeros((c,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((h, n, n)).astype(np.float32)
                           * 0.02)
        gflop = 2 * bnw * n * 4 * c * c / 1e9
        wpb = 32

        # V0 repo
        fn0 = functools.partial(
            window_block_pallas, ln_scale=ln_s, ln_bias=ln_b, wq=wq, bq=zb,
            wk=wk, bk=zb, wv=wv, bv=zb, wp=wp, bp=zb, rel_bias=bias,
            mask=None, num_windows=nw, eps=1e-5, wpb=wpb)
        out0 = fn0(x)
        ms = mega_time(lambda xx: fn0(xx), x)
        print(f"{label} V0 repo(paired,f32):   {ms:7.3f} ms "
              f"({gflop/ms:6.1f} TF/s qkv+proj)", flush=True)

        # V1 paired bf16
        f1 = build_variant(_kernel_v1, x, ln_s, ln_b, wq, wk, wv, wp, zb,
                           bias, None, h, nw, wpb, pair=True)
        out1 = f1(x)
        d1 = float(jnp.max(jnp.abs(out1.astype(jnp.float32)
                                   - out0.astype(jnp.float32))))
        ms = mega_time(f1, x)
        print(f"{label} V1 paired bf16:        {ms:7.3f} ms "
              f"({gflop/ms:6.1f} TF/s)  max|d| vs V0 {d1:.4f}", flush=True)

        # V2 packed heads bf16
        f2 = build_variant(_kernel_v2, x, ln_s, ln_b, wq, wk, wv, wp, zb,
                           bias, None, h, nw, wpb, packed_bias=True)
        out2 = f2(x)
        d2 = float(jnp.max(jnp.abs(out2.astype(jnp.float32)
                                   - out0.astype(jnp.float32))))
        ms = mega_time(f2, x)
        print(f"{label} V2 packed-heads bf16:  {ms:7.3f} ms "
              f"({gflop/ms:6.1f} TF/s)  max|d| vs V0 {d2:.4f}", flush=True)

        # reference einsum check value scale
        ref = window_block_reference(
            x, ln_s, ln_b, wq, zb, wk, zb, wv, zb, wp, zb, bias, None,
            num_windows=nw, eps=1e-5)
        dr1 = float(jnp.max(jnp.abs(out1.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        dr0 = float(jnp.max(jnp.abs(out0.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{label} max|d| vs XLA ref: V0 {dr0:.4f}  V1 {dr1:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
