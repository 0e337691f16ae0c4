"""Pallas TPU kernel: a whole DenseNet dense block in one VMEM program.

DenseNet's defining op is the growing concatenation: layer ``li`` reads all
``c0 + li*g`` accumulated channels and appends ``g`` new ones
(torchvision densenet; reference config
exprs/robust_baseline_exp/densenet/*/config.yaml). Under XLA both
formulations of the accumulation are HBM-catastrophic at batch scale
(measured on chip, batch 256 bf16, WORKLOG r3):

- dynamic-update-slice buffer: the 32-channel writes at non-lane-aligned
  offsets degrade to whole-buffer rewrites (real-shape block2: 17.0 ms
  vs a 5.0 ms fixed-reads floor);
- per-layer ``jnp.concatenate``: rewrites the O(L²·g) chain through HBM
  (14.4 ms).

This kernel keeps the block's FINAL buffer (M, c0+L·g) resident in VMEM
scratch for the whole block: HBM traffic collapses to one read of the
block input + one write of the block output. Per layer (statically
unrolled):

1. ``a1 = relu(buf[:, :c] * g1 + b1)`` — eval-folded BN1 affine
2. ``t = a1 @ W1[c-slice]`` — the 1x1 bottleneck, MXU, f32 accum
3. ``t2 = relu(t * g2 + b2)`` — folded BN2
4. 3x3 conv as 9 tap matmuls against a zero-padded (ipb, H+2, W+2, mid)
   VMEM slab — borders come out of the slab padding, no masks
5. ``buf[:, c:c+g] = acc`` — a 32-lane masked VMEM store (cheap in VMEM;
   the same store is what XLA turns into an HBM buffer rewrite)

Weights arrive packed (all layers concatenated) so the program has a
static shape: ``W1`` as (S, mid) with S = Σ c_li, BN affines as (1, S),
the 3x3 kernels as (L*9*mid, g). Differentiable via custom VJP
(recompute through the XLA reference formulation — exact input and
parameter gradients).

STATUS: BURIED (round 4). Both chip attempts — round 3 and round 4 —
wedged the TPU worker process on this kernel's FIRST dispatch (even an
8x8 jnp.sum hangs afterwards; recovery ~30 min). The kernel never
produced a hardware timing. It stays in-tree interpret-mode-correct
(tests/test_pallas_densenet.py) as a record of the design, but
classifier.py refuses to dispatch it on real TPUs without
ROBUSTART_DENSENET_PALLAS_UNSAFE=1. The densenet121 production path is
the XLA 'buffer' concat (6,329 img/s measured, benchmarks/RESULTS.md);
the WORKLOG "DenseNet whole-block kernel: buried" entry has the full
bottleneck study and the wedge forensics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def dense_block_reference(x, g1, b1, w1, g2, b2, w2, *, c0: int, growth: int,
                          n_layers: int, mid: int):
    """XLA reference (concat formulation) on the packed parameters.

    x: (B, H, W, c0); g1/b1: (1, S); w1: (S, mid); g2/b2: (L, mid);
    w2: (L*9*mid, growth) — tap-major per layer (ky, kx, mid) rows.
    """
    off = 0
    for li in range(n_layers):
        c = c0 + li * growth
        a1 = jax.nn.relu(x * g1[0, off:off + c] + b1[0, off:off + c])
        t = jax.lax.dot_general(
            a1.reshape(-1, c), w1[off:off + c, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t = jax.nn.relu(t * g2[li] + b2[li]).astype(x.dtype)
        t = t.reshape(x.shape[:3] + (mid,))
        k2 = w2[li * 9 * mid:(li + 1) * 9 * mid, :].reshape(3, 3, mid, growth)
        out = jax.lax.conv_general_dilated(
            t, k2.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        x = jnp.concatenate([x, out], axis=-1)
        off += c
    return x


def _block_kernel(x_ref, g1_ref, b1_ref, w1_ref, g2_ref, b2_ref, w2_ref,
                  o_ref, buf_ref, slab_ref, *, c0: int, growth: int,
                  n_layers: int, mid: int, ipb: int, h: int, w: int):
    m = ipb * h * w
    buf_ref[:, :c0] = x_ref[0]
    slab_ref[:] = jnp.zeros_like(slab_ref)
    off = 0
    for li in range(n_layers):
        c = c0 + li * growth
        xin = buf_ref[:, :c]
        a1 = jnp.maximum(
            xin.astype(jnp.float32) * g1_ref[0, off:off + c]
            + b1_ref[0, off:off + c], 0.0
        ).astype(xin.dtype)
        t = jax.lax.dot_general(
            a1, w1_ref[off:off + c, :].astype(a1.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        t2 = jnp.maximum(t * g2_ref[li] + b2_ref[li], 0.0).astype(xin.dtype)
        slab_ref[:, 1:h + 1, 1:w + 1, :] = t2.reshape(ipb, h, w, mid)
        acc = jnp.zeros((m, growth), jnp.float32)
        for k in range(9):
            dy, dx = k // 3, k % 3
            tap = slab_ref[:, dy:dy + h, dx:dx + w, :].reshape(m, mid)
            acc += jax.lax.dot_general(
                tap, w2_ref[(li * 9 + k) * mid:(li * 9 + k + 1) * mid, :]
                .astype(tap.dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        buf_ref[:, c:c + growth] = acc.astype(buf_ref.dtype)
        off += c
    o_ref[0] = buf_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("c0", "growth", "n_layers", "mid", "h", "w",
                     "interpret"),
)
def _block_impl(x, g1, b1, w1, g2, b2, w2, *, c0: int, growth: int,
                n_layers: int, mid: int, h: int, w: int,
                interpret: bool = False):
    b = x.shape[0]
    cf = c0 + n_layers * growth
    # images per program: small maps batch up for MXU row depth
    ipb = 1
    for cand in (8, 4, 2):
        if h * w * cand <= 512 and b % cand == 0:
            ipb = cand
            break
    m = ipb * h * w
    xg = x.reshape(b // ipb, m, c0)
    s = w1.shape[0]
    out = pl.pallas_call(
        functools.partial(
            _block_kernel, c0=c0, growth=growth, n_layers=n_layers, mid=mid,
            ipb=ipb, h=h, w=w,
        ),
        grid=(b // ipb,),
        in_specs=[
            pl.BlockSpec((1, m, c0), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers, mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_layers * 9 * mid, growth), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, cf), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b // ipb, m, cf), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((m, cf), x.dtype),
            pltpu.VMEM((ipb, h + 2, w + 2, mid), x.dtype),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(xg, g1, b1, w1, g2, b2, w2)
    return out.reshape(b, h, w, cf)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _block(x, g1, b1, w1, g2, b2, w2, c0, growth, n_layers, mid, h, w,
           interpret):
    return _block_impl(
        x, g1, b1, w1, g2, b2, w2, c0=c0, growth=growth, n_layers=n_layers,
        mid=mid, h=h, w=w, interpret=interpret,
    )


def _block_fwd(x, g1, b1, w1, g2, b2, w2, c0, growth, n_layers, mid, h, w,
               interpret):
    out = _block_impl(
        x, g1, b1, w1, g2, b2, w2, c0=c0, growth=growth, n_layers=n_layers,
        mid=mid, h=h, w=w, interpret=interpret,
    )
    return out, (x, g1, b1, w1, g2, b2, w2)


def _block_bwd(c0, growth, n_layers, mid, h, w, interpret, residuals, g):
    del interpret
    x, g1, b1, w1, g2, b2, w2 = residuals

    def ref(x, g1, b1, w1, g2, b2, w2):
        return dense_block_reference(
            x, g1, b1, w1, g2, b2, w2, c0=c0, growth=growth,
            n_layers=n_layers, mid=mid,
        )

    _, vjp = jax.vjp(ref, x, g1, b1, w1, g2, b2, w2)
    grads = vjp(g.astype(x.dtype))
    return tuple(
        d.astype(a.dtype) for d, a in zip(grads, residuals)
    )


_block.defvjp(_block_fwd, _block_bwd)


def dense_block_pallas(x, g1, b1, w1, g2, b2, w2, *, c0: int, growth: int,
                       n_layers: int, mid: int = 128,
                       interpret: bool = False):
    """Run a whole dense block with the concat buffer VMEM-resident.

    x: (B, H, W, c0). Packed params as in :func:`dense_block_reference`.
    Returns (B, H, W, c0 + n_layers*growth). Differentiable (custom VJP →
    exact XLA reference gradients).
    """
    b, h, w, _ = x.shape
    return _block(x, g1, b1, w1, g2, b2, w2, c0, growth, n_layers, mid, h, w,
                  interpret)
