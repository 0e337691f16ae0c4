"""DenseNet 121/169/201.

Parity names: ``densenet{121,169,201}`` (reference
exprs/robust_baseline_exp/densenet/*/config.yaml). BN-ReLU-Conv bottleneck
ordering per the torchvision implementation (for checkpoint parity).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import MaxPool2d, conv_kernel_init, global_avg_pool


class _BNReLUConv(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        x = nn.relu(x)
        pad = (self.kernel - 1) // 2
        return nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype, kernel_init=conv_kernel_init,
        )(x)


class DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """Returns only the ``growth_rate`` NEW channels; the caller decides
        how to accumulate them (concat vs in-place buffer write)."""
        out = _BNReLUConv(self.bn_size * self.growth_rate, 1, dtype=self.dtype)(x, train)
        return _BNReLUConv(self.growth_rate, 3, dtype=self.dtype)(out, train)


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    num_classes: int = 1000
    dtype: Any = jnp.float32
    # 'pallas' (BURIED — do not use on hardware): the whole-block VMEM
    # kernel (ops/pallas_densenet.py) wedged the TPU worker process on both
    # chip attempts (r3 + r4, ~30 min outage each). It remains
    # interpret-mode-correct and opt-in for study, but classifier.py refuses
    # to dispatch it on a real TPU unless ROBUSTART_DENSENET_PALLAS_UNSAFE=1.
    # 'auto' equals 'xla' (the flax module forward).
    block_impl: str = "auto"
    # 'concat': rebuild the concatenated tensor every layer (torch-style).
    # 'buffer': preallocate each dense block's final channel extent once and
    # dynamic-update-slice each layer's growth_rate channels in place —
    # avoids rewriting the O(layers²·growth) concatenation chain through HBM.
    # 'auto' (measured, batch 256 bf16 on chip — WORKLOG r3 + r5 sweep):
    # the DUS write path degrades on large spatial maps while 'concat'
    # degrades on small ones; 'auto' mixes them and is the measured best
    # end to end (r5, scripts/probe_densenet_model.py: auto 6,754 img/s vs
    # buffer 6,342, concat 6,124). The concat-FREE formulations (slab /
    # bundle / fori_pad; r5 block-2 probe) and the whole-block VMEM kernel
    # (buried, see block_impl) all measured slower — see WORKLOG r5.
    concat_impl: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.num_init_features, (7, 7), strides=(2, 2),
            padding=[(3, 3), (3, 3)], use_bias=False, dtype=self.dtype,
            kernel_init=conv_kernel_init, name="conv0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm0",
        )(x)
        x = nn.relu(x)
        x = MaxPool2d()(x)
        g = self.growth_rate
        for bi, n_layers in enumerate(self.block_config):
            impl = self.concat_impl
            if impl == "auto":
                # measured per-block deltas (densenet121, batch 256 bf16,
                # truncated-prefix attribution on chip, WORKLOG r3):
                # 56²: concat 9.26 ms ≈ buffer 9.36; 28²: concat 14.78 <
                # buffer 17.69; 14²: buffer 8.45 < concat 12.57; 7²: equal.
                # The DUS write path degrades on large spatial maps, the
                # concat rebuild on small ones.
                impl = "concat" if x.shape[1] * x.shape[2] >= 24 * 24 else "buffer"
            if impl == "buffer":
                c0 = x.shape[-1]
                buf = jnp.zeros(
                    x.shape[:-1] + (c0 + n_layers * g,), x.dtype
                )
                buf = buf.at[..., :c0].set(x)
                for li in range(n_layers):
                    c = c0 + li * g
                    out = DenseLayer(
                        g, dtype=self.dtype,
                        name=f"denseblock{bi + 1}_layer{li + 1}",
                    )(buf[..., :c], train)
                    buf = buf.at[..., c:c + g].set(out)
                x = buf
            else:
                for li in range(n_layers):
                    out = DenseLayer(
                        g, dtype=self.dtype,
                        name=f"denseblock{bi + 1}_layer{li + 1}",
                    )(x, train)
                    x = jnp.concatenate([x, out], axis=-1)
            if bi != len(self.block_config) - 1:
                x = _BNReLUConv(
                    x.shape[-1] // 2, 1, dtype=self.dtype,
                    name=f"transition{bi + 1}",
                )(x, train)
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="norm5",
        )(x)
        x = nn.relu(x)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


def _fold_bn(p, s, eps=1e-5):
    """Eval-mode BN → affine (exact; running stats)."""
    inv = p["scale"] / jnp.sqrt(s["var"] + eps)
    return inv, p["bias"] - s["mean"] * inv


def _tree_sum(terms):
    """Balanced pairwise sum — keeps XLA add chains shallow (the TPU
    compile helper chokes on ~200-term LINEAR add chains; blocks here
    have ≤25 terms but tree-summing is free insurance)."""
    terms = list(terms)
    while len(terms) > 1:
        nxt = [terms[i] + terms[i + 1] for i in range(0, len(terms) - 1, 2)]
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def slab_eval_forward(module: DenseNet, variables, x):
    """Concat-free DenseNet eval forward (exact reassociation of the module
    graph; eval-mode BN folded to per-channel affines).

    The round-3 chip study (WORKLOG) proved DenseNet's XLA cost is the
    concat *writes*: rebuilding the growing concatenation through HBM costs
    block-2 14.4 ms (concat chain) / 17.0 ms (DUS buffer) against a 5.0 ms
    fixed-reads floor. This formulation never materializes the concat:

    - each layer's 3×3-conv output stays its own ``(B,H,W,growth)`` slab;
    - every 1×1-conv-over-concat splits exactly into per-slab matmuls,
      ``concat(x_i) @ W == Σ x_i @ W_i`` (BN is per-channel, so its eval
      affine and the following ReLU split identically along the slabs);
    - transition layers additionally commute the (linear) 2×2 avg-pool
      *inside* the per-slab sum: ``pool(Σ relu(aff(x_i)) @ W_i) ==
      Σ pool(relu(aff(x_i))) @ W_i`` — quartering the transition matmul
      traffic;
    - the final norm5→ReLU→global-pool runs per slab, concatenating only
      the pooled ``(B, c)`` features.

    Per layer the only HBM writes are the bottleneck mid tensor and the new
    growth-rate slab — the fixed floor. Numeric parity vs ``module.apply``
    is asserted by tests/test_models.py (float reassociation only).

    Reference behavior: torchvision densenet forward semantics
    (reference exprs/robust_baseline_exp/densenet/densenet121/config.yaml).
    """
    p, st = variables["params"], variables["batch_stats"]
    dt = module.dtype
    g = module.growth_rate
    mid = 4 * g

    x = jax.lax.conv_general_dilated(
        x.astype(dt), p["conv0"]["kernel"].astype(dt), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a, b = _fold_bn(p["norm0"], st["norm0"])
    x = jax.nn.relu(x * a.astype(dt) + b.astype(dt))
    x = jax.lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max, (1, 3, 3, 1),
        (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )

    def slab_matmul_sum(slabs, offsets, bn_p, bn_s, w):
        """relu(BN(concat(slabs))) @ w without the concat. ``w`` is the
        full (c_total, out) matrix; per-slab row blocks are static slices."""
        a, b = _fold_bn(bn_p, bn_s)
        a, b = a.astype(dt), b.astype(dt)
        terms = []
        for s, off in zip(slabs, offsets):
            c = s.shape[-1]
            y = jax.nn.relu(s * a[off:off + c] + b[off:off + c])
            terms.append(jnp.einsum("bhwc,cm->bhwm", y, w[off:off + c]))
        return _tree_sum(terms)

    for bi, n_layers in enumerate(module.block_config):
        slabs = [x]
        offsets = [0]
        c0 = x.shape[-1]
        for li in range(n_layers):
            lp = p[f"denseblock{bi + 1}_layer{li + 1}"]
            ls = st[f"denseblock{bi + 1}_layer{li + 1}"]
            c = c0 + li * g
            h = slab_matmul_sum(
                slabs, offsets,
                lp["_BNReLUConv_0"]["BatchNorm_0"],
                ls["_BNReLUConv_0"]["BatchNorm_0"],
                lp["_BNReLUConv_0"]["Conv_0"]["kernel"].reshape(c, mid)
                .astype(dt),
            )
            a2, b2 = _fold_bn(lp["_BNReLUConv_1"]["BatchNorm_0"],
                              ls["_BNReLUConv_1"]["BatchNorm_0"])
            h = jax.nn.relu(h * a2.astype(dt) + b2.astype(dt))
            new = jax.lax.conv_general_dilated(
                h, lp["_BNReLUConv_1"]["Conv_0"]["kernel"].astype(dt),
                (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            slabs.append(new)
            offsets.append(c)
        c_total = c0 + n_layers * g
        if bi != len(module.block_config) - 1:
            tn = f"transition{bi + 1}"
            a, b = _fold_bn(p[tn]["BatchNorm_0"], st[tn]["BatchNorm_0"])
            a, b = a.astype(dt), b.astype(dt)
            wt = (p[tn]["Conv_0"]["kernel"]
                  .reshape(c_total, c_total // 2).astype(dt))
            terms = []
            for s, off in zip(slabs, offsets):
                c = s.shape[-1]
                y = jax.nn.relu(s * a[off:off + c] + b[off:off + c])
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
                terms.append(jnp.einsum("bhwc,cm->bhwm", y, wt[off:off + c]))
            x = _tree_sum(terms)
        else:
            a, b = _fold_bn(p["norm5"], st["norm5"])
            a, b = a.astype(dt), b.astype(dt)
            pooled = []
            for s, off in zip(slabs, offsets):
                c = s.shape[-1]
                y = jax.nn.relu(s * a[off:off + c] + b[off:off + c])
                pooled.append(global_avg_pool(y).astype(jnp.float32))
            x = jnp.concatenate(pooled, axis=-1)
    return (
        x @ p["classifier"]["kernel"].astype(jnp.float32)
        + p["classifier"]["bias"].astype(jnp.float32)
    )


def fused_eval_forward(module: DenseNet, variables, x, *,
                       interpret: bool = False):
    """Mirror of ``DenseNet.__call__`` (train=False) reading the variables
    tree directly, with every dense block running as ONE Pallas program
    (ops/pallas_densenet.py::dense_block_pallas). Bitwise-equal weights —
    the same pattern as the int8 quantizers' calibration graphs; parity is
    asserted by tests/test_pallas_densenet.py.
    """
    from robustart_tpu.ops.pallas_densenet import dense_block_pallas

    p, st = variables["params"], variables["batch_stats"]
    dt = module.dtype
    mid = 4 * module.growth_rate
    x = jax.lax.conv_general_dilated(
        x.astype(dt), p["conv0"]["kernel"].astype(dt), (2, 2),
        [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    a, b = _fold_bn(p["norm0"], st["norm0"])
    x = jax.nn.relu(x * a.astype(dt) + b.astype(dt))
    x = jax.lax.reduce_window(
        x, jnp.asarray(-jnp.inf, x.dtype), jax.lax.max, (1, 3, 3, 1),
        (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    g = module.growth_rate
    for bi, n_layers in enumerate(module.block_config):
        c0 = x.shape[-1]
        g1s, b1s, w1s, g2s, b2s, w2s = [], [], [], [], [], []
        for li in range(n_layers):
            c = c0 + li * g
            lp = p[f"denseblock{bi + 1}_layer{li + 1}"]
            ls = st[f"denseblock{bi + 1}_layer{li + 1}"]
            a1, bb1 = _fold_bn(lp["_BNReLUConv_0"]["BatchNorm_0"],
                               ls["_BNReLUConv_0"]["BatchNorm_0"])
            g1s.append(a1)
            b1s.append(bb1)
            w1s.append(
                lp["_BNReLUConv_0"]["Conv_0"]["kernel"].reshape(c, mid)
            )
            a2, bb2 = _fold_bn(lp["_BNReLUConv_1"]["BatchNorm_0"],
                               ls["_BNReLUConv_1"]["BatchNorm_0"])
            g2s.append(a2)
            b2s.append(bb2)
            w2s.append(
                lp["_BNReLUConv_1"]["Conv_0"]["kernel"].reshape(9 * mid, g)
            )
        x = dense_block_pallas(
            x,
            jnp.concatenate(g1s).reshape(1, -1).astype(jnp.float32),
            jnp.concatenate(b1s).reshape(1, -1).astype(jnp.float32),
            jnp.concatenate(w1s).astype(dt),
            jnp.stack(g2s).astype(jnp.float32),
            jnp.stack(b2s).astype(jnp.float32),
            jnp.concatenate(w2s).astype(dt),
            c0=c0, growth=g, n_layers=n_layers, mid=mid,
            interpret=interpret,
        )
        if bi != len(module.block_config) - 1:
            tn = f"transition{bi + 1}"
            a, b = _fold_bn(p[tn]["BatchNorm_0"], st[tn]["BatchNorm_0"])
            y = jax.nn.relu(x * a.astype(dt) + b.astype(dt))
            y = jax.lax.conv_general_dilated(
                y, p[tn]["Conv_0"]["kernel"].astype(dt), (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = nn.avg_pool(y, (2, 2), strides=(2, 2))
    a, b = _fold_bn(p["norm5"], st["norm5"])
    x = jax.nn.relu(x * a.astype(dt) + b.astype(dt))
    x = global_avg_pool(x).astype(jnp.float32)
    return (
        x @ p["classifier"]["kernel"].astype(jnp.float32)
        + p["classifier"]["bias"].astype(jnp.float32)
    )


def densenet121(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 24, 16), **kw)


def densenet169(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 32, 32), **kw)


def densenet201(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 48, 32), **kw)
