"""EfficientNet B0–B7 (+ the reference's ``_nodrop`` variants).

Parity names: ``efficientnet_b{0..7}`` and ``efficientnet_b{0..7}_nodrop``
(reference exprs/robust_baseline_exp/efficientnet/*/config.yaml — the
``_nodrop`` variants run with dropout and drop-path disabled at multiple
input sizes). Compound-scaling coefficients per the EfficientNet paper /
timm. SiLU activations, SE ratio 0.25.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import DropPath, conv_kernel_init, global_avg_pool
from robustart_tpu.models.mobilenet import make_divisible


# (width_mult, depth_mult, resolution, dropout)
SCALING = {
    "b0": (1.0, 1.0, 224, 0.2),
    "b1": (1.0, 1.1, 240, 0.2),
    "b2": (1.1, 1.2, 260, 0.3),
    "b3": (1.2, 1.4, 300, 0.3),
    "b4": (1.4, 1.8, 380, 0.4),
    "b5": (1.6, 2.2, 456, 0.4),
    "b6": (1.8, 2.6, 528, 0.5),
    "b7": (2.0, 3.1, 600, 0.5),
}

# base (expand, channels, repeats, stride, kernel)
_BASE_BLOCKS = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


class _ConvBNSiLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups, use_bias=False,
            dtype=self.dtype, kernel_init=conv_kernel_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return nn.silu(x) if self.act else x


class MBConv(nn.Module):
    features: int
    kernel: int
    stride: int
    expand_ratio: int
    se_ratio: float = 0.25
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = inp * self.expand_ratio
        out = x
        if self.expand_ratio != 1:
            out = _ConvBNSiLU(hidden, 1, dtype=self.dtype)(out, train)
        out = _ConvBNSiLU(
            hidden, self.kernel, self.stride, groups=hidden, dtype=self.dtype
        )(out, train)
        # squeeze-excite on the *input* channel count (EfficientNet rule)
        squeeze = max(1, int(inp * self.se_ratio))
        s = jnp.mean(out, axis=(1, 2), keepdims=True)
        s = nn.Conv(squeeze, (1, 1), dtype=self.dtype, name="se_reduce")(s)
        s = nn.silu(s)
        s = nn.Conv(hidden, (1, 1), dtype=self.dtype, name="se_expand")(s)
        out = out * nn.sigmoid(s)
        out = _ConvBNSiLU(self.features, 1, act=False, dtype=self.dtype)(out, train)
        if self.stride == 1 and inp == self.features:
            out = DropPath(self.drop_path)(out, deterministic=not train) + x
        return out


class EfficientNet(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    num_classes: int = 1000
    dropout: float = 0.2
    drop_path: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):
            return make_divisible(ch * self.width_mult)

        def d(n):
            return int(math.ceil(n * self.depth_mult))

        x = _ConvBNSiLU(c(32), 3, 2, dtype=self.dtype)(x, train)
        total_blocks = sum(d(r) for _, _, r, _, _ in _BASE_BLOCKS)
        bi = 0
        for expand, ch, repeats, stride, kernel in _BASE_BLOCKS:
            for i in range(d(repeats)):
                x = MBConv(
                    c(ch), kernel, stride if i == 0 else 1, expand,
                    drop_path=self.drop_path * bi / max(total_blocks - 1, 1),
                    dtype=self.dtype,
                )(x, train)
                bi += 1
        x = _ConvBNSiLU(c(1280), 1, dtype=self.dtype)(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


def _efficientnet(variant: str, nodrop: bool = False, **kw):
    kw.pop("bn", None)
    w, dep, _res, drop = SCALING[variant]
    if nodrop:
        kw.setdefault("dropout", 0.0)
        kw.setdefault("drop_path", 0.0)
    else:
        kw.setdefault("dropout", drop)
    return EfficientNet(width_mult=w, depth_mult=dep, **kw)


def _make(variant):
    def plain(**kw):
        return _efficientnet(variant, **kw)

    def nodrop(**kw):
        return _efficientnet(variant, nodrop=True, **kw)

    return plain, nodrop


EFFICIENTNET_FACTORIES = {}
for _v in SCALING:
    _p, _n = _make(_v)
    EFFICIENTNET_FACTORIES[f"efficientnet_{_v}"] = _p
    EFFICIENTNET_FACTORIES[f"efficientnet_{_v}_nodrop"] = _n
