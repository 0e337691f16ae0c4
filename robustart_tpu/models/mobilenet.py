"""MobileNetV2 / MobileNetV3 (large + small), width-scaled.

Parity names: ``mobilenet_v2`` with kwargs {scale} (reference
exprs/robust_baseline_exp/mobilenet_v2/*/config.yaml: scale ∈
{0.5, 0.75, 1.0, 1.4}) and ``mobilenet_v3`` with kwargs {scale, dropout,
mode} (mobilenet_v3/*/config.yaml: scale ∈ {0.35…1.4}, mode large).
Architectures follow the torchvision formulations (for checkpoint parity).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import (
    conv_kernel_init,
    global_avg_pool,
    hardsigmoid,
    hardswish,
)


def make_divisible(v: float, divisor: int = 8, min_value: int | None = None) -> int:
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class ConvBNAct(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: Any = nn.relu6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, kernel_init=conv_kernel_init,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-3,
            dtype=self.dtype,
        )(x)
        return self.act(x) if self.act is not None else x


class InvertedResidualV2(nn.Module):
    features: int
    stride: int
    expand_ratio: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        out = x
        if self.expand_ratio != 1:
            out = ConvBNAct(hidden, kernel=1, dtype=self.dtype)(out, train)
        out = ConvBNAct(
            hidden, kernel=3, stride=self.stride, groups=hidden, dtype=self.dtype
        )(out, train)
        out = ConvBNAct(self.features, kernel=1, act=None, dtype=self.dtype)(out, train)
        if self.stride == 1 and inp == self.features:
            out = out + x
        return out


class MobileNetV2(nn.Module):
    scale: float = 1.0
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        settings = [
            # t, c, n, s
            (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        input_channel = make_divisible(32 * self.scale)
        last_channel = make_divisible(1280 * max(1.0, self.scale))
        x = ConvBNAct(input_channel, kernel=3, stride=2, dtype=self.dtype)(x, train)
        for t, c, n, s in settings:
            out_c = make_divisible(c * self.scale)
            for i in range(n):
                x = InvertedResidualV2(
                    out_c, stride=s if i == 0 else 1, expand_ratio=t,
                    dtype=self.dtype,
                )(x, train)
        x = ConvBNAct(last_channel, kernel=1, dtype=self.dtype)(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


class SqueezeExcite(nn.Module):
    squeeze_channels: int
    gate: Any = hardsigmoid
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_channels, (1, 1), dtype=self.dtype, name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="fc2")(s)
        return x * self.gate(s)


class InvertedResidualV3(nn.Module):
    kernel: int
    expanded: int
    features: int
    use_se: bool
    use_hs: bool
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        act = hardswish if self.use_hs else nn.relu
        out = x
        if self.expanded != inp:
            out = ConvBNAct(self.expanded, kernel=1, act=act, dtype=self.dtype)(out, train)
        out = ConvBNAct(
            self.expanded, kernel=self.kernel, stride=self.stride,
            groups=self.expanded, act=act, dtype=self.dtype,
        )(out, train)
        if self.use_se:
            out = SqueezeExcite(
                make_divisible(self.expanded // 4), dtype=self.dtype
            )(out)
        out = ConvBNAct(self.features, kernel=1, act=None, dtype=self.dtype)(out, train)
        if self.stride == 1 and inp == self.features:
            out = out + x
        return out


# (kernel, expansion, out, SE, HS, stride) — torchvision mobilenet_v3 tables
_V3_LARGE = [
    (3, 16, 16, False, False, 1),
    (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1),
    (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1),
    (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2),
    (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1),
    (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2),
    (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]
_V3_SMALL = [
    (3, 16, 16, True, False, 2),
    (3, 72, 24, False, False, 2),
    (3, 88, 24, False, False, 1),
    (5, 96, 40, True, True, 2),
    (5, 240, 40, True, True, 1),
    (5, 240, 40, True, True, 1),
    (5, 120, 48, True, True, 1),
    (5, 144, 48, True, True, 1),
    (5, 288, 96, True, True, 2),
    (5, 576, 96, True, True, 1),
    (5, 576, 96, True, True, 1),
]


class MobileNetV3(nn.Module):
    scale: float = 1.0
    mode: str = "large"
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        table = _V3_LARGE if self.mode == "large" else _V3_SMALL
        s = self.scale
        first = make_divisible(16 * s)
        x = ConvBNAct(first, kernel=3, stride=2, act=hardswish, dtype=self.dtype)(x, train)
        for k, exp, out, se, hs, stride in table:
            x = InvertedResidualV3(
                kernel=k,
                expanded=make_divisible(exp * s),
                features=make_divisible(out * s),
                use_se=se, use_hs=hs, stride=stride, dtype=self.dtype,
            )(x, train)
        last_conv = make_divisible((960 if self.mode == "large" else 576) * s)
        head = make_divisible((1280 if self.mode == "large" else 1024) * max(1.0, s))
        x = ConvBNAct(last_conv, kernel=1, act=hardswish, dtype=self.dtype)(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dense(head, dtype=jnp.float32, name="pre_classifier")(x)
        x = hardswish(x)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


def mobilenet_v2(**kw):
    kw.pop("bn", None)
    return MobileNetV2(**kw)


def mobilenet_v3(**kw):
    kw.pop("bn", None)
    return MobileNetV3(**kw)
