"""ShuffleNetV2 x{0.5, 1.0, 1.5, 2.0}.

Parity names: ``shufflenet_v2_x0_5`` … ``shufflenet_v2_x2_0`` (reference
exprs/robust_baseline_exp/shufflenetv2/*/config.yaml). Channel shuffle is a
reshape/transpose — free under XLA fusion on TPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import MaxPool2d, conv_kernel_init, global_avg_pool


def channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


class _ConvBN(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    groups: int = 1
    relu: bool = True
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
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)
        return nn.relu(x) if self.relu else x


class ShuffleUnit(nn.Module):
    features: int
    stride: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        branch_features = self.features // 2
        if self.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            out2 = _ConvBN(branch_features, 1, dtype=self.dtype)(x2, train)
            out2 = _ConvBN(
                branch_features, 3, self.stride, groups=branch_features,
                relu=False, dtype=self.dtype,
            )(out2, train)
            out2 = _ConvBN(branch_features, 1, dtype=self.dtype)(out2, train)
            out = jnp.concatenate([x1, out2], axis=-1)
        else:
            c_in = x.shape[-1]
            out1 = _ConvBN(
                c_in, 3, self.stride, groups=c_in, relu=False, dtype=self.dtype
            )(x, train)
            out1 = _ConvBN(branch_features, 1, dtype=self.dtype)(out1, train)
            out2 = _ConvBN(branch_features, 1, dtype=self.dtype)(x, train)
            out2 = _ConvBN(
                branch_features, 3, self.stride, groups=branch_features,
                relu=False, dtype=self.dtype,
            )(out2, train)
            out2 = _ConvBN(branch_features, 1, dtype=self.dtype)(out2, train)
            out = jnp.concatenate([out1, out2], axis=-1)
        return channel_shuffle(out, 2)


class ShuffleNetV2(nn.Module):
    stage_channels: Sequence[int]  # (c2, c3, c4, c_out)
    stage_repeats: Sequence[int] = (4, 8, 4)
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = _ConvBN(24, 3, 2, dtype=self.dtype)(x, train)
        x = MaxPool2d()(x)
        for stage, (c, n) in enumerate(zip(self.stage_channels[:3], self.stage_repeats)):
            for i in range(n):
                x = ShuffleUnit(
                    c, stride=2 if i == 0 else 1, dtype=self.dtype,
                    name=f"stage{stage + 2}_{i}",
                )(x, train)
        x = _ConvBN(self.stage_channels[3], 1, dtype=self.dtype)(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


_CHANNELS = {
    0.5: (48, 96, 192, 1024),
    1.0: (116, 232, 464, 1024),
    1.5: (176, 352, 704, 1024),
    2.0: (244, 488, 976, 2048),
}


def _shufflenet(scale, **kw):
    kw.pop("bn", None)
    return ShuffleNetV2(stage_channels=_CHANNELS[scale], **kw)


def shufflenet_v2_x0_5(**kw):
    return _shufflenet(0.5, **kw)


def shufflenet_v2_x1_0(**kw):
    return _shufflenet(1.0, **kw)


def shufflenet_v2_x1_5(**kw):
    return _shufflenet(1.5, **kw)


def shufflenet_v2_x2_0(**kw):
    return _shufflenet(2.0, **kw)
