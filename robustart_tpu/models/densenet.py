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
        out = _BNReLUConv(self.bn_size * self.growth_rate, 1, dtype=self.dtype)(x, train)
        out = _BNReLUConv(self.growth_rate, 3, dtype=self.dtype)(out, train)
        return jnp.concatenate([x, out], axis=-1)


class DenseNet(nn.Module):
    block_config: Sequence[int]
    growth_rate: int = 32
    num_init_features: int = 64
    num_classes: int = 1000
    dtype: Any = jnp.float32

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
        for bi, n_layers in enumerate(self.block_config):
            for li in range(n_layers):
                x = DenseLayer(
                    self.growth_rate, dtype=self.dtype,
                    name=f"denseblock{bi + 1}_layer{li + 1}",
                )(x, train)
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


def densenet121(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 24, 16), **kw)


def densenet169(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 32, 32), **kw)


def densenet201(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 48, 32), **kw)
