"""GoogLeNet (Inception v1) — part of the reference's NAS-era eval list
(reference exprs/exp/swin/config.yaml:8). torchvision formulation (BN
variant, no aux heads at eval)."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import MaxPool2d, conv_kernel_init, global_avg_pool


class BasicConv2d(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)], use_bias=False,
            dtype=self.dtype, kernel_init=conv_kernel_init,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


class Inception(nn.Module):
    ch1x1: int
    ch3x3red: int
    ch3x3: int
    ch5x5red: int
    ch5x5: int
    pool_proj: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b1 = BasicConv2d(self.ch1x1, 1, dtype=self.dtype)(x, train)
        b2 = BasicConv2d(self.ch3x3red, 1, dtype=self.dtype)(x, train)
        b2 = BasicConv2d(self.ch3x3, 3, dtype=self.dtype)(b2, train)
        b3 = BasicConv2d(self.ch5x5red, 1, dtype=self.dtype)(x, train)
        b3 = BasicConv2d(self.ch5x5, 3, dtype=self.dtype)(b3, train)
        pool = MaxPool2d(window=3, stride=1, padding=1)(x)
        b4 = BasicConv2d(self.pool_proj, 1, dtype=self.dtype)(pool, train)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNet(nn.Module):
    num_classes: int = 1000
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda f, k, s, name: BasicConv2d(f, k, s, dtype=self.dtype,
                                                 name=name)
        x = conv(64, 7, 2, "conv1")(x, train)
        x = MaxPool2d()(x)
        x = conv(64, 1, 1, "conv2")(x, train)
        x = conv(192, 3, 1, "conv3")(x, train)
        x = MaxPool2d()(x)
        x = Inception(64, 96, 128, 16, 32, 32, self.dtype, name="inception3a")(x, train)
        x = Inception(128, 128, 192, 32, 96, 64, self.dtype, name="inception3b")(x, train)
        x = MaxPool2d()(x)
        x = Inception(192, 96, 208, 16, 48, 64, self.dtype, name="inception4a")(x, train)
        x = Inception(160, 112, 224, 24, 64, 64, self.dtype, name="inception4b")(x, train)
        x = Inception(128, 128, 256, 24, 64, 64, self.dtype, name="inception4c")(x, train)
        x = Inception(112, 144, 288, 32, 64, 64, self.dtype, name="inception4d")(x, train)
        x = Inception(256, 160, 320, 32, 128, 128, self.dtype, name="inception4e")(x, train)
        x = MaxPool2d(window=2, stride=2, padding=0)(x)
        x = Inception(256, 160, 320, 32, 128, 128, self.dtype, name="inception5a")(x, train)
        x = Inception(384, 192, 384, 48, 128, 128, self.dtype, name="inception5b")(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dropout(self.dropout)(x, deterministic=not train)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


def googlenet(**kw):
    kw.pop("bn", None)
    return GoogLeNet(**kw)
