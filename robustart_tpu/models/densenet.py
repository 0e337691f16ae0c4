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
    # 'concat': rebuild the concatenated tensor every layer (torch-style).
    # 'buffer': preallocate each dense block's final channel extent once and
    # dynamic-update-slice each layer's growth_rate channels in place —
    # avoids rewriting the O(layers²·growth) concatenation chain through HBM.
    concat_impl: str = "buffer"

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
            if self.concat_impl == "buffer":
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


def densenet121(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 24, 16), **kw)


def densenet169(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 32, 32), **kw)


def densenet201(**kw):
    kw.pop("bn", None)
    return DenseNet(block_config=(6, 12, 48, 32), **kw)
