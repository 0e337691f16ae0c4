"""ResNet family: resnet18/34/50/101/152, wide_resnet{50_2,101_2},
resnext{50_32x4d,101_32x8d}.

Capability parity with the reference model zoo names ``resnetXX_official``,
``wide_resnet*``, ``resnext*`` (evidence: exprs/robust_baseline_exp/resnet/*/
config.yaml; SURVEY.md §2.9). Re-designed for TPU: NHWC layout, fused
conv+BN+ReLU left to XLA, global-batch BN statistics under jit (= SyncBN).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import (
    MaxPool2d,
    conv_kernel_init,
    global_avg_pool,
)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_kernel_init
        )
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        identity = x
        out = conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                   padding=[(1, 1), (1, 1)])(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.filters, (3, 3), padding=[(1, 1), (1, 1)])(out)
        # zero-init gamma on the last BN of each block (torchvision
        # zero_init_residual is off by default; keep ones for ckpt parity)
        out = bn(name="bn2")(out)
        if self.downsample:
            identity = conv(
                self.filters, (1, 1), strides=(self.stride, self.stride),
                padding="VALID", name="downsample_conv",
            )(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    filters: int  # base width of the block (expansion 4 applied inside)
    stride: int = 1
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        conv = partial(
            nn.Conv, use_bias=False, dtype=self.dtype, kernel_init=conv_kernel_init
        )
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
        )
        width = int(self.filters * (self.base_width / 64.0)) * self.groups
        identity = x
        out = conv(width, (1, 1), padding='VALID')(x)
        out = bn(name="bn1")(out)
        out = nn.relu(out)
        out = conv(
            width,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=self.groups,
        )(out)
        out = bn(name="bn2")(out)
        out = nn.relu(out)
        out = conv(self.filters * self.expansion, (1, 1), padding='VALID')(out)
        out = bn(name="bn3")(out)
        if self.downsample:
            identity = conv(
                self.filters * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                padding="VALID",
                name="downsample_conv",
            )(x)
            identity = bn(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Torch-structured ResNet in NHWC.

    ``stem_s2d`` applies the space-to-depth transform to the 7×7/2 stem (the
    MLPerf TPU trick): a 3-channel 224² conv uses 3/128 of the MXU's input
    lanes; rewriting it as an exactly-equivalent 4×4 conv on a (112, 112, 12)
    space-to-depth input quadruples the stem's MXU utilization. The kernel
    parameter keeps its (7, 7, 3, 64) torch-compatible shape — the zero-pad +
    rearrange happens inside the forward, so checkpoints convert unchanged.

    Default OFF: measured perf-neutral on the current XLA build (chip,
    round 5: train b128 2,493 vs 2,561 img/s, fwddx 4,516 vs 4,460,
    fwdtrain 8,187 vs 8,371) — a pure train step never needs dL/dx through
    the stem, so the stride-1-dgrad argument only touches the attack path,
    where it measures +1.3%. The historical blocker is FIXED: the exact
    (2,1) window pad tripped an XLA TPU fusion-emitter assert
    (`window.pad_low == -1`) in multi-forward programs; the stem now uses
    the symmetric (2,2) form + static slice, verified on chip inside a
    corruption + two-forward + fused-argmax program. Safe to enable
    per-model; kept off because it doesn't pay.
    """

    block: Callable[..., nn.Module]
    stage_sizes: Sequence[int]
    num_classes: int = 1000
    groups: int = 1
    base_width: int = 64
    stem_s2d: bool = False
    dtype: Any = jnp.float32

    def _stem(self, x: jax.Array) -> jax.Array:
        kernel = self.param("conv1_kernel", conv_kernel_init, (7, 7, 3, 64))
        kernel = kernel.astype(self.dtype)
        if not self.stem_s2d or x.shape[1] % 2 or x.shape[2] % 2:
            return jax.lax.conv_general_dilated(
                x.astype(self.dtype), kernel, (2, 2), [(3, 3), (3, 3)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # out[i] = Σ_{k=0..6} w[k]·x[2i+k−3] = Σ_{k=0..7} w'[k]·x[2i+k−4]
        # with w' = [0, w]; split k = 2m+d → 4 block taps, phase-d channels
        b, h, w_, _ = x.shape
        x_s2d = x.reshape(b, h // 2, 2, w_ // 2, 2, 3)
        x_s2d = x_s2d.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w_ // 2, 12)
        k_pad = jnp.pad(kernel, ((1, 0), (1, 0), (0, 0), (0, 0)))  # (8,8,3,64)
        k_s2d = k_pad.reshape(4, 2, 4, 2, 3, 64)
        k_s2d = k_s2d.transpose(0, 2, 1, 3, 4, 5).reshape(4, 4, 12, 64)
        # SYMMETRIC (2, 2) window pad + static slice of the extra row/col
        # instead of the exact (2, 1): the asymmetric window attribute is
        # what trips this XLA TPU build's fusion-emitter assert
        # (`window.pad_low == -1`) in multi-forward programs; out'[i] for
        # i ≤ H/2−1 reads x[i−2 .. i+1] identically, the (2,2) form just
        # appends one extra output position that the slice drops.
        out = jax.lax.conv_general_dilated(
            x_s2d.astype(self.dtype), k_s2d, (1, 1), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out[:, : h // 2, : w_ // 2, :]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = self._stem(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="bn1",
        )(x)
        x = nn.relu(x)
        x = MaxPool2d()(x)
        for stage, num_blocks in enumerate(self.stage_sizes):
            filters = 64 * (2**stage)
            for i in range(num_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_ds = i == 0 and (
                    stride != 1
                    or stage == 0
                    and self.block is Bottleneck  # expansion changes channels
                )
                x = self.block(
                    filters,
                    stride=stride,
                    downsample=needs_ds,
                    groups=self.groups,
                    base_width=self.base_width,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train=train)
        x = global_avg_pool(x).astype(jnp.float32)
        x = nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)
        return x


def _resnet(block, stage_sizes, **kwargs):
    kwargs.pop("bn", None)  # reference bn{use_sync_bn} — global stats already
    return ResNet(block=block, stage_sizes=stage_sizes, **kwargs)


def resnet18(**kw):
    return _resnet(BasicBlock, (2, 2, 2, 2), **kw)


def resnet34(**kw):
    return _resnet(BasicBlock, (3, 4, 6, 3), **kw)


def resnet50(**kw):
    return _resnet(Bottleneck, (3, 4, 6, 3), **kw)


def resnet101(**kw):
    return _resnet(Bottleneck, (3, 4, 23, 3), **kw)


def resnet152(**kw):
    return _resnet(Bottleneck, (3, 8, 36, 3), **kw)


def wide_resnet50_2(**kw):
    return _resnet(Bottleneck, (3, 4, 6, 3), base_width=128, **kw)


def wide_resnet101_2(**kw):
    return _resnet(Bottleneck, (3, 4, 23, 3), base_width=128, **kw)


def resnext50_32x4d(**kw):
    return _resnet(Bottleneck, (3, 4, 6, 3), groups=32, base_width=4, **kw)


def resnext101_32x8d(**kw):
    return _resnet(Bottleneck, (3, 4, 23, 3), groups=32, base_width=8, **kw)
