"""CIFAR-scale model zoo.

The reference's CIFAR suite imports ``models.resnet.ResNet18/34/50/101/152``,
``models.vit.vit``, ``models.mobilenet.MobileNetV2``, ``models.mobilenet_v3``
from the (absent) kentaroy47/vision-transformers-cifar10 package (reference
cifar10/code/test_cifar_c.py:42-71, utils.py:3-4; SURVEY.md §0 fact 2).
This module supplies those architectures: CIFAR ResNets (3x3 stem, stride-1,
no max-pool), a compact ViT (patch 4, dim 512, depth 6), CIFAR MobileNetV2,
and MobileNetV3 small/large.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import conv_kernel_init, global_avg_pool
from robustart_tpu.models.resnet import BasicBlock, Bottleneck
from robustart_tpu.models.mobilenet import MobileNetV3, make_divisible
from robustart_tpu.models.mobilenet import InvertedResidualV2, ConvBNAct
from robustart_tpu.models.vit import EncoderBlock

CIFAR_MEAN = (0.4914, 0.4822, 0.4465)
CIFAR_STD = (0.2023, 0.1994, 0.2010)
CIFAR100_MEAN = (0.5070, 0.4865, 0.4409)
CIFAR100_STD = (0.2673, 0.2564, 0.2761)


class CifarResNet(nn.Module):
    """kuangliu/pytorch-cifar ResNet: 3x3 stem, stride 1, no max-pool."""

    block: Any
    stage_sizes: Sequence[int]
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, kernel_init=conv_kernel_init, name="conv1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name="bn1",
        )(x)
        x = nn.relu(x)
        for stage, n in enumerate(self.stage_sizes):
            filters = 64 * (2**stage)
            for i in range(n):
                stride = 2 if (stage > 0 and i == 0) else 1
                needs_ds = i == 0 and (
                    stride != 1 or (stage == 0 and self.block is Bottleneck)
                )
                x = self.block(
                    filters, stride=stride, downsample=needs_ds,
                    dtype=self.dtype, name=f"layer{stage + 1}_{i}",
                )(x, train=train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="fc")(x)


def ResNet18(**kw):
    return CifarResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), **kw)


def ResNet34(**kw):
    return CifarResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), **kw)


def ResNet50(**kw):
    return CifarResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), **kw)


def ResNet101(**kw):
    return CifarResNet(block=Bottleneck, stage_sizes=(3, 4, 23, 3), **kw)


def ResNet152(**kw):
    return CifarResNet(block=Bottleneck, stage_sizes=(3, 8, 36, 3), **kw)


class CifarViT(nn.Module):
    """vision-transformers-cifar10 default ViT: patch 4, dim 512, depth 6."""

    patch_size: int = 4
    embed_dim: int = 512
    depth: int = 6
    num_heads: int = 8
    mlp_ratio: float = 1.0  # mlp_dim 512 in the upstream default
    num_classes: int = 10
    dropout: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        deterministic = not train
        b = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, self.embed_dim), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.embed_dim)).astype(x.dtype), x],
            axis=1,
        )
        pos = self.param(
            "pos_embed", nn.initializers.truncated_normal(0.02),
            (1, x.shape[1], self.embed_dim), jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        for i in range(self.depth):
            x = EncoderBlock(
                self.num_heads, mlp_ratio=self.mlp_ratio, qkv_bias=True,
                dropout=self.dropout, dtype=self.dtype, name=f"block{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(
            x[:, 0].astype(jnp.float32)
        )


def vit(**kw):
    return CifarViT(**kw)


class CifarMobileNetV2(nn.Module):
    """CIFAR MobileNetV2 (stride-1 stem, pytorch-cifar block table)."""

    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        settings = [
            (1, 16, 1, 1), (6, 24, 2, 1), (6, 32, 3, 2), (6, 64, 4, 2),
            (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
        ]
        x = ConvBNAct(32, kernel=3, stride=1, dtype=self.dtype)(x, train)
        for t, c, n, s in settings:
            for i in range(n):
                x = InvertedResidualV2(
                    c, stride=s if i == 0 else 1, expand_ratio=t,
                    dtype=self.dtype,
                )(x, train)
        x = ConvBNAct(1280, kernel=1, dtype=self.dtype)(x, train)
        x = global_avg_pool(x).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="classifier")(x)


def MobileNetV2(**kw):
    return CifarMobileNetV2(**kw)


def mobilenetv3_small(**kw):
    kw.setdefault("num_classes", 10)
    return MobileNetV3(mode="small", **kw)


def mobilenetv3_large(**kw):
    kw.setdefault("num_classes", 10)
    return MobileNetV3(mode="large", **kw)


CIFAR_MODELS = {
    "ResNet18": ResNet18,
    "ResNet34": ResNet34,
    "ResNet50": ResNet50,
    "ResNet101": ResNet101,
    "ResNet152": ResNet152,
    # lowercase aliases for the --net CLI values (reference train.py:34)
    "res18": ResNet18,
    "res34": ResNet34,
    "res50": ResNet50,
    "res101": ResNet101,
    "res152": ResNet152,
    "vit": vit,
    "MobileNetV2": MobileNetV2,
    "mobilenetv2": MobileNetV2,
    "mobilenetv3_small": mobilenetv3_small,
    "mobilenetv3_large": mobilenetv3_large,
}


def get_cifar_model(name: str, **kwargs):
    if name not in CIFAR_MODELS:
        raise KeyError(f"unknown CIFAR model {name!r}: {sorted(CIFAR_MODELS)}")
    return CIFAR_MODELS[name](**kwargs)
