"""Shared model building blocks (Flax, NHWC — the TPU-native layout).

Notes on SyncBN: the reference toggles cross-replica batchnorm via
``model.kwargs.bn.use_sync_bn`` (reference
exprs/robust_baseline_exp/resnet/resnet50/config.yaml:5). Under ``jit`` with a
batch-axis-sharded global array, Flax ``nn.BatchNorm`` moments are computed
over the *logical* (global) batch and XLA inserts the cross-device reductions
automatically — i.e. SyncBN is the natural semantics of the sharded
formulation and needs no NCCL-style plumbing (SURVEY.md §2.11). Per-device
(non-sync) statistics would be the special case; we intentionally run global
stats in both settings since eval-mode running stats are what benchmarks use.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

ModuleDef = Any

# ImageNet preprocessing constants shared across the zoo (the reference bakes
# these into attack wrappers and NormalizeModel: reference
# RobustART/noise/utils/adv/attack.py:47, Attacks/autoattack/autoattack.py:16-17).
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
# CLIP towers use their own normalization.
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
# Inception-style normalization used by some timm-style models.
INCEPTION_MEAN = (0.5, 0.5, 0.5)
INCEPTION_STD = (0.5, 0.5, 0.5)


def normalize_01(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    """Normalize NHWC [0,1] images with per-channel mean/std (on device)."""
    mean_arr = jnp.asarray(mean, dtype=x.dtype).reshape(1, 1, 1, -1)
    std_arr = jnp.asarray(std, dtype=x.dtype).reshape(1, 1, 1, -1)
    return (x - mean_arr) / std_arr


def denormalize(x: jax.Array, mean: Sequence[float], std: Sequence[float]) -> jax.Array:
    mean_arr = jnp.asarray(mean, dtype=x.dtype).reshape(1, 1, 1, -1)
    std_arr = jnp.asarray(std, dtype=x.dtype).reshape(1, 1, 1, -1)
    return x * std_arr + mean_arr


class DropPath(nn.Module):
    """Stochastic depth (per-sample residual drop)."""

    rate: float
    deterministic: bool | None = None

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool | None = None) -> jax.Array:
        deterministic = nn.merge_param(
            "deterministic", self.deterministic, deterministic
        )
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def conv_kernel_init(key, shape, dtype=jnp.float32):
    """He (fan-out) normal init, matching torchvision conv defaults."""
    fan_out = shape[0] * shape[1] * shape[3]
    std = jnp.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


class MaxPool2d(nn.Module):
    """3x3/2 max-pool with torch-style padding=1 semantics."""

    window: int = 3
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = [(0, 0), (self.padding, self.padding), (self.padding, self.padding), (0, 0)]
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, self.window, self.window, 1),
            window_strides=(1, self.stride, self.stride, 1),
            padding=pad,
        )


def global_avg_pool(x: jax.Array) -> jax.Array:
    return jnp.mean(x, axis=(1, 2))


def make_norm(
    norm: str = "bn",
    momentum: float = 0.9,
    epsilon: float = 1e-5,
    dtype: Any = jnp.float32,
) -> Callable[..., nn.Module]:
    """Factory for the normalization layer used across CNN families."""
    if norm == "bn":
        def bn(**kwargs):
            return nn.BatchNorm(
                use_running_average=None,
                momentum=momentum,
                epsilon=epsilon,
                dtype=dtype,
                **kwargs,
            )
        return bn
    if norm == "ln":
        def ln(**kwargs):
            return nn.LayerNorm(epsilon=1e-6, dtype=dtype, **kwargs)
        return ln
    raise ValueError(f"unknown norm {norm!r}")


def hardswish(x: jax.Array) -> jax.Array:
    return x * jax.nn.relu6(x + 3.0) / 6.0


def hardsigmoid(x: jax.Array) -> jax.Array:
    return jax.nn.relu6(x + 3.0) / 6.0


class DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s tree (kernel + bias) so a
    module can route the SAME parameters through either a plain jnp.dot
    path or the fused MLP Pallas kernel (ops/pallas_mlp.py) without
    changing the checkpoint structure."""

    in_dim: int
    out_dim: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )
        if not self.use_bias:
            return kernel, None
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s tree (scale + bias) so a
    module can route the SAME parameters through either a plain LayerNorm
    or a fused Pallas kernel (ops/pallas_attention.py::window_block_pallas)
    without changing the checkpoint structure."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


def layer_norm(x, scale, bias, eps=1e-5, dtype=None):
    """LayerNorm over the last axis with f32 statistics (matches the fused
    kernels' in-VMEM LN numerics)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(dtype or x.dtype)


class PatchifyConv(nn.Module):
    """``nn.Conv`` with ``strides == kernel_size`` and VALID padding,
    computed as space-to-depth + one MXU matmul.

    Parameter tree, names, shapes, and initializers are IDENTICAL to
    ``nn.Conv`` (HWIO ``kernel`` + ``bias``), so checkpoints, the torch
    converter, and fresh-init RNG draws are unchanged — only the lowering
    differs. The reason this exists is the backward: on this XLA TPU
    build, the input-gradient of a stride==kernel conv lowers to a dense
    input-dilated sliding conv (measured: a 12-block ViT-B/16 grad step
    spends 75 of 129 ms in the depth-0 stem/head fixed cost, dominated by
    the patch-embed conv bwd), while the matmul form's backward is a
    single ``dp @ kernel.T`` plus free reshape/transpose — the TPU-native
    formulation of non-overlapping patch extraction (reference models use
    torch Conv2d stems, e.g. vit_base_patch16_224 / mixer / CLIP-ViT /
    swin / convnext stems).
    """

    features: int
    patch_size: tuple[int, int]
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        ph, pw = self.patch_size
        b, h, w, cin = x.shape
        if h % ph or w % pw:
            raise ValueError(
                f"PatchifyConv needs H,W divisible by patch {ph}x{pw}; "
                f"got {h}x{w}"
            )
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (ph, pw, cin, self.features),
        )
        gh, gw = h // ph, w // pw
        p = x.reshape(b, gh, ph, gw, pw, cin)
        p = p.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, ph * pw * cin)
        y = jnp.dot(
            p.astype(self.dtype),
            kernel.reshape(ph * pw * cin, self.features).astype(self.dtype),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(y.dtype)
        return y.reshape(b, gh, gw, self.features)
