"""ConvNeXt / ConvNeXtV2 (base), incl. the reference's ``_cvst`` aliases.

Parity names: ``convnext_base``, ``convnextv2_base``, ``convnext_base_cvst``
(reference exprs/exp/imagenet-a_o-loop configs; SURVEY.md §2.7). Blocks:
7×7 depthwise conv → LN → pointwise 4× MLP with GELU; V1 uses LayerScale
(gamma), V2 replaces it with GRN inside the MLP (Woo et al., 2023).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import DropPath, PatchifyConv
from robustart_tpu.ops.pallas_convnext import (
    dwconv_ln_pallas,
    dwconv_ln_reference,
)
from robustart_tpu.ops.pallas_mlp import mlp_pallas


class _DWConv7Params(nn.Module):
    """Parameter holder matching ``nn.Conv(dim, (7,7), groups=dim)``'s tree
    (kernel (7,7,1,C) + bias) so checkpoints/converters are unaffected by
    the fused-kernel path."""

    dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 1, self.dim)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return kernel, bias


class _LNParams(nn.Module):
    """Parameter holder matching ``nn.LayerNorm``'s tree (scale + bias)."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,))
        bias = self.param("bias", nn.initializers.zeros, (self.dim,))
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder matching ``nn.Dense``'s tree (kernel + bias)."""

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_dim, self.out_dim),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
        return kernel, bias


class GRN(nn.Module):
    """Global Response Normalization (ConvNeXtV2)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        gamma = self.param("gamma", nn.initializers.zeros, (self.dim,))
        beta = self.param("beta", nn.initializers.zeros, (self.dim,))
        gx = jnp.sqrt(jnp.sum(x**2, axis=(1, 2), keepdims=True) + 1e-12)
        nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
        return gamma * (x * nx) + beta + x


class ConvNeXtBlock(nn.Module):
    dim: int
    drop_path: float = 0.0
    layer_scale_init: float = 1e-6  # <=0 disables LayerScale (V2)
    use_grn: bool = False
    # 'auto' resolves to 'xla': the functional dwconv+LN (ops/
    # pallas_convnext.dwconv_ln_reference) lets XLA fuse conv+bias+LN into
    # one pass at ~VPU peak (measured 2.5 TF/s — the 49-tap depthwise conv
    # is VPU-FLOP-bound, not bandwidth-bound). The Pallas kernel
    # ('pallas') measured SLOWER (1,110 vs 1,452 img/s model-level,
    # WORKLOG r3): its shifted-window reads pay sublane rotations XLA's
    # codegen avoids. Kept as an opt-in for future chip generations.
    block_impl: str = "auto"
    # 'auto': fused MLP Pallas kernel on TPU (ops/pallas_mlp.py — the 4C
    # intermediate stays in VMEM; layer-scale + residual in the epilogue)
    mlp_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        shortcut = x
        dw_kernel, dw_bias = _DWConv7Params(self.dim, name="dwconv")()
        ln_scale, ln_bias = _LNParams(self.dim, name="norm")()
        impl = self.block_impl
        if impl == "auto":
            impl = "xla"
        if impl == "pallas":
            x = dwconv_ln_pallas(x, dw_kernel, dw_bias, ln_scale, ln_bias)
        else:
            x = dwconv_ln_reference(x, dw_kernel, dw_bias, ln_scale, ln_bias)
        w1, b1 = _DenseParams(self.dim, 4 * self.dim, name="pwconv1")()
        w2, b2 = _DenseParams(4 * self.dim, self.dim, name="pwconv2")()
        gamma = (
            self.param(
                "gamma",
                nn.initializers.constant(self.layer_scale_init),
                (self.dim,),
            )
            if self.layer_scale_init > 0
            else None
        )
        mlp_impl = self.mlp_impl
        if mlp_impl == "auto":
            mlp_impl = (
                "pallas" if jax.default_backend() == "tpu" else "xla"
            )
        can_fuse_residual = deterministic or self.drop_path == 0.0
        if mlp_impl == "pallas" and not self.use_grn and can_fuse_residual:
            # fused MLP: the (·, 4C) intermediate never leaves VMEM, and
            # layer-scale + residual ride the epilogue (DropPath at eval is
            # the identity, so fusing the add is exact)
            return mlp_pallas(
                x, w1.astype(self.dtype), b1, w2.astype(self.dtype), b2,
                gamma=gamma, shortcut=shortcut, act="gelu",
            )
        x = jnp.dot(x.astype(self.dtype), w1.astype(self.dtype)) + b1.astype(
            self.dtype
        )
        x = nn.gelu(x, approximate=False)
        if self.use_grn:
            x = GRN(4 * self.dim, name="grn")(x)
        x = jnp.dot(x.astype(self.dtype), w2.astype(self.dtype)) + b2.astype(
            self.dtype
        )
        if gamma is not None:
            x = x * gamma
        return shortcut + DropPath(self.drop_path)(x, deterministic=deterministic)


class ConvNeXt(nn.Module):
    depths: Sequence[int] = (3, 3, 27, 3)
    dims: Sequence[int] = (128, 256, 512, 1024)
    num_classes: int = 1000
    drop_path: float = 0.0
    use_grn: bool = False  # True = ConvNeXtV2
    block_impl: str = "auto"
    mlp_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        deterministic = not train
        total = sum(self.depths)
        bi = 0
        for si, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if si == 0:
                x = PatchifyConv(
                    dim, (4, 4), dtype=self.dtype, name="stem_conv",
                )(x)
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
            else:
                x = nn.LayerNorm(
                    epsilon=1e-6, dtype=self.dtype, name=f"downsample_norm{si}"
                )(x)
                x = PatchifyConv(
                    dim, (2, 2), dtype=self.dtype,
                    name=f"downsample_conv{si}",
                )(x)
            for di in range(depth):
                x = ConvNeXtBlock(
                    dim,
                    drop_path=self.drop_path * bi / max(total - 1, 1),
                    layer_scale_init=0.0 if self.use_grn else 1e-6,
                    use_grn=self.use_grn,
                    block_impl=self.block_impl,
                    mlp_impl=self.mlp_impl,
                    dtype=self.dtype,
                    name=f"stage{si}_block{di}",
                )(x, deterministic=deterministic)
                bi += 1
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="head_norm")(
            x.astype(jnp.float32)
        )
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


def convnext_base(**kw):
    kw.pop("bn", None)
    return ConvNeXt(**kw)


def convnextv2_base(**kw):
    kw.pop("bn", None)
    return ConvNeXt(use_grn=True, **kw)
