"""MLP-Mixer: ``mixer_b16_224`` and ``mixer_L16_224``.

Parity names from reference exprs/robust_baseline_exp/mlp_mixer/*/config.yaml
(kwargs: drop_path / drop_path_rate). All compute is batched matmuls — ideal
MXU shape; token-mixing operates on transposed tokens so both MLPs hit the
systolic array.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from robustart_tpu.models.layers import (
    DenseParams,
    DropPath,
    LNParams,
    PatchifyConv,
    layer_norm,
)


class MixerMlp(nn.Module):
    hidden_dim: int
    dtype: Any = jnp.float32
    mix_axis: int = -1  # 1 = token axis of (B, T, C), transpose-free on TPU
    # 'auto': fused Pallas kernels on TPU, XLA einsums elsewhere; 'xla'
    # forces einsums (tensor-parallel runs need it — the fused kernels
    # consume whole weight arrays, which would all-gather sharded kernels)
    mlp_impl: str = "auto"

    @nn.compact
    def __call__(self, x: jax.Array,
                 shortcut: jax.Array | None = None,
                 ln: tuple | None = None,
                 residual_input: bool = False) -> jax.Array:
        """``ln=(scale, bias)``: x is the PRE-norm (B, T, C) input — the
        LayerNorm runs as an in-kernel prologue on TPU (one HBM read of x
        instead of LN read+write+MLP read). ``residual_input``: add the raw
        pre-norm x as the residual from the tile already in VMEM."""
        dim = x.shape[self.mix_axis]
        w1, b1 = DenseParams(dim, self.hidden_dim, name="fc1")()
        w2, b2 = DenseParams(self.hidden_dim, dim, name="fc2")()
        impl = self.mlp_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        on_tpu = impl == "pallas"
        raw = x  # pre-norm input (the residual when residual_input)
        if self.mix_axis == 1:
            if on_tpu:
                # token mixing with the token-axis contraction done in VMEM
                # (ops/pallas_mlp.py::token_mlp_pallas): neither the
                # (B, C, T) transpose nor the hidden intermediate touches
                # HBM; LN prologue + residual ride the same program
                from robustart_tpu.ops.pallas_mlp import token_mlp_pallas

                return token_mlp_pallas(
                    x.astype(self.dtype), w1.astype(self.dtype), b1,
                    w2.astype(self.dtype), b2, shortcut=shortcut, act="gelu",
                    ln=ln, ln_eps=1e-6, residual_input=residual_input,
                )
            if ln is not None:
                x = layer_norm(x, ln[0], ln[1], 1e-6, self.dtype)
            x = jnp.swapaxes(x, 1, 2)
        elif ln is not None and not on_tpu:
            x = layer_norm(x, ln[0], ln[1], 1e-6, self.dtype)
        if on_tpu:
            # fused MLP (ops/pallas_mlp.py): the hidden intermediate stays
            # in VMEM
            from robustart_tpu.ops.pallas_mlp import mlp_pallas

            out = mlp_pallas(
                x.astype(self.dtype), w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2,
                shortcut=shortcut if self.mix_axis != 1 else None,
                act="gelu", ln=ln, ln_eps=1e-6,
                residual_input=residual_input,
            )
            if self.mix_axis != 1:
                return out
        else:
            out = jnp.dot(x.astype(self.dtype), w1.astype(self.dtype)) + (
                b1.astype(self.dtype)
            )
            out = nn.gelu(out, approximate=False)
            out = jnp.dot(out.astype(self.dtype), w2.astype(self.dtype)) + (
                b2.astype(self.dtype)
            )
            if self.mix_axis != 1:
                if residual_input:
                    return out + raw
                return out if shortcut is None else out + shortcut
        out = jnp.swapaxes(out, 1, 2)
        if residual_input and not on_tpu:
            return out + raw
        return out if shortcut is None else out + shortcut


class MixerBlock(nn.Module):
    tokens_mlp_dim: int
    channels_mlp_dim: int
    drop_path: float = 0.0
    mlp_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        c = x.shape[-1]
        ln1 = LNParams(c, name="norm1")()
        ln2 = LNParams(c, name="norm2")()
        tok = MixerMlp(self.tokens_mlp_dim, dtype=self.dtype, mix_axis=1,
                       mlp_impl=self.mlp_impl, name="mlp_tokens")
        ch = MixerMlp(self.channels_mlp_dim, dtype=self.dtype,
                      mlp_impl=self.mlp_impl, name="mlp_channels")
        if deterministic:
            # DropPath at eval is the identity — LN prologue, MLP, and the
            # residual all run in ONE kernel per mix (zero standalone
            # elementwise passes per block)
            x = tok(x, ln=ln1, residual_input=True)
            return ch(x, ln=ln2, residual_input=True)
        y = layer_norm(x, ln1[0], ln1[1], 1e-6, self.dtype)
        x = x + DropPath(self.drop_path)(tok(y), deterministic=deterministic)
        y = layer_norm(x, ln2[0], ln2[1], 1e-6, self.dtype)
        return x + DropPath(self.drop_path)(ch(y),
                                            deterministic=deterministic)


class MlpMixer(nn.Module):
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    tokens_mlp_dim: int = 384
    channels_mlp_dim: int = 3072
    num_classes: int = 1000
    drop_path: float = 0.0
    mlp_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        deterministic = not train
        b = x.shape[0]
        x = PatchifyConv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            dtype=self.dtype,
            name="stem",
        )(x)
        x = x.reshape(b, -1, self.embed_dim)
        for i in range(self.depth):
            x = MixerBlock(
                self.tokens_mlp_dim,
                self.channels_mlp_dim,
                drop_path=self.drop_path,
                mlp_impl=self.mlp_impl,
                dtype=self.dtype,
                name=f"block{i}",
            )(x, deterministic=deterministic)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        x = jnp.mean(x, axis=1).astype(jnp.float32)
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="head")(x)


def mixer_b16_224(**kw):
    kw.pop("bn", None)
    kw.pop("drop_path_rate", None)
    return MlpMixer(
        patch_size=16, embed_dim=768, depth=12,
        tokens_mlp_dim=384, channels_mlp_dim=3072, **kw,
    )


def mixer_L16_224(**kw):
    kw.pop("bn", None)
    kw.pop("drop_path_rate", None)
    return MlpMixer(
        patch_size=16, embed_dim=1024, depth=24,
        tokens_mlp_dim=512, channels_mlp_dim=4096, **kw,
    )
