"""CLIP ViT-L/14 visual tower as an ImageNet classifier.

Parity names: ``clip_vit_l_14`` and the robust fine-tunes
``clip_vit_l_14_fare2_clip`` / ``clip_vit_l_14_tecoa2_clip`` (reference
exprs/exp/imagenet-a_o-loop/config_clip_*.yaml; SURVEY.md §2.7 — the
reference evaluates robust CLIP checkpoints, FARE²/TeCoA², as ImageNet
classifiers). Architecture: OpenAI CLIP visual transformer — patch 14,
width 1024, depth 24, heads 16, pre-LN, class embedding, QuickGELU, final
projection to the 768-d joint space.

Classification head: either a learned ``num_classes`` Dense (linear probe) or
fixed zero-shot weights (the text-encoder class embeddings) loaded via
``zero_shot_weights`` from a checkpoint. CLIP normalization constants are
wired through the model registry metadata.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from robustart_tpu.models.layers import (
    DenseParams,
    LNParams,
    PatchifyConv,
    layer_norm,
)


def quick_gelu(x: jax.Array) -> jax.Array:
    return x * nn.sigmoid(1.702 * x)


class CLIPEncoderBlock(nn.Module):
    """Pre-LN CLIP block. On TPU both halves run fused: the attention half
    in the whole-block window kernel (LN1 + qkv + attention + out_proj +
    residual in one VMEM program, one 257-token "window" per image —
    CLIP-L's C=1024 streams the weights in two head groups,
    ops/pallas_attention.py::block_kernel_head_groups) and LN2+MLP+residual
    in ``mlp_pallas`` (the (·, 4C) intermediate stays VMEM-resident,
    quick-gelu in-kernel). Widths the block kernel cannot take (lane-
    misaligned C) fall back to ``mha_pallas`` + XLA matmuls.
    Param tree unchanged (DenseParams/LNParams holders)."""

    num_heads: int
    # 'auto': fused Pallas kernels on TPU, XLA einsums elsewhere
    attention_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        head_dim = c // self.num_heads
        ln1_scale, ln1_bias = LNParams(c, name="ln_1")()
        # head-major packed qkv (H, 3, D) — TP-friendly layout (see
        # models/vit.py Attention; converters permute from torch's 3-major)
        w_qkv, b_qkv = DenseParams(c, 3 * c, name="qkv")()
        w_proj, b_proj = DenseParams(c, c, name="out_proj")()
        impl = self.attention_impl
        if impl == "auto":
            impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        blockable = False
        if impl == "pallas":
            from robustart_tpu.ops.pallas_attention import (
                block_kernel_head_groups,
            )

            blockable = block_kernel_head_groups(
                c, self.num_heads, jnp.dtype(self.dtype).itemsize
            ) is not None
        if blockable:
            from robustart_tpu.ops.pallas_attention import window_block_pallas

            dt = self.dtype
            wr = w_qkv.reshape(c, self.num_heads, 3, head_dim)
            br = b_qkv.reshape(self.num_heads, 3, head_dim)
            x = window_block_pallas(
                x.astype(dt), ln1_scale, ln1_bias,
                wr[:, :, 0].reshape(c, c).astype(dt), br[:, 0].reshape(c),
                wr[:, :, 1].reshape(c, c).astype(dt), br[:, 1].reshape(c),
                wr[:, :, 2].reshape(c, c).astype(dt), br[:, 2].reshape(c),
                w_proj.astype(dt), b_proj,
                jnp.zeros((self.num_heads, 1, 1), jnp.float32),
                None, num_windows=1, eps=1e-5,
            )
        else:
            y = layer_norm(x, ln1_scale, ln1_bias, 1e-5, self.dtype)
            qkv = jnp.dot(y.astype(self.dtype), w_qkv.astype(self.dtype))
            qkv = qkv + b_qkv.astype(self.dtype)
            qkv = qkv.reshape(b, n, self.num_heads, 3, head_dim)
            q, k, v = qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2]
            if impl == "pallas":
                from robustart_tpu.ops.pallas_attention import mha_pallas

                y = mha_pallas(q, k, v).reshape(b, n, c)
            else:
                scale = 1.0 / np.sqrt(head_dim)
                attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
                attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(
                    self.dtype
                )
                y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, n, c)
            y = jnp.dot(y, w_proj.astype(self.dtype)) + b_proj.astype(
                self.dtype
            )
            x = x + y

        ln2_scale, ln2_bias = LNParams(c, name="ln_2")()
        w1, b1 = DenseParams(c, 4 * c, name="mlp_fc")()
        w2, b2 = DenseParams(4 * c, c, name="mlp_proj")()
        if impl == "pallas":
            from robustart_tpu.ops.pallas_mlp import mlp_pallas

            return mlp_pallas(
                x.astype(self.dtype), w1.astype(self.dtype), b1,
                w2.astype(self.dtype), b2, act="quick_gelu",
                ln=(ln2_scale, ln2_bias), ln_eps=1e-5, residual_input=True,
            )
        y = layer_norm(x, ln2_scale, ln2_bias, 1e-5, self.dtype)
        y = jnp.dot(y.astype(self.dtype), w1.astype(self.dtype)) + b1.astype(
            self.dtype
        )
        y = quick_gelu(y)
        y = jnp.dot(y, w2.astype(self.dtype)) + b2.astype(self.dtype)
        return x + y


class CLIPVisionClassifier(nn.Module):
    patch_size: int = 14
    width: int = 1024
    depth: int = 24
    num_heads: int = 16
    embed_dim: int = 768
    num_classes: int = 1000
    attention_impl: str = "auto"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b = x.shape[0]
        x = PatchifyConv(
            self.width, (self.patch_size, self.patch_size),
            use_bias=False, dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(b, -1, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(self.width**-0.5),
            (self.width,), jnp.float32,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, self.width)).astype(x.dtype), x], 1
        )
        pos = self.param(
            "positional_embedding", nn.initializers.normal(self.width**-0.5),
            (x.shape[1], self.width), jnp.float32,
        )
        x = x + pos.astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_pre")(x)
        for i in range(self.depth):
            x = CLIPEncoderBlock(self.num_heads,
                                 attention_impl=self.attention_impl,
                                 dtype=self.dtype, name=f"resblock{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln_post")(x[:, 0])
        proj = self.param(
            "proj", nn.initializers.normal(self.width**-0.5),
            (self.width, self.embed_dim), jnp.float32,
        )
        feats = (x.astype(jnp.float32) @ proj)
        # zero-shot style head: L2-normalized features against class weights
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
        class_w = self.param(
            "zero_shot_weights", nn.initializers.normal(0.02),
            (self.embed_dim, self.num_classes), jnp.float32,
        )
        class_w_n = class_w / jnp.linalg.norm(class_w, axis=0, keepdims=True)
        logit_scale = self.param(
            "logit_scale", nn.initializers.constant(np.log(1 / 0.07)), ()
        )
        return jnp.exp(logit_scale) * (feats @ class_w_n)


def clip_vit_l_14(**kw):
    kw.pop("bn", None)
    return CLIPVisionClassifier(**kw)


# robust fine-tunes share the architecture; weights differ per checkpoint
clip_vit_l_14_fare2_clip = clip_vit_l_14
clip_vit_l_14_tecoa2_clip = clip_vit_l_14
