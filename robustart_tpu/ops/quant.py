"""int8 post-training-quantization primitives for the TPU MXU.

TPU v5e executes int8×int8→int32 matmul/conv at ~2× the bf16 rate (measured
1.76× on this chip for a 3×3/256ch conv; see WORKLOG round 2). These helpers
implement the standard PTQ recipe used by the int8 eval path
(:mod:`robustart_tpu.models.quantize`):

- BN folding: eval-mode ``conv → BN`` collapses to ``conv' + bias`` with
  ``w' = w·γ/√(σ²+ε)`` per output channel (running stats; the reference's
  eval path freezes BN the same way, it just never folds).
- Symmetric per-output-channel int8 weights (TensorRT-style).
- Static per-tensor activation scales from calibration amax; activations are
  requantized with round-to-nearest, clamp to ±127.

All ops are plain jnp/lax so they run identically on the CPU test backend;
XLA fuses the dequant→bias→relu→requant epilogues into the conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_conv_bn(
    kernel: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    mean: jax.Array,
    var: jax.Array,
    eps: float = 1e-5,
):
    """Fold an eval-mode BatchNorm into the preceding bias-free conv.

    kernel: (kh, kw, cin, cout) HWIO. Returns (folded_kernel, bias) with
    ``conv(x, folded) + bias == BN(conv(x, kernel))`` exactly (float).
    """
    inv = gamma / jnp.sqrt(var + eps)
    return kernel * inv[None, None, None, :], beta - mean * inv


def quantize_weight_per_channel(kernel: jax.Array, num_bits: int = 8):
    """Symmetric per-output-channel quantization of an HWIO conv kernel.

    Returns (w_int8, scale[cout]) with ``w ≈ w_int8 · scale``.
    """
    qmax = 2 ** (num_bits - 1) - 1
    amax = jnp.max(jnp.abs(kernel), axis=(0, 1, 2))
    scale = jnp.maximum(amax, 1e-12) / qmax
    w_q = jnp.clip(jnp.round(kernel / scale[None, None, None, :]), -qmax, qmax)
    return w_q.astype(jnp.int8), scale


def requantize(x: jax.Array, inv_scale: jax.Array) -> jax.Array:
    """float activation → int8 at ``scale`` (x ≈ out·scale); round-to-nearest."""
    return jnp.clip(jnp.round(x * inv_scale), -127, 127).astype(jnp.int8)


def conv_i8(
    x: jax.Array,
    w: jax.Array,
    stride: int = 1,
    padding=0,
    groups: int = 1,
) -> jax.Array:
    """int8 NHWC conv → int32 accumulators on the MXU's int8 path."""
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    return jax.lax.conv_general_dilated(
        x,
        w,
        (stride, stride),
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32,
    )


def maxpool_i8(x: jax.Array, window: int = 3, stride: int = 2, padding: int = 1):
    """3×3/2 max-pool directly on int8 (monotonic ⇒ commutes with requant)."""
    pad = [(0, 0), (padding, padding), (padding, padding), (0, 0)]
    return jax.lax.reduce_window(
        x,
        jnp.int8(-128),
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=pad,
    )


def ln_f32(x, p, eps=1e-6, out_dtype=jnp.float32):
    """LayerNorm with f32 statistics over the last axis, ``p`` a
    ``{"scale", "bias"}`` dict — the shared body behind the transformer
    int8 families' ``_ln`` wrappers (each keeps its model's eps default:
    Mixer/ConvNeXt 1e-6, Swin 1e-5)."""
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(out_dtype)


def dense_i8(x_i8, entry, s_in):
    """int8×int8→int32 dense with per-output-channel dequant:
    ``(x_i8 @ entry['w']) · (s_in · entry['sw']) [+ entry['b']]``.
    ``entry['b']`` may be absent/None (Swin's qkv when qkv_bias is off)."""
    y = jax.lax.dot_general(
        x_i8, entry["w"],
        dimension_numbers=(((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    y = y * (s_in * entry["sw"])
    b = entry.get("b")
    return y if b is None else y + b
