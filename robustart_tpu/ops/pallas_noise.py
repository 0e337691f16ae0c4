"""Pallas TPU kernel: fused noise-corruption + quantize + normalize.

The ImageNet-C eval hot path (multi_eval_solver online mode / bench.py) is
HBM-bandwidth bound: uint8 batch → f32 → add noise → uint8-quantize →
normalize → model. Done with stock jnp ops that chain touches HBM several
times and burns cycles in the threefry PRNG. This kernel fuses the whole
pre-model chain into ONE VMEM pass per image tile using the TPU's on-chip
PRNG (`pltpu.prng_random_bits` + Box-Muller), writing the model-ready
normalized tensor directly:

    u8 → /255 → + σ·N(0,1) → clip [0,1] → floor(·255)/255 → (x−µ)/σ_c → out

Layout trick: a 224×224×3 image flattens to 150528 = 1176×128 — an exact
lane-width tiling, so the kernel runs full-width VPU ops with zero padding;
per-element channel ids (flat % 3) select the normalization constants.

Covers the noise family (gaussian / speckle / impulse / shot-approx); the
blur/weather/digital families keep the jnp kernels (they're conv/matmul
bound where XLA is already near roofline).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _uniform_from_bits(bits: jax.Array) -> jax.Array:
    """uint32 → float32 uniform in (0, 1): top 24 bits, never exactly 0.

    Mosaic lacks a u32→f32 cast; the top-24-bit value fits in int31, so
    bitcast to int32 first (sign-safe) and cast from there.
    """
    top24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return top24.astype(jnp.float32) * (1.0 / (1 << 24)) + (0.5 / (1 << 24))


def _normal_pair(shape) -> jax.Array:
    """Standard normals via Box-Muller from the on-chip PRNG."""
    u1 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    u2 = _uniform_from_bits(pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(2.0 * np.pi * u2)


def _channel_ids(rows: int, row_offset) -> jax.Array:
    """(rows, 128) channel index (flat % 3) for a flattened RGB image tile."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    flat = (row_ids + row_offset) * LANES + lane_ids
    return jnp.mod(flat, 3)


def _make_kernel(noise: str, sigma: float, mean: Sequence[float],
                 std: Sequence[float], rows: int, output: str = "normalized"):
    m = [float(v) for v in mean]
    s = [float(v) for v in std]

    def kernel(seed_ref, x_ref, o_ref):
        img_idx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0] + img_idx)
        # Mosaic has no direct u8→f32 cast; widen through int32
        x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        if noise == "gaussian_noise":
            x = x + sigma * _normal_pair(x.shape)
        elif noise == "speckle_noise":
            x = x + x * (sigma * _normal_pair(x.shape))
        elif noise == "impulse_noise":
            u = _uniform_from_bits(
                pltpu.bitcast(pltpu.prng_random_bits(x.shape), jnp.uint32)
            )
            x = jnp.where(u < sigma / 2, 0.0, x)
            x = jnp.where(u > 1.0 - sigma / 2, 1.0, x)
        elif noise == "shot_noise":
            # gaussian approximation of Poisson(x·c)/c: std = sqrt(x/c)
            x = x + jnp.sqrt(jnp.maximum(x, 0.0) / sigma) * _normal_pair(x.shape)
        else:
            raise ValueError(noise)
        x = jnp.clip(x, 0.0, 1.0)
        # quantize through the uint8 grid like stored ImageNet-C
        k = jnp.floor(x * 255.0)
        if output == "centered_u8":
            # int8 stem-input grid (k−128) for the quantized eval path
            # (robustart_tpu/models/quantize.py: the normalization constants
            # are folded into the int8 stem weights — emitting the raw grid
            # is exact)
            o_ref[:] = (k.astype(jnp.int32) - 128).astype(o_ref.dtype)
            return
        x = k * (1.0 / 255.0)
        ch = _channel_ids(rows, 0)
        mean_v = jnp.where(ch == 0, m[0], jnp.where(ch == 1, m[1], m[2]))
        std_v = jnp.where(ch == 0, s[0], jnp.where(ch == 1, s[1], s[2]))
        o_ref[:] = ((x - mean_v) / std_v).astype(o_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "noise", "sigma", "mean", "std", "out_dtype", "interpret", "output"
    ),
)
def fused_noise_normalize(
    images_u8: jax.Array,
    seed: jax.Array,
    *,
    noise: str = "gaussian_noise",
    sigma: float = 0.18,
    mean: tuple = (0.485, 0.456, 0.406),
    std: tuple = (0.229, 0.224, 0.225),
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    output: str = "normalized",
) -> jax.Array:
    """(B, H, W, 3) uint8 → (B, H, W, 3) normalized ``out_dtype``.

    One Pallas program per image; requires H·W·3 % 128 == 0 (true for
    224/64/32-sized RGB images).

    ``output='centered_u8'`` instead emits the corrupted image as
    ``int8 = uint8_grid − 128`` (no normalization) — the exact input of the
    int8 quantized eval path (models/quantize.py). Pass ``out_dtype=jnp.int8``.
    """
    b, h, w, c = images_u8.shape
    flat = h * w * c
    assert flat % LANES == 0, f"{flat} not lane-aligned"
    rows = flat // LANES
    x = images_u8.reshape(b, rows, LANES)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = _make_kernel(noise, float(sigma), mean, std, rows, output)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, rows, LANES), lambda i, s: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, rows, LANES), lambda i, s: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((b, rows, LANES), out_dtype),
        # bool True maps to the TPU-semantics interpreter (runs on CPU for
        # tests; plain interpret=True lacks the pltpu PRNG primitives)
        interpret=pltpu.InterpretParams() if interpret else False,
    )(seed_arr, x)
    return out.reshape(b, h, w, c)
