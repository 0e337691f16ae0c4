"""int8 post-training quantization of RepVGG (deploy form) for TPU eval.

RepVGG is the best-case int8 family on the MXU: after structural
re-parameterization (``models/repvgg.py::reparameterize_params``, mirroring
the upstream deployment conversion) the whole network is a chain of plain
3x3 convs + bias + relu — exactly the shape where the int8 conv path
measures ~1.76x the bf16 rate on this chip (WORKLOG round 2). No BN folding
is needed (reparameterization already folded every branch's BN), no residual
adds, no depthwise/SE epilogues.

Recipe (same as :mod:`robustart_tpu.models.quantize` for ResNet):

1. Re-parameterize to deploy form (exact fold, float).
2. Symmetric per-output-channel int8 weights.
3. Static per-tensor activation scales from calibration amax at every relu.
4. int8 forward mirroring ``RepVGG.__call__`` deploy branch
   (robustart_tpu/models/repvgg.py:30-36) layer-for-layer: int8 convs with
   f32 dequant -> bias -> relu -> requant epilogues, f32 head.

**The stem is exact** (up to weight rounding): as in models/quantize.py:18-24
the normalized input takes 256 values per channel, so the stage0 conv
consumes ``uint8 - 128`` directly with ``1/(255*std_c)`` folded into its
weights; zero-padding of the normalized image becomes per-channel constant
padding of the int8 grid.

The reference has no quantized path; parity is asserted by
tests/test_quantize_repvgg.py (deploy-float == train-float; int8 argmax
agreement + logit cosine vs float).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.repvgg import RepVGG, reparameterize_params
from robustart_tpu.ops.quant import conv_i8, quantize_weight_per_channel, requantize


@dataclasses.dataclass(frozen=True)
class _BlockSpec:
    name: str  # param-tree block name, e.g. "stage2_3"
    stride: int
    site_in: str  # activation-scale site feeding this conv


def _repvgg_spec(module: RepVGG):
    """Flat conv list mirroring RepVGG.__call__ (repvgg.py:79-88)."""
    blocks = []
    cur = "stage0"
    for si, n in enumerate(module.num_blocks):
        for bi in range(n):
            name = f"stage{si + 1}_{bi}"
            blocks.append(_BlockSpec(name, 2 if bi == 0 else 1, cur))
            cur = name
    return blocks, cur  # cur = head input site


def _calib_forward(fp, blocks, head_site, x_norm):
    """Deploy-form float forward recording amax at every relu output."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    e = fp["stage0"]
    x = jax.lax.conv_general_dilated(
        x_norm, e["w"], (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + e["b"]
    x = record("stage0", jax.nn.relu(x))
    for blk in blocks:
        e = fp[blk.name]
        x = jax.lax.conv_general_dilated(
            x, e["w"], (blk.stride, blk.stride), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + e["b"]
        x = record(blk.name, jax.nn.relu(x))
    x = jnp.mean(x, axis=(1, 2))
    return x @ fp["fc"]["kernel"] + fp["fc"]["bias"], amax


def _int8_forward(qp, blocks, head_site, x_i8, stem_pad_vals):
    """x_i8: (B,H,W,3) int8 = uint8_grid - 128."""
    # exact stem: per-channel constant padding on the int8 grid (VALID conv)
    pad_c = jnp.asarray(stem_pad_vals, jnp.int8)
    x_p = jnp.pad(x_i8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x_p.shape[1], x_p.shape[2]
    border = jnp.zeros((h, w, 1), jnp.int8).at[1:-1, 1:-1, :].set(1)
    x_p = x_p * border + pad_c * (1 - border)
    e = qp["stage0"]
    y = conv_i8(x_p, e["w"], 2, 0).astype(jnp.float32)
    a = requantize(jax.nn.relu(y * e["sw"] + e["b"]), qp["inv_scale"]["stage0"])

    for blk in blocks:
        e = qp[blk.name]
        s_in = qp["scale"][blk.site_in]
        y = conv_i8(a, e["w"], blk.stride, 1).astype(jnp.float32)
        y = jax.nn.relu(y * (s_in * e["sw"]) + e["b"])
        a = requantize(y, qp["inv_scale"][blk.name])

    x = a.astype(jnp.float32) * qp["scale"][head_site]
    x = jnp.mean(x, axis=(1, 2))
    return x @ qp["fc"]["kernel"] + qp["fc"]["bias"]


@dataclasses.dataclass
class QuantizedRepVGG:
    """int8 eval-only RepVGG. Call with uint8 NHWC images (or [0,1] floats,
    rounded onto the uint8 grid)."""

    name: str
    qparams: Any
    blocks: Any
    head_site: str
    stem_pad_vals: tuple
    mean: Sequence[float]
    std: Sequence[float]
    num_classes: int = 1000
    input_size: int = 224

    def apply_fn(self, qparams, images):
        if images.dtype == jnp.uint8:
            x_i8 = (images.astype(jnp.int32) - 128).astype(jnp.int8)
        elif images.dtype == jnp.int8:
            x_i8 = images
        else:
            k = jnp.clip(jnp.round(images.astype(jnp.float32) * 255.0), 0, 255)
            x_i8 = (k - 128).astype(jnp.int8)
        return _int8_forward(
            qparams, self.blocks, self.head_site, x_i8, self.stem_pad_vals
        )

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_repvgg(clf, calib_images, calib_batch_size: int = 64) -> QuantizedRepVGG:
    """Build the int8 eval path from a float RepVGG :class:`Classifier`
    (train or deploy form — train form is re-parameterized first)."""
    module = clf.module
    if not isinstance(module, RepVGG):
        raise ValueError(
            f"quantize_repvgg expects the RepVGG family; got {type(module).__name__}"
        )

    if module.deploy:
        fused = clf.variables["params"]
    else:
        fused = reparameterize_params(clf.variables)["params"]
    blocks, head_site = _repvgg_spec(module)

    fp = {
        name: {
            "w": jnp.asarray(blk["fused"]["kernel"], jnp.float32),
            "b": jnp.asarray(blk["fused"]["bias"], jnp.float32),
        }
        for name, blk in fused.items()
        if name != "linear"
    }
    fp["fc"] = {
        "kernel": jnp.asarray(fused["linear"]["kernel"], jnp.float32),
        "bias": jnp.asarray(fused["linear"]["bias"], jnp.float32),
    }

    # --- calibrate activation scales (fused weights ride as jit args —
    # closure constants would hit the relay's compile-payload cap)
    calib_fn = jax.jit(lambda f, x: _calib_forward(f, blocks, head_site, x)[1])
    images = np.asarray(calib_images)
    n = max(len(images) // calib_batch_size, 1)
    amax = None
    for i in range(n):
        batch = images[i * calib_batch_size : (i + 1) * calib_batch_size]
        x01 = jnp.asarray(batch, jnp.float32) / 255.0
        stats = calib_fn(fp, normalize_01(x01, clf.mean, clf.std))
        amax = stats if amax is None else jax.tree.map(jnp.maximum, amax, stats)
    scale = {k: jnp.maximum(v, 1e-12) / 127.0 for k, v in amax.items()}

    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0  # x_norm = (x_q - offs_c)/(255*std_c)
    qp = {"scale": scale, "inv_scale": {k: 1.0 / v for k, v in scale.items()}}

    stem_w = fp["stage0"]["w"] / jnp.asarray(255.0 * std, jnp.float32).reshape(
        1, 1, 3, 1
    )
    stem_b = fp["stage0"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["stage0"] = {"w": w_q, "sw": sw, "b": stem_b}
    for blk in blocks:
        w_q, sw = quantize_weight_per_channel(fp[blk.name]["w"])
        qp[blk.name] = {"w": w_q, "sw": sw, "b": fp[blk.name]["b"]}
    qp["fc"] = fp["fc"]

    return QuantizedRepVGG(
        name=f"{clf.name}@int8",
        qparams=qp,
        blocks=blocks,
        head_site=head_site,
        stem_pad_vals=tuple(int(round(v)) for v in offs),
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
