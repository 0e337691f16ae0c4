"""int8 post-training quantization of the ResNet family for TPU eval.

Motivation: TPU v5e runs int8×int8→int32 convs at ~2× the bf16 MXU rate.
The benchmark eval loops (ImageNet-C/A/O/S, clean accuracy) are
forward-only, so a quantized eval path is a pure-throughput feature the
reference framework (fp16 torch inference) has no counterpart for.

Recipe (standard TensorRT-style PTQ, built from :mod:`robustart_tpu.ops.quant`):

1. Fold eval-mode BatchNorm into each conv (exact, float).
2. Quantize weights symmetric per-output-channel int8.
3. Calibrate static per-tensor activation scales: run the folded float
   network over calibration batches, record amax at every conv input.
4. Emit an int8 forward that mirrors ``ResNet.__call__``
   (robustart_tpu/models/resnet.py) layer-for-layer: int8 convs with
   f32 dequant→bias→relu→requant epilogues (XLA fuses these into the conv),
   residual adds in f32, int8 max-pool, f32 head.

**The stem is exact** (up to weight rounding): a normalized ImageNet image
takes only 256 distinct values per channel — ``(k/255 − mean_c)/std_c`` for
k∈[0,255] — so feeding ``k−128`` as int8 and folding ``1/(255·std_c)`` into
the stem weights loses nothing. The channel mean shift becomes a bias term;
zero-padding of the normalized image corresponds to padding ``k−128`` with
``round(255·mean_c−128)`` (error ≤0.5 raw levels, borders only).

The reference has no quantized path; this is a TPU-native addition. Eval
semantics parity is asserted by tests/test_quantize.py (folded-float ==
BN-float exactly; int8 argmax agreement + logit cosine vs float).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.resnet import Bottleneck, ResNet
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    maxpool_i8,
    quantize_weight_per_channel,
    requantize,
)


# --------------------------------------------------------------------------
# Architecture walk (mirrors ResNet.__call__ exactly)
# --------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class _ConvSpec:
    name: str  # param-tree path, e.g. "layer2_0/Conv_1"
    bn: str  # matching BN path
    stride: int
    pad: int
    groups: int
    site_in: str  # activation-scale site feeding this conv


@dataclasses.dataclass(frozen=True)
class _BlockSpec:
    name: str
    convs: tuple  # _ConvSpec... main path, in order
    downsample: Any  # _ConvSpec | None
    site_in: str
    site_out: str


def _resnet_spec(module: ResNet):
    """Flat block list + requant-site names for a ResNet module."""
    is_bottleneck = module.block is Bottleneck
    blocks = []
    cur_site = "stem"
    for stage, num_blocks in enumerate(module.stage_sizes):
        for i in range(num_blocks):
            name = f"layer{stage + 1}_{i}"
            stride = 2 if (stage > 0 and i == 0) else 1
            needs_ds = i == 0 and (stride != 1 or (stage == 0 and is_bottleneck))
            if is_bottleneck:
                convs = (
                    _ConvSpec(f"{name}/Conv_0", f"{name}/bn1", 1, 0, 1, cur_site),
                    _ConvSpec(
                        f"{name}/Conv_1",
                        f"{name}/bn2",
                        stride,
                        1,
                        module.groups,
                        f"{name}.a1",
                    ),
                    _ConvSpec(
                        f"{name}/Conv_2", f"{name}/bn3", 1, 0, 1, f"{name}.a2"
                    ),
                )
            else:
                convs = (
                    _ConvSpec(f"{name}/Conv_0", f"{name}/bn1", stride, 1, 1, cur_site),
                    _ConvSpec(
                        f"{name}/Conv_1", f"{name}/bn2", 1, 1, 1, f"{name}.a1"
                    ),
                )
            ds = (
                _ConvSpec(
                    f"{name}/downsample_conv",
                    f"{name}/downsample_bn",
                    stride,
                    0,
                    1,
                    cur_site,
                )
                if needs_ds
                else None
            )
            blocks.append(
                _BlockSpec(name, convs, ds, cur_site, f"{name}.out")
            )
            cur_site = f"{name}.out"
    return blocks, cur_site  # cur_site = head input site


def _get(tree, path):
    node = tree
    for part in path.split("/"):
        node = node[part]
    return node


# --------------------------------------------------------------------------
# BN folding
# --------------------------------------------------------------------------


def _fold_all(variables, module: ResNet):
    """Fold every conv+BN pair → ({path: {"w","b"}}, blocks, head_site)."""
    params, stats = variables["params"], variables["batch_stats"]
    blocks, head_site = _resnet_spec(module)
    folded = {}

    def fold(conv_path, bn_path, kernel):
        bn_p, bn_s = _get(params, bn_path), _get(stats, bn_path)
        w, b = fold_conv_bn(
            kernel, bn_p["scale"], bn_p["bias"], bn_s["mean"], bn_s["var"]
        )
        folded[conv_path] = {"w": w, "b": b}

    fold("stem", "bn1", params["conv1_kernel"])
    for blk in blocks:
        for c in blk.convs:
            fold(c.name, c.bn, _get(params, c.name)["kernel"])
        if blk.downsample is not None:
            d = blk.downsample
            fold(d.name, d.bn, _get(params, d.name)["kernel"])
    return folded, blocks, head_site


# --------------------------------------------------------------------------
# Calibration forward (folded float, records amax per requant site)
# --------------------------------------------------------------------------


def _calib_forward(folded, blocks, head_site, x_norm):
    def conv_f(x, spec_or_name, stride, pad, groups):
        e = folded[spec_or_name]
        pad = [(pad, pad), (pad, pad)] if isinstance(pad, int) else pad
        return (
            jax.lax.conv_general_dilated(
                x,
                e["w"],
                (stride, stride),
                pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            )
            + e["b"]
        )

    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    x = jax.nn.relu(conv_f(x_norm, "stem", 2, 3, 1))
    x = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=[(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    record("stem", x)
    for blk in blocks:
        identity = x
        for j, c in enumerate(blk.convs):
            x = conv_f(x, c.name, c.stride, c.pad, c.groups)
            if j < len(blk.convs) - 1:
                x = record(f"{blk.name}.a{j + 1}", jax.nn.relu(x))
        if blk.downsample is not None:
            d = blk.downsample
            identity = conv_f(identity, d.name, d.stride, d.pad, d.groups)
        x = record(blk.site_out, jax.nn.relu(x + identity))
    return x, amax


# --------------------------------------------------------------------------
# int8 forward
# --------------------------------------------------------------------------


def _int8_forward(qp, blocks, head_site, fc, x_i8, stem_pad_vals):
    """x_i8: (B,H,W,3) int8 = uint8_grid − 128."""

    def qconv(a_i8, name, stride, pad, groups, s_in):
        e = qp[name]
        y = conv_i8(a_i8, e["w"], stride, pad, groups).astype(jnp.float32)
        return y * (s_in * e["sw"]) + e["b"]

    # exact stem: explicit per-channel padding (VALID conv); 1/(255·std) and
    # the mean shift are folded into qp["stem"]'s weights/bias at build time
    b = x_i8.shape[0]
    pad_c = jnp.asarray(stem_pad_vals, jnp.int8)
    x_p = jnp.pad(x_i8, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h, w = x_p.shape[1], x_p.shape[2]
    border = jnp.zeros((h, w, 1), jnp.int8)
    border = border.at[3:-3, 3:-3, :].set(1)
    x_p = x_p * border + pad_c * (1 - border)
    e = qp["stem"]
    y = conv_i8(x_p, e["w"], 2, [(0, 0), (0, 0)], 1).astype(jnp.float32)
    y = jax.nn.relu(y * e["sw"] + e["b"])
    a = maxpool_i8(requantize(y, qp["inv_scale"]["stem"]))

    for blk in blocks:
        id_i8 = a
        s_in = qp["scale"][blk.site_in]
        for j, c in enumerate(blk.convs):
            s = qp["scale"][c.site_in]
            y = qconv(a if j else id_i8, c.name, c.stride, c.pad, c.groups, s)
            if j < len(blk.convs) - 1:
                site = f"{blk.name}.a{j + 1}"
                a = requantize(jax.nn.relu(y), qp["inv_scale"][site])
        if blk.downsample is not None:
            d = blk.downsample
            identity = qconv(id_i8, d.name, d.stride, d.pad, d.groups, s_in)
        else:
            identity = id_i8.astype(jnp.float32) * s_in
        a = requantize(jax.nn.relu(y + identity), qp["inv_scale"][blk.site_out])

    x = a.astype(jnp.float32) * qp["scale"][head_site]
    x = jnp.mean(x, axis=(1, 2))
    return x @ fc["kernel"] + fc["bias"]


# --------------------------------------------------------------------------
# Public API
# --------------------------------------------------------------------------


@dataclasses.dataclass
class QuantizedClassifier:
    """int8 eval-only classifier. Call with uint8 NHWC images (or [0,1]
    floats, which are rounded onto the uint8 grid — the grid the corruption
    pipeline already quantizes to)."""

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
        fc = qparams["fc"]
        return _int8_forward(
            qparams, self.blocks, self.head_site, fc, x_i8, self.stem_pad_vals
        )

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_classifier(
    clf,
    calib_images,
    calib_batch_size: int = 64,
) -> QuantizedClassifier:
    """Build the int8 eval path from a float :class:`Classifier`.

    ``calib_images``: uint8 (N,H,W,3) — a few hundred images from the eval
    distribution (corrupted, if evaluating corruptions) drive the activation
    scales. N is cropped to a multiple of the calibration batch.
    """
    module = clf.module
    if not isinstance(module, ResNet):
        raise ValueError(
            f"int8 quantization currently supports the ResNet family; "
            f"got {type(module).__name__}"
        )
    if module.stem_s2d:
        raise ValueError("quantize_classifier expects stem_s2d=False")

    folded, blocks, head_site = _fold_all(clf.variables, module)

    # --- calibrate activation scales on the folded float net; folded
    # weights ride as jit ARGUMENTS — closure constants would be baked into
    # the compile payload, which the axon relay caps (HTTP 413 on ViT-scale)
    calib_fn = jax.jit(
        lambda f, x: _calib_forward(f, blocks, head_site, x)[1]
    )
    images = np.asarray(calib_images)
    n = max(len(images) // calib_batch_size, 1)
    amax = None
    for i in range(n):
        batch = images[i * calib_batch_size : (i + 1) * calib_batch_size]
        x01 = jnp.asarray(batch, jnp.float32) / 255.0
        stats = calib_fn(folded, normalize_01(x01, clf.mean, clf.std))
        amax = stats if amax is None else jax.tree.map(jnp.maximum, amax, stats)
    scale = {k: jnp.maximum(v, 1e-12) / 127.0 for k, v in amax.items()}

    # --- quantize weights; stem gets the exact uint8-grid folding
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0  # x_norm = (x_q − offs_c)/(255·std_c)
    qp = {"scale": scale, "inv_scale": {k: 1.0 / v for k, v in scale.items()}}

    stem_w = folded["stem"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = folded["stem"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["stem"] = {"w": w_q, "sw": sw, "b": stem_b}

    for blk in blocks:
        specs = blk.convs + ((blk.downsample,) if blk.downsample else ())
        for c in specs:
            w_q, sw = quantize_weight_per_channel(folded[c.name]["w"])
            qp[c.name] = {"w": w_q, "sw": sw, "b": folded[c.name]["b"]}

    qp["fc"] = {
        "kernel": clf.variables["params"]["fc"]["kernel"],
        "bias": clf.variables["params"]["fc"]["bias"],
    }

    return QuantizedClassifier(
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
