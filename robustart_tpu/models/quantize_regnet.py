"""int8 post-training quantization of RegNetX/Y for TPU eval.

Sixth int8 family. RegNet is the friendliest case: every conv is followed
by BN (exact fold, eps 1e-5 per models/regnet.py) with ReLU epilogues;
grouped 3×3 convs quantize like depthwise ones (per-output-channel weight
scales). RegNetY's squeeze-excite stays float (two 1×1 convs on the
pooled vector), with the SE-scaled activation requantized before conv3.
Exact uint8-grid int8 stem (3×3 stride 2, 1-pixel per-channel border
pad — models/quantize.py scheme).

Mirrors ``RegNetX.__call__``/``XBlock.__call__`` (models/regnet.py)
layer-for-layer; parity asserted by tests/test_quantize_regnet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.regnet import RegNetX, generate_widths
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    quantize_weight_per_channel,
    requantize,
)


@dataclasses.dataclass(frozen=True)
class _Block:
    name: str  # "s{i}_b{j}"
    features: int
    stride: int
    groups: int
    has_proj: bool
    has_se: bool
    site_in: str
    site_out: str


def _regnet_spec(module: RegNetX, in_width: int = 32):
    widths, depths = generate_widths(
        module.w0, module.wa, module.wm, module.depth, module.group_width
    )
    blocks = []
    cur_site = "stem"
    cur_w = in_width
    for si, (w, d) in enumerate(zip(widths, depths)):
        for bi in range(d):
            stride = 2 if bi == 0 else 1
            name = f"s{si + 1}_b{bi + 1}"
            blocks.append(_Block(
                name, w, stride,
                groups=max(1, w // module.group_width),
                has_proj=(stride != 1 or cur_w != w),
                has_se=module.se_ratio > 0,
                site_in=cur_site, site_out=f"{name}.out",
            ))
            cur_site = f"{name}.out"
            cur_w = w
    return blocks


def _fold_all(variables, module: RegNetX):
    params, stats = variables["params"], variables["batch_stats"]
    blocks = _regnet_spec(module)
    folded = {}

    def fold(conv_path, bn_path):
        def node(tree, path):
            for part in path.split("/"):
                tree = tree[part]
            return tree

        p_bn, s_bn = node(params, bn_path), node(stats, bn_path)
        w, b = fold_conv_bn(
            node(params, conv_path)["kernel"],
            p_bn["scale"], p_bn["bias"], s_bn["mean"], s_bn["var"], eps=1e-5,
        )
        folded[conv_path] = {"w": w, "b": b}

    fold("stem_conv", "stem_bn")
    for blk in blocks:
        for ci in (1, 2, 3):
            fold(f"{blk.name}/conv{ci}", f"{blk.name}/bn{ci}")
        if blk.has_proj:
            fold(f"{blk.name}/proj", f"{blk.name}/proj_bn")
    return folded, blocks


def _forward(qp, blocks, x, *, mode: str):
    """mode='calib': x = normalized f32 image; mode='int8': uint8−128.

    The head (global pool + fc) runs f32 on the un-requantized final
    residual — no head scale exists by design."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def conv(a, name, stride, pad, groups, s_in, relu):
        e = qp[name]
        if mode == "calib":
            y = jax.lax.conv_general_dilated(
                a, e["w"], (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ) + e["b"]
            return jax.nn.relu(y) if relu else y
        a_i8 = (
            requantize(a, qp["inv_scale"][s_in])
            if a.dtype != jnp.int8 else a
        )
        y = conv_i8(a_i8, e["w"], stride, pad, groups).astype(jnp.float32)
        y = y * (qp["scale"][s_in] * e["sw"]) + e["b"]
        return jax.nn.relu(y) if relu else y

    # exact int8 stem (3×3 stride 2, pad 1)
    e = qp["stem_conv"]
    if mode == "calib":
        x = jax.nn.relu(
            jax.lax.conv_general_dilated(
                x, e["w"], (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + e["b"]
        )
        x = record("stem", x)
    else:
        pad_c = jnp.asarray(qp["stem_pad_vals"], jnp.int8)
        x_p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = x_p.shape[1], x_p.shape[2]
        border = jnp.zeros((h, w, 1), jnp.int8).at[1:-1, 1:-1, :].set(1)
        x_p = x_p * border + pad_c * (1 - border)
        y = conv_i8(x_p, e["w"], 2, [(0, 0), (0, 0)], 1).astype(jnp.float32)
        x = jax.nn.relu(y * e["sw"] + e["b"])  # f32; requant per conv input

    for blk in blocks:
        pre = blk.name
        identity = x
        out = conv(x, f"{pre}/conv1", 1, 0, 1, blk.site_in, True)
        site = f"{pre}.a1"
        out = record(site, out) if mode == "calib" else requantize(
            out, qp["inv_scale"][site]
        )
        out = conv(out, f"{pre}/conv2", blk.stride, 1, blk.groups, site, True)
        if blk.has_se:
            se = qp[f"{pre}/se"]
            s = jnp.mean(out, axis=(1, 2), keepdims=True)
            s = jax.nn.relu(jax.lax.conv_general_dilated(
                s, se["rw"], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + se["rb"])
            s = jax.nn.sigmoid(jax.lax.conv_general_dilated(
                s, se["ew"], (1, 1), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + se["eb"])
            out = out * s
        site = f"{pre}.a2"
        out = record(site, out) if mode == "calib" else requantize(
            out, qp["inv_scale"][site]
        )
        out = conv(out, f"{pre}/conv3", 1, 0, 1, site, False)
        if blk.has_proj:
            identity = conv(
                identity, f"{pre}/proj", blk.stride, 0, 1, blk.site_in, False
            )
        x = jax.nn.relu(out + identity)
        if mode == "calib":
            x = record(blk.site_out, x)

    pooled = jnp.mean(x, axis=(1, 2))
    logits = pooled @ qp["fc"]["w"] + qp["fc"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedRegNet:
    name: str
    qparams: Any
    blocks: Any
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
        logits, _ = _forward(
            qparams, self.blocks, x_i8, mode="int8"
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_regnet(clf, calib_images, calib_batch_size: int = 64):
    module = clf.module
    if not isinstance(module, RegNetX):
        raise ValueError(
            f"quantize_regnet supports RegNetX/Y; got {type(module).__name__}"
        )
    folded, blocks = _fold_all(clf.variables, module)
    qp: dict = dict(folded)
    p = clf.variables["params"]
    qp["fc"] = {
        "w": np.asarray(p["fc"]["kernel"], np.float32),
        "b": np.asarray(p["fc"]["bias"], np.float32),
    }
    for blk in blocks:
        if blk.has_se:
            b = p[blk.name]
            qp[f"{blk.name}/se"] = {
                "rw": np.asarray(b["se_reduce"]["kernel"], np.float32),
                "rb": np.asarray(b["se_reduce"]["bias"], np.float32),
                "ew": np.asarray(b["se_expand"]["kernel"], np.float32),
                "eb": np.asarray(b["se_expand"]["bias"], np.float32),
            }

    calib_fn = jax.jit(
        lambda f, x: _forward(f, blocks, x, mode="calib")[1]
    )
    images = np.asarray(calib_images)
    n = max(len(images) // calib_batch_size, 1)
    amax = None
    for i in range(n):
        batch = images[i * calib_batch_size : (i + 1) * calib_batch_size]
        x01 = jnp.asarray(batch, jnp.float32) / 255.0
        stats = calib_fn(qp, normalize_01(x01, clf.mean, clf.std))
        amax = stats if amax is None else jax.tree.map(jnp.maximum, amax, stats)
    scale = {k: float(np.maximum(v, 1e-12)) / 127.0 for k, v in amax.items()}
    qp["scale"] = scale
    qp["inv_scale"] = {k: 1.0 / v for k, v in scale.items()}

    # exact uint8-grid stem folding
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    stem_w = folded["stem_conv"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = folded["stem_conv"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["stem_conv"] = {"w": w_q, "sw": sw, "b": stem_b}
    qp["stem_pad_vals"] = tuple(int(round(v)) for v in offs)

    conv_keys = []
    for blk in blocks:
        conv_keys += [f"{blk.name}/conv{ci}" for ci in (1, 2, 3)]
        if blk.has_proj:
            conv_keys.append(f"{blk.name}/proj")
    for key in conv_keys:
        w_q, sw = quantize_weight_per_channel(folded[key]["w"])
        qp[key] = {"w": w_q, "sw": sw, "b": folded[key]["b"]}

    return QuantizedRegNet(
        name=f"{clf.name}@int8",
        qparams=qp,
        blocks=blocks,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
