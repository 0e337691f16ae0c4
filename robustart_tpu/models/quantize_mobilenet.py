"""int8 post-training quantization of MobileNetV2 for TPU eval.

Third int8 family next to ResNet (models/quantize.py) and ViT
(models/quantize_vit.py) — MobileNet is the canonical int8 deployment
architecture. Same recipe: BN folding (exact), symmetric per-output-channel
int8 weights (incl. depthwise convs), calibrated per-tensor activation
scales, relu6 in the f32 epilogue, exact int8 stem via the uint8-grid
folding (3×3/2 stem, 1-pixel per-channel border pad).

Mirrors ``MobileNetV2.__call__`` (robustart_tpu/models/mobilenet.py)
layer-for-layer; parity asserted by tests/test_quantize_mobilenet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.mobilenet import MobileNetV2, make_divisible
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    quantize_weight_per_channel,
    requantize,
)

_SETTINGS = [  # (t, c, n, s) — mobilenet.py:91-95
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


@dataclasses.dataclass(frozen=True)
class _Conv:
    name: str  # param path, e.g. "InvertedResidualV2_3/ConvBNAct_0"
    stride: int
    pad: int
    groups: int
    relu6: bool
    site_in: str


@dataclasses.dataclass(frozen=True)
class _Block:
    convs: tuple
    residual: bool
    site_in: str
    site_out: str


def _v2_spec(module: MobileNetV2):
    """Flat conv/block walk mirroring MobileNetV2.__call__."""
    s = module.scale
    blocks = []
    cur_site = "stem"
    inp = make_divisible(32 * s)
    bi = 0
    for t, c, n, stride0 in _SETTINGS:
        out_c = make_divisible(c * s)
        for i in range(n):
            stride = stride0 if i == 0 else 1
            hidden = int(round(inp * t))
            pre = f"InvertedResidualV2_{bi}"
            convs = []
            ci = 0
            site = cur_site
            if t != 1:
                convs.append(_Conv(f"{pre}/ConvBNAct_{ci}", 1, 0, 1, True, site))
                site = f"b{bi}.a{ci}"
                ci += 1
            convs.append(
                _Conv(f"{pre}/ConvBNAct_{ci}", stride, 1, hidden, True, site)
            )
            site = f"b{bi}.a{ci}"
            ci += 1
            convs.append(_Conv(f"{pre}/ConvBNAct_{ci}", 1, 0, 1, False, site))
            residual = stride == 1 and inp == out_c
            blocks.append(
                _Block(tuple(convs), residual, cur_site, f"b{bi}.out")
            )
            cur_site = f"b{bi}.out"
            inp = out_c
            bi += 1
    return blocks, cur_site  # head conv consumes cur_site


def _fold_all(variables, module: MobileNetV2):
    params, stats = variables["params"], variables["batch_stats"]
    blocks, head_site = _v2_spec(module)
    folded = {}

    def fold(path):
        node_p, node_s = params, stats
        for part in path.split("/"):
            node_p = node_p[part]
            node_s = node_s[part]
        w, b = fold_conv_bn(
            node_p["Conv_0"]["kernel"],
            node_p["BatchNorm_0"]["scale"], node_p["BatchNorm_0"]["bias"],
            node_s["BatchNorm_0"]["mean"], node_s["BatchNorm_0"]["var"],
            eps=1e-3,  # mobilenet BN eps (mobilenet.py:55)
        )
        folded[path] = {"w": w, "b": b}

    fold("ConvBNAct_0")  # stem
    for blk in blocks:
        for c in blk.convs:
            fold(c.name)
    fold("ConvBNAct_1")  # head conv
    return folded, blocks, head_site


def _forward(qp, blocks, head_site, x, *, mode: str):
    """mode='calib': x is the normalized f32 image, float weights, returns
    (features, amax). mode='int8': x is the uint8−128 int8 grid."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def act6(y, on):
        return jnp.clip(y, 0.0, 6.0) if on else y

    def conv(a, spec_name, stride, pad, groups, relu6_on, s_in):
        e = qp[spec_name]
        if mode == "calib":
            pad_ = [(pad, pad), (pad, pad)]
            y = jax.lax.conv_general_dilated(
                a, e["w"], (stride, stride), pad_,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups,
            ) + e["b"]
            return act6(y, relu6_on)
        a_i8 = requantize(a, qp["inv_scale"][s_in]) if a.dtype != jnp.int8 else a
        y = conv_i8(a_i8, e["w"], stride, pad, groups).astype(jnp.float32)
        y = y * (qp["scale"][s_in] * e["sw"]) + e["b"]
        return act6(y, relu6_on)

    # exact int8 stem: per-channel border pad, VALID conv (quantize.py scheme)
    e = qp["ConvBNAct_0"]
    if mode == "calib":
        x = act6(
            jax.lax.conv_general_dilated(
                x, e["w"], (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + e["b"],
            True,
        )
        x = record("stem", x)
    else:
        pad_c = jnp.asarray(qp["stem_pad_vals"], jnp.int8)
        x_p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = x_p.shape[1], x_p.shape[2]
        border = jnp.zeros((h, w, 1), jnp.int8).at[1:-1, 1:-1, :].set(1)
        x_p = x_p * border + pad_c * (1 - border)
        y = conv_i8(x_p, e["w"], 2, [(0, 0), (0, 0)], 1).astype(jnp.float32)
        y = act6(y * e["sw"] + e["b"], True)
        x = requantize(y, qp["inv_scale"]["stem"])

    for bi, blk in enumerate(blocks):
        identity = x
        for j, c in enumerate(blk.convs):
            x = conv(x, c.name, c.stride, c.pad, c.groups, c.relu6, c.site_in)
            if j < len(blk.convs) - 1:
                nxt = blk.convs[j + 1].site_in
                if mode == "calib":
                    x = record(nxt, x)
                else:
                    x = requantize(x, qp["inv_scale"][nxt])
        if blk.residual:
            if mode == "calib":
                x = x + identity
            else:
                x = x + identity.astype(jnp.float32) * qp["scale"][blk.site_in]
        if mode == "calib":
            x = record(blk.site_out, x)
        else:
            x = requantize(x, qp["inv_scale"][blk.site_out])

    hc = qp["ConvBNAct_1"]
    if mode == "calib":
        y = jax.lax.conv_general_dilated(
            x, hc["w"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + hc["b"]
        feats = act6(y, True)
    else:
        x_i8 = x
        y = conv_i8(x_i8, hc["w"], 1, 0, 1).astype(jnp.float32)
        feats = act6(y * (qp["scale"][head_site] * hc["sw"]) + hc["b"], True)
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = pooled @ qp["classifier"]["w"] + qp["classifier"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedMobileNetV2:
    name: str
    qparams: Any
    blocks: Any
    head_site: str
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
            qparams, self.blocks, self.head_site, x_i8, mode="int8"
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_mobilenet_v2(
    clf, calib_images, calib_batch_size: int = 64
) -> QuantizedMobileNetV2:
    module = clf.module
    if not isinstance(module, MobileNetV2):
        raise ValueError(
            f"quantize_mobilenet_v2 supports MobileNetV2; got "
            f"{type(module).__name__}"
        )
    folded, blocks, head_site = _fold_all(clf.variables, module)
    qp: dict = dict(folded)
    p = clf.variables["params"]
    qp["classifier"] = {
        "w": np.asarray(p["classifier"]["kernel"], np.float32),
        "b": np.asarray(p["classifier"]["bias"], np.float32),
    }

    calib_fn = jax.jit(
        lambda f, x: _forward(f, blocks, head_site, x, mode="calib")[1]
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
    stem_w = folded["ConvBNAct_0"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = folded["ConvBNAct_0"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["ConvBNAct_0"] = {"w": w_q, "sw": sw, "b": stem_b}
    qp["stem_pad_vals"] = tuple(int(round(v)) for v in offs)

    for key in [c.name for blk in blocks for c in blk.convs] + ["ConvBNAct_1"]:
        w_q, sw = quantize_weight_per_channel(folded[key]["w"])
        qp[key] = {"w": w_q, "sw": sw, "b": folded[key]["b"]}

    return QuantizedMobileNetV2(
        name=f"{clf.name}@int8",
        qparams=qp,
        blocks=blocks,
        head_site=head_site,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
