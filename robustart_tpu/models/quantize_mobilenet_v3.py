"""int8 post-training quantization of MobileNetV3 (large/small) for TPU eval.

Twelfth int8 family — closes the zoo: every reference `model.type` family
(exprs/robust_baseline_exp/mobilenet_v3/*/config.yaml: scale ∈ {0.35…1.4},
mode large) now has an int8 eval path. Same recipe as
models/quantize_mobilenet.py (V2): BN folding (exact, eps 1e-3 per
models/mobilenet.py::ConvBNAct), symmetric per-output-channel int8 weights
(incl. the k×k depthwise convs), calibrated per-tensor activation scales,
exact int8 stem via the uint8-grid folding.

MobileNetV3-specific pieces:

- **hardswish / relu epilogues**: per-block activation from the torchvision
  table (models/mobilenet.py:157-187) runs in the f32 epilogue after dequant
  (XLA fuses it into the conv consumer).
- **Squeeze-excite stays float**: relu → hardsigmoid gate on the (N,1,1,C)
  pooled vector (models/mobilenet.py:112-124) — negligible FLOPs, kept exact
  in f32; the SE-scaled activation is requantized before the int8 project
  conv. Blocks without SE requantize the depthwise activation directly.
- **f32 head**: global pool → pre_classifier Dense + hardswish → classifier
  Dense mirror models/mobilenet.py:210-217 exactly (tiny matmuls, no quant).

Mirrors ``MobileNetV3.__call__`` layer-for-layer; parity asserted by
tests/test_quantize_mobilenet_v3.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import hardsigmoid, hardswish, normalize_01
from robustart_tpu.models.mobilenet import (
    _V3_LARGE,
    _V3_SMALL,
    MobileNetV3,
    make_divisible,
)
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    quantize_weight_per_channel,
    requantize,
)


@dataclasses.dataclass(frozen=True)
class _Conv:
    name: str  # param path, e.g. "InvertedResidualV3_3/ConvBNAct_0"
    stride: int
    pad: int
    groups: int
    act: str | None  # "hs" | "relu" | None
    site_in: str


@dataclasses.dataclass(frozen=True)
class _Block:
    name: str  # "InvertedResidualV3_i"
    convs: tuple  # expand?, depthwise, project — in call order
    use_se: bool
    proj_in_site: str  # requant site feeding the project conv
    residual: bool
    site_in: str
    site_out: str


def _v3_spec(module: MobileNetV3):
    """Flat block walk mirroring MobileNetV3.__call__ (mobilenet.py:197-217)."""
    table = _V3_LARGE if module.mode == "large" else _V3_SMALL
    s = module.scale
    blocks = []
    cur_site = "stem"
    inp = make_divisible(16 * s)
    for bi, (k, exp, out, use_se, use_hs, stride) in enumerate(table):
        expanded = make_divisible(exp * s)
        out_c = make_divisible(out * s)
        act = "hs" if use_hs else "relu"
        pre = f"InvertedResidualV3_{bi}"
        convs = []
        ci = 0
        site = cur_site
        if expanded != inp:  # expand 1×1 present iff widths differ
            convs.append(_Conv(f"{pre}/ConvBNAct_{ci}", 1, 0, 1, act, site))
            site = f"b{bi}.a{ci}"
            ci += 1
        convs.append(
            _Conv(f"{pre}/ConvBNAct_{ci}", stride, (k - 1) // 2, expanded,
                  act, site)
        )
        ci += 1
        proj_in = f"b{bi}.se" if use_se else f"b{bi}.dw"
        convs.append(_Conv(f"{pre}/ConvBNAct_{ci}", 1, 0, 1, None, proj_in))
        blocks.append(
            _Block(
                pre, tuple(convs), use_se, proj_in,
                residual=(stride == 1 and inp == out_c),
                site_in=cur_site, site_out=f"b{bi}.out",
            )
        )
        cur_site = f"b{bi}.out"
        inp = out_c
    return blocks, cur_site  # head conv consumes cur_site


def _fold_all(variables, module: MobileNetV3):
    params, stats = variables["params"], variables["batch_stats"]
    blocks, head_site = _v3_spec(module)
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
        for cv in blk.convs:
            fold(cv.name)
    fold("ConvBNAct_1")  # head conv
    return folded, blocks, head_site


def _act(y, kind):
    if kind == "hs":
        return hardswish(y)
    if kind == "relu":
        return jax.nn.relu(y)
    return y


def _se_branch(qp, blk_name, out_f32):
    """Float squeeze-excite (mobilenet.py:112-124): relu bottleneck +
    hardsigmoid gate."""
    se = qp[f"{blk_name}/se"]
    s = jnp.mean(out_f32, axis=(1, 2), keepdims=True)
    s = jax.lax.conv_general_dilated(
        s, se["rw"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["rb"]
    s = jax.nn.relu(s)
    s = jax.lax.conv_general_dilated(
        s, se["ew"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["eb"]
    return out_f32 * hardsigmoid(s)


def _forward(qp, blocks, head_site, x, *, mode: str):
    """mode='calib': x = normalized f32 image (records amax per site);
    mode='int8': x = uint8−128 int8 grid."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def conv(a, cv: _Conv):
        e = qp[cv.name]
        pad_ = [(cv.pad, cv.pad), (cv.pad, cv.pad)]
        if mode == "calib":
            y = jax.lax.conv_general_dilated(
                a, e["w"], (cv.stride, cv.stride), pad_,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=cv.groups,
            ) + e["b"]
            return _act(y, cv.act)
        a_i8 = (
            requantize(a, qp["inv_scale"][cv.site_in])
            if a.dtype != jnp.int8 else a
        )
        y = conv_i8(a_i8, e["w"], cv.stride, cv.pad, cv.groups).astype(
            jnp.float32
        )
        y = y * (qp["scale"][cv.site_in] * e["sw"]) + e["b"]
        return _act(y, cv.act)

    # exact int8 stem (3×3 stride 2, pad 1, hardswish): per-channel border
    # pad + VALID conv on the uint8−128 grid (models/quantize.py scheme)
    e = qp["ConvBNAct_0"]
    if mode == "calib":
        x = _act(
            jax.lax.conv_general_dilated(
                x, e["w"], (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + e["b"],
            "hs",
        )
        x = record("stem", x)
    else:
        pad_c = jnp.asarray(qp["stem_pad_vals"], jnp.int8)
        x_p = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = x_p.shape[1], x_p.shape[2]
        border = jnp.zeros((h, w, 1), jnp.int8).at[1:-1, 1:-1, :].set(1)
        x_p = x_p * border + pad_c * (1 - border)
        y = conv_i8(x_p, e["w"], 2, [(0, 0), (0, 0)], 1).astype(jnp.float32)
        y = _act(y * e["sw"] + e["b"], "hs")
        x = requantize(y, qp["inv_scale"]["stem"])

    for blk in blocks:
        identity = x
        for j, cv in enumerate(blk.convs[:-1]):
            x = conv(x, cv)
            if j < len(blk.convs) - 2:
                # expand → depthwise requant boundary
                nxt = blk.convs[j + 1].site_in
                x = record(nxt, x) if mode == "calib" else requantize(
                    x, qp["inv_scale"][nxt]
                )
        # x = depthwise activation in f32; SE (if any) stays float
        if blk.use_se:
            x = _se_branch(qp, blk.name, x)
        x = record(blk.proj_in_site, x) if mode == "calib" else x
        x = conv(x, blk.convs[-1])  # project (no act)
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
        feats = _act(y, "hs")
    else:
        y = conv_i8(x, hc["w"], 1, 0, 1).astype(jnp.float32)
        feats = _act(y * (qp["scale"][head_site] * hc["sw"]) + hc["b"], "hs")
    pooled = jnp.mean(feats, axis=(1, 2))
    pre = _act(pooled @ qp["pre_classifier"]["w"] + qp["pre_classifier"]["b"],
               "hs")
    logits = pre @ qp["classifier"]["w"] + qp["classifier"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedMobileNetV3:
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


def quantize_mobilenet_v3(
    clf, calib_images, calib_batch_size: int = 64
) -> QuantizedMobileNetV3:
    module = clf.module
    if not isinstance(module, MobileNetV3):
        raise ValueError(
            f"quantize_mobilenet_v3 supports MobileNetV3; got "
            f"{type(module).__name__}"
        )
    folded, blocks, head_site = _fold_all(clf.variables, module)
    qp: dict = dict(folded)
    p = clf.variables["params"]
    qp["pre_classifier"] = {
        "w": np.asarray(p["pre_classifier"]["kernel"], np.float32),
        "b": np.asarray(p["pre_classifier"]["bias"], np.float32),
    }
    qp["classifier"] = {
        "w": np.asarray(p["classifier"]["kernel"], np.float32),
        "b": np.asarray(p["classifier"]["bias"], np.float32),
    }
    for blk in blocks:
        if not blk.use_se:
            continue
        se = p[blk.name]["SqueezeExcite_0"]
        qp[f"{blk.name}/se"] = {
            "rw": np.asarray(se["fc1"]["kernel"], np.float32),
            "rb": np.asarray(se["fc1"]["bias"], np.float32),
            "ew": np.asarray(se["fc2"]["kernel"], np.float32),
            "eb": np.asarray(se["fc2"]["bias"], np.float32),
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

    # exact uint8-grid stem folding (models/quantize.py docstring)
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

    for key in (
        [cv.name for blk in blocks for cv in blk.convs] + ["ConvBNAct_1"]
    ):
        w_q, sw = quantize_weight_per_channel(folded[key]["w"])
        qp[key] = {"w": w_q, "sw": sw, "b": folded[key]["b"]}

    return QuantizedMobileNetV3(
        name=f"{clf.name}@int8",
        qparams=qp,
        blocks=blocks,
        head_site=head_site,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
