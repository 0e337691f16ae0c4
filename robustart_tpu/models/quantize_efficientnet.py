"""int8 post-training quantization of EfficientNet for TPU eval.

Fourth int8 family (VERDICT r2 #6) next to ResNet / ViT / MobileNetV2.
Same recipe as models/quantize_mobilenet.py: BN folding (exact, eps 1e-3
per models/efficientnet.py::_ConvBNSiLU), symmetric per-output-channel int8
weights (incl. the k×k depthwise convs), calibrated per-tensor activation
scales, exact int8 stem via the uint8-grid folding.

EfficientNet-specific pieces:

- **SiLU epilogues**: activations are x·sigmoid(x), computed in the f32
  epilogue after dequant (XLA fuses them into the conv consumer).
- **Squeeze-excite stays float**: the SE branch is two 1×1 convs on the
  (N,1,1,C) pooled vector — negligible FLOPs, kept exact in f32; the
  SE-scaled activation is requantized before the int8 project conv.

Mirrors ``EfficientNet.__call__`` (models/efficientnet.py:112-134)
layer-for-layer; parity asserted by tests/test_quantize_efficientnet.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.efficientnet import _BASE_BLOCKS, EfficientNet
from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.mobilenet import make_divisible
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    quantize_weight_per_channel,
    requantize,
)


@dataclasses.dataclass(frozen=True)
class _Conv:
    name: str  # param path, e.g. "MBConv_3/_ConvBNSiLU_0"
    stride: int
    pad: int
    groups: int
    silu: bool
    site_in: str


@dataclasses.dataclass(frozen=True)
class _Block:
    name: str  # "MBConv_i"
    convs: tuple  # expand? , depthwise, project — in call order
    se_site: str  # requant site feeding the project conv (post-SE)
    residual: bool
    site_in: str
    site_out: str


def _eff_spec(module: EfficientNet):
    """Flat block walk mirroring EfficientNet.__call__."""

    def c(ch):
        return make_divisible(ch * module.width_mult)

    def d(n):
        return int(math.ceil(n * module.depth_mult))

    blocks = []
    cur_site = "stem"
    inp = c(32)
    bi = 0
    for expand, ch, repeats, stride0, kernel in _BASE_BLOCKS:
        out_c = c(ch)
        for i in range(d(repeats)):
            stride = stride0 if i == 0 else 1
            hidden = inp * expand
            pre = f"MBConv_{bi}"
            convs = []
            ci = 0
            site = cur_site
            if expand != 1:
                convs.append(
                    _Conv(f"{pre}/_ConvBNSiLU_{ci}", 1, 0, 1, True, site)
                )
                site = f"b{bi}.a{ci}"
                ci += 1
            convs.append(
                _Conv(f"{pre}/_ConvBNSiLU_{ci}", stride, (kernel - 1) // 2,
                      hidden, True, site)
            )
            ci += 1
            convs.append(
                _Conv(f"{pre}/_ConvBNSiLU_{ci}", 1, 0, 1, False, f"b{bi}.se")
            )
            blocks.append(
                _Block(
                    pre, tuple(convs), f"b{bi}.se",
                    residual=(stride == 1 and inp == out_c),
                    site_in=cur_site, site_out=f"b{bi}.out",
                )
            )
            cur_site = f"b{bi}.out"
            inp = out_c
            bi += 1
    return blocks, cur_site


def _fold_all(variables, module: EfficientNet):
    params, stats = variables["params"], variables["batch_stats"]
    blocks, head_site = _eff_spec(module)
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
            eps=1e-3,  # efficientnet.py:66
        )
        folded[path] = {"w": w, "b": b}

    fold("_ConvBNSiLU_0")  # stem
    for blk in blocks:
        for cv in blk.convs:
            fold(cv.name)
    fold("_ConvBNSiLU_1")  # head conv
    return folded, blocks, head_site


def _silu(y, on):
    return jax.nn.silu(y) if on else y


def _se_branch(qp, blk_name, out_f32):
    """Float squeeze-excite on the depthwise output (efficientnet.py:92-97)."""
    se = qp[f"{blk_name}/se"]
    s = jnp.mean(out_f32, axis=(1, 2), keepdims=True)
    s = jax.lax.conv_general_dilated(
        s, se["rw"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["rb"]
    s = jax.nn.silu(s)
    s = jax.lax.conv_general_dilated(
        s, se["ew"], (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + se["eb"]
    return out_f32 * jax.nn.sigmoid(s)


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
            return _silu(y, cv.silu)
        a_i8 = (
            requantize(a, qp["inv_scale"][cv.site_in])
            if a.dtype != jnp.int8 else a
        )
        y = conv_i8(a_i8, e["w"], cv.stride, cv.pad, cv.groups).astype(
            jnp.float32
        )
        y = y * (qp["scale"][cv.site_in] * e["sw"]) + e["b"]
        return _silu(y, cv.silu)

    # exact int8 stem (3×3 stride 2, pad 1): per-channel border pad + VALID
    # conv on the uint8−128 grid (models/quantize.py scheme)
    e = qp["_ConvBNSiLU_0"]
    if mode == "calib":
        x = _silu(
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
        y = _silu(y * e["sw"] + e["b"], True)
        x = requantize(y, qp["inv_scale"]["stem"])

    for blk in blocks:
        identity = x
        for j, cv in enumerate(blk.convs[:-1]):
            x = conv(x, cv)
            nxt = (
                blk.convs[j + 1].site_in
                if j < len(blk.convs) - 2 else None
            )
            if nxt is not None:
                # expand → depthwise requant boundary
                x = record(nxt, x) if mode == "calib" else requantize(
                    x, qp["inv_scale"][nxt]
                )
        # x is now the depthwise output in f32 (after silu): SE in float
        x = _se_branch(qp, blk.name, x)
        x = record(blk.se_site, x) if mode == "calib" else x
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

    hc = qp["_ConvBNSiLU_1"]
    if mode == "calib":
        y = jax.lax.conv_general_dilated(
            x, hc["w"], (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + hc["b"]
        feats = _silu(y, True)
    else:
        y = conv_i8(x, hc["w"], 1, 0, 1).astype(jnp.float32)
        feats = _silu(y * (qp["scale"][head_site] * hc["sw"]) + hc["b"], True)
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = pooled @ qp["classifier"]["w"] + qp["classifier"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedEfficientNet:
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


def quantize_efficientnet(
    clf, calib_images, calib_batch_size: int = 64
) -> QuantizedEfficientNet:
    module = clf.module
    if not isinstance(module, EfficientNet):
        raise ValueError(
            f"quantize_efficientnet supports EfficientNet; got "
            f"{type(module).__name__}"
        )
    folded, blocks, head_site = _fold_all(clf.variables, module)
    qp: dict = dict(folded)
    p = clf.variables["params"]
    qp["classifier"] = {
        "w": np.asarray(p["classifier"]["kernel"], np.float32),
        "b": np.asarray(p["classifier"]["bias"], np.float32),
    }
    for blk in blocks:
        mb = p[blk.name]
        qp[f"{blk.name}/se"] = {
            "rw": np.asarray(mb["se_reduce"]["kernel"], np.float32),
            "rb": np.asarray(mb["se_reduce"]["bias"], np.float32),
            "ew": np.asarray(mb["se_expand"]["kernel"], np.float32),
            "eb": np.asarray(mb["se_expand"]["bias"], np.float32),
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
    stem_w = folded["_ConvBNSiLU_0"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = folded["_ConvBNSiLU_0"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["_ConvBNSiLU_0"] = {"w": w_q, "sw": sw, "b": stem_b}
    qp["stem_pad_vals"] = tuple(int(round(v)) for v in offs)

    for key in (
        [cv.name for blk in blocks for cv in blk.convs] + ["_ConvBNSiLU_1"]
    ):
        w_q, sw = quantize_weight_per_channel(folded[key]["w"])
        qp[key] = {"w": w_q, "sw": sw, "b": folded[key]["b"]}

    return QuantizedEfficientNet(
        name=f"{clf.name}@int8",
        qparams=qp,
        blocks=blocks,
        head_site=head_site,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
