"""int8 post-training quantization of ShuffleNetV2 for TPU eval.

Eighth int8 family (ResNet, ViT, MobileNetV2, EfficientNet, DenseNet,
RegNetX/Y, RepVGG precede it). Same recipe as the others: exact BN folding
(incl. the depthwise 3x3s), symmetric per-output-channel int8 weights,
calibrated per-tensor activation scales, exact int8 stem via the
uint8-grid folding (3x3/2 stem, 1-pixel per-channel border pad — see
models/quantize.py:18-24).

Scale management around the split/concat/shuffle topology
(robustart_tpu/models/shufflenet.py::ShuffleUnit): the tensor at every
unit boundary is int8 with ONE per-tensor scale, so the channel split is
free; branch convs run int8 with f32 dequant epilogues; the concat +
channel shuffle happen in f32 and one requantize per unit sets the next
boundary scale. Depthwise outputs (BN, no relu) are signed — symmetric
int8 handles them natively.

Mirrors ``ShuffleNetV2.__call__`` layer-for-layer; parity asserted by
tests/test_quantize_shufflenet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.shufflenet import ShuffleNetV2, channel_shuffle
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    maxpool_i8,
    quantize_weight_per_channel,
    requantize,
)


@dataclasses.dataclass(frozen=True)
class _Unit:
    name: str  # e.g. "stage2_0"
    stride: int
    features: int
    site_in: str = ""  # input activation-scale site; filled by the
    # annotation pass in quantize_shufflenet (previous unit's output)


def _spec(module: ShuffleNetV2):
    units = []
    for stage, (c, n) in enumerate(
        zip(module.stage_channels[:3], module.stage_repeats)
    ):
        for i in range(n):
            units.append(
                _Unit(f"stage{stage + 2}_{i}", 2 if i == 0 else 1, c)
            )
    return units


def _fold_all(variables, module: ShuffleNetV2):
    """Fold every conv+BN → {path: {"w","b"}} on the fixed walk."""
    params, stats = variables["params"], variables["batch_stats"]
    folded = {}

    def fold(path):
        p, s = params, stats
        for part in path.split("/"):
            p = p[part]
            s = s[part]
        w, b = fold_conv_bn(
            p["Conv_0"]["kernel"], p["BatchNorm_0"]["scale"],
            p["BatchNorm_0"]["bias"], s["BatchNorm_0"]["mean"],
            s["BatchNorm_0"]["var"],
        )
        folded[path] = {"w": w, "b": b}

    fold("_ConvBN_0")  # stem
    for u in _spec(module):
        n = 3 if u.stride == 1 else 5
        for ci in range(n):
            fold(f"{u.name}/_ConvBN_{ci}")
    fold("_ConvBN_1")  # conv5
    folded["fc"] = {
        "w": params["fc"]["kernel"],
        "b": params["fc"]["bias"],
    }
    return folded


def _conv_f(x, e, stride=1, pad=0, groups=1):
    pad = [(pad, pad), (pad, pad)]
    return jax.lax.conv_general_dilated(
        x, e["w"], (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ) + e["b"]


def _forward(fp, units, x, mode="calib"):
    """Folded-float forward recording amax per requant site (mirrors
    ShuffleNetV2.__call__ exactly — tested)."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    x = jax.nn.relu(_conv_f(x, fp["_ConvBN_0"], 2, 1))
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    record("stem", x)
    for u in units:
        bf = u.features // 2
        p = lambda ci: fp[f"{u.name}/_ConvBN_{ci}"]
        if u.stride == 1:
            x1, x2 = jnp.split(x, 2, axis=-1)
            t = record(f"{u.name}.a0", jax.nn.relu(_conv_f(x2, p(0))))
            t = record(f"{u.name}.d", _conv_f(t, p(1), 1, 1, groups=bf))
            out2 = jax.nn.relu(_conv_f(t, p(2)))
            out = jnp.concatenate([x1, out2], axis=-1)
        else:
            c_in = x.shape[-1]
            t1 = record(f"{u.name}.d1", _conv_f(x, p(0), 2, 1, groups=c_in))
            out1 = jax.nn.relu(_conv_f(t1, p(1)))
            t2 = record(f"{u.name}.a0", jax.nn.relu(_conv_f(x, p(2))))
            t2 = record(f"{u.name}.d", _conv_f(t2, p(3), 2, 1, groups=bf))
            out2 = jax.nn.relu(_conv_f(t2, p(4)))
            out = jnp.concatenate([out1, out2], axis=-1)
        x = record(u.name, channel_shuffle(out, 2))
    x = record("conv5", jax.nn.relu(_conv_f(x, fp["_ConvBN_1"])))
    x = jnp.mean(x, axis=(1, 2))
    return x @ fp["fc"]["w"] + fp["fc"]["b"], amax


def _int8_forward(qp, units, x_i8, stem_pad_vals):
    def qconv(a_i8, name, s_in, stride=1, pad=0, groups=1):
        e = qp[name]
        y = conv_i8(a_i8, e["w"], stride, pad, groups).astype(jnp.float32)
        return y * (s_in * e["sw"]) + e["b"]

    # exact stem (uint8 grid; per-channel border pad)
    pad_c = jnp.asarray(stem_pad_vals, jnp.int8)
    x_p = jnp.pad(x_i8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = x_p.shape[1], x_p.shape[2]
    border = jnp.zeros((h, w, 1), jnp.int8).at[1:-1, 1:-1, :].set(1)
    x_p = x_p * border + pad_c * (1 - border)
    e = qp["_ConvBN_0"]
    y = conv_i8(x_p, e["w"], 2, 0).astype(jnp.float32)
    y = jax.nn.relu(y * e["sw"] + e["b"])
    a = maxpool_i8(requantize(y, qp["inv_scale"]["stem"]))

    for u in units:
        bf = u.features // 2
        s_x = qp["scale"][u.site_in]
        nm = u.name
        if u.stride == 1:
            half = a.shape[-1] // 2
            x1, x2 = a[..., :half], a[..., half:]
            t = jax.nn.relu(qconv(x2, f"{nm}/_ConvBN_0", s_x))
            t = requantize(t, qp["inv_scale"][f"{nm}.a0"])
            t = qconv(t, f"{nm}/_ConvBN_1", qp["scale"][f"{nm}.a0"], 1, 1, bf)
            t = requantize(t, qp["inv_scale"][f"{nm}.d"])
            out2 = jax.nn.relu(
                qconv(t, f"{nm}/_ConvBN_2", qp["scale"][f"{nm}.d"])
            )
            out = jnp.concatenate(
                [x1.astype(jnp.float32) * s_x, out2], axis=-1
            )
        else:
            c_in = a.shape[-1]
            t1 = qconv(a, f"{nm}/_ConvBN_0", s_x, 2, 1, c_in)
            t1 = requantize(t1, qp["inv_scale"][f"{nm}.d1"])
            out1 = jax.nn.relu(
                qconv(t1, f"{nm}/_ConvBN_1", qp["scale"][f"{nm}.d1"])
            )
            t2 = jax.nn.relu(qconv(a, f"{nm}/_ConvBN_2", s_x))
            t2 = requantize(t2, qp["inv_scale"][f"{nm}.a0"])
            t2 = qconv(t2, f"{nm}/_ConvBN_3", qp["scale"][f"{nm}.a0"], 2, 1, bf)
            t2 = requantize(t2, qp["inv_scale"][f"{nm}.d"])
            out2 = jax.nn.relu(
                qconv(t2, f"{nm}/_ConvBN_4", qp["scale"][f"{nm}.d"])
            )
            out = jnp.concatenate([out1, out2], axis=-1)
        out = channel_shuffle(out, 2)
        a = requantize(out, qp["inv_scale"][nm])
    y = jax.nn.relu(qconv(a, "_ConvBN_1", qp["scale"][units[-1].name]))
    x = jnp.mean(y, axis=(1, 2))
    return x @ qp["fc"]["w"] + qp["fc"]["b"]


@dataclasses.dataclass
class QuantizedShuffleNet:
    name: str
    qparams: Any
    units: Any
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
        return _int8_forward(qparams, self.units, x_i8, self.stem_pad_vals)

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_shufflenet(clf, calib_images, calib_batch_size: int = 64):
    """Build the int8 eval path from a float ShuffleNetV2 Classifier."""
    module = clf.module
    if not isinstance(module, ShuffleNetV2):
        raise ValueError(
            f"quantize_shufflenet expects ShuffleNetV2; got {type(module).__name__}"
        )
    folded = _fold_all(clf.variables, module)
    units = _spec(module)
    # annotate each unit with its input site (previous unit's output)
    cur = "stem"
    annotated = []
    for u in units:
        annotated.append(dataclasses.replace(u, site_in=cur))
        cur = u.name
    units = annotated

    calib_fn = jax.jit(lambda f, x: _forward(f, units, x)[1])
    images = np.asarray(calib_images)
    n = max(len(images) // calib_batch_size, 1)
    amax = None
    for i in range(n):
        batch = images[i * calib_batch_size : (i + 1) * calib_batch_size]
        x01 = jnp.asarray(batch, jnp.float32) / 255.0
        stats = calib_fn(folded, normalize_01(x01, clf.mean, clf.std))
        amax = stats if amax is None else jax.tree.map(jnp.maximum, amax, stats)
    # Python-float scales like every other quantize_* family (uniform
    # qparams pytrees for serialization/broadcast tooling)
    scale = {k: float(jnp.maximum(v, 1e-12)) / 127.0 for k, v in amax.items()}

    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    qp = {"scale": scale, "inv_scale": {k: 1.0 / v for k, v in scale.items()}}

    stem_w = folded["_ConvBN_0"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = folded["_ConvBN_0"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["_ConvBN_0"] = {"w": w_q, "sw": sw, "b": stem_b}
    for path, e in folded.items():
        if path in ("_ConvBN_0", "fc"):
            continue
        w_q, sw = quantize_weight_per_channel(e["w"])
        qp[path] = {"w": w_q, "sw": sw, "b": e["b"]}
    qp["fc"] = folded["fc"]

    return QuantizedShuffleNet(
        name=f"{clf.name}@int8",
        qparams=qp,
        units=units,
        stem_pad_vals=tuple(int(round(v)) for v in offs),
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )

