"""int8 post-training quantization of DenseNet for TPU eval.

Fifth int8 family (VERDICT r2 #6). DenseNet is PRE-activation
(BN → ReLU → Conv, models/densenet.py::_BNReLUConv), so the standard
conv-BN fold does not apply: the BN affine cannot cross the ReLU. Scheme:

- the per-channel BN affine ``a·x + c`` and the ReLU run in the f32
  epilogue/prologue (VPU work, fused by XLA into the neighboring conv);
- the conv INPUT — relu(BN(x)) — is the calibrated requant site; the conv
  itself runs int8×int8→int32 on the MXU with symmetric per-output-channel
  weights (where the FLOPs are);
- the stem is the exception: ``conv0`` has BN AFTER it (norm0), which
  folds exactly, and the uint8-grid stem folding from models/quantize.py
  applies (7×7 stride-2, 3-pixel per-channel border pad);
- dense-block concatenations stay f32 (layout ops, no FLOPs).

Mirrors ``DenseNet.__call__`` (models/densenet.py:60-91) layer-for-layer;
parity asserted by tests/test_quantize_densenet.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.densenet import DenseNet
from robustart_tpu.models.layers import normalize_01
from robustart_tpu.ops.quant import (
    conv_i8,
    fold_conv_bn,
    maxpool_i8,
    quantize_weight_per_channel,
    requantize,
)


@dataclasses.dataclass(frozen=True)
class _Unit:
    """One BN→ReLU→Conv unit."""

    name: str  # param path of the unit, e.g. "denseblock1_layer1/_BNReLUConv_0"
    stride: int
    pad: int
    site: str  # requant site at the conv input (post BN+relu)


def _dn_spec(module: DenseNet):
    units = []
    for bi, n_layers in enumerate(module.block_config):
        for li in range(n_layers):
            pre = f"denseblock{bi + 1}_layer{li + 1}"
            units.append((
                pre,
                _Unit(f"{pre}/_BNReLUConv_0", 1, 0, f"{pre}.c1"),
                _Unit(f"{pre}/_BNReLUConv_1", 1, 1, f"{pre}.c2"),
            ))
        if bi != len(module.block_config) - 1:
            units.append((
                f"transition{bi + 1}",
                _Unit(f"transition{bi + 1}", 1, 0, f"transition{bi + 1}.c"),
                None,
            ))
    return units


def _bn_affine(params, stats, eps=1e-5):
    a = np.asarray(params["scale"]) / np.sqrt(np.asarray(stats["var"]) + eps)
    c = np.asarray(params["bias"]) - np.asarray(stats["mean"]) * a
    return a.astype(np.float32), c.astype(np.float32)


def _collect(variables, module: DenseNet):
    """Per-unit {affine a/c, conv kernel}; folded stem; final norm affine."""
    params, stats = variables["params"], variables["batch_stats"]
    units = _dn_spec(module)
    qp = {}
    # stem: conv0 + norm0 fold exactly (BN after conv)
    w, b = fold_conv_bn(
        params["conv0"]["kernel"],
        params["norm0"]["scale"], params["norm0"]["bias"],
        stats["norm0"]["mean"], stats["norm0"]["var"], eps=1e-5,
    )
    qp["stem"] = {"w": w, "b": b}

    def node(tree, path):
        for part in path.split("/"):
            tree = tree[part]
        return tree

    for group in units:
        for u in group[1:]:
            if u is None:
                continue
            p, s = node(params, u.name), node(stats, u.name)
            a, c = _bn_affine(p["BatchNorm_0"], s["BatchNorm_0"])
            qp[u.name] = {"a": a, "c": c, "w": np.asarray(p["Conv_0"]["kernel"])}
    a, c = _bn_affine(params["norm5"], stats["norm5"])
    qp["norm5"] = {"a": a, "c": c}
    qp["classifier"] = {
        "w": np.asarray(params["classifier"]["kernel"], np.float32),
        "b": np.asarray(params["classifier"]["bias"], np.float32),
    }
    return qp, units


def _forward(qp, units, x, *, mode: str):
    """mode='calib': x = normalized f32 image; mode='int8': uint8−128 grid."""
    amax = {}

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def unit(x_f32, u: _Unit):
        e = qp[u.name]
        y = jax.nn.relu(x_f32 * e["a"] + e["c"])
        pad_ = [(u.pad, u.pad), (u.pad, u.pad)]
        if mode == "calib":
            record(u.site, y)
            return jax.lax.conv_general_dilated(
                y, jnp.asarray(e["w"]), (u.stride, u.stride), pad_,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        y_i8 = requantize(y, qp["inv_scale"][u.site])
        out = conv_i8(y_i8, e["w"], u.stride, u.pad, 1).astype(jnp.float32)
        return out * (qp["scale"][u.site] * e["sw"])

    # stem (conv0+norm0 folded): exact uint8-grid int8 path
    e = qp["stem"]
    if mode == "calib":
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(e["w"]), (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + e["b"]
        x = jax.nn.relu(x)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
    else:
        pad_c = jnp.asarray(qp["stem_pad_vals"], jnp.int8)
        x_p = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        h, w = x_p.shape[1], x_p.shape[2]
        border = jnp.zeros((h, w, 1), jnp.int8).at[3:-3, 3:-3, :].set(1)
        x_p = x_p * border + pad_c * (1 - border)
        y = conv_i8(x_p, e["w"], 2, [(0, 0), (0, 0)], 1).astype(jnp.float32)
        y = jax.nn.relu(y * e["sw"] + e["b"])
        # int8 maxpool commutes with the monotone requant
        x_i8 = requantize(y, qp["inv_scale"]["stem"])
        x = maxpool_i8(x_i8).astype(jnp.float32) * qp["scale"]["stem"]
    if mode == "calib":
        x = record("stem", x)

    for group in units:
        name = group[0]
        if group[2] is None:  # transition
            x = unit(x, group[1])
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
                [(0, 0), (0, 0), (0, 0), (0, 0)],
            ) * 0.25
        else:  # dense layer: concat(x, conv2(relu-bn(conv1(relu-bn(x)))))
            u = unit(x, group[1])
            u = unit(u, group[2])
            x = jnp.concatenate([x, u], axis=-1)

    e5 = qp["norm5"]
    feats = jax.nn.relu(x * e5["a"] + e5["c"])
    pooled = jnp.mean(feats, axis=(1, 2))
    logits = pooled @ qp["classifier"]["w"] + qp["classifier"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedDenseNet:
    name: str
    qparams: Any
    units: Any
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
        logits, _ = _forward(qparams, self.units, x_i8, mode="int8")
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_densenet(
    clf, calib_images, calib_batch_size: int = 64
) -> QuantizedDenseNet:
    module = clf.module
    if not isinstance(module, DenseNet):
        raise ValueError(
            f"quantize_densenet supports DenseNet; got {type(module).__name__}"
        )
    qp, units = _collect(clf.variables, module)

    calib_fn = jax.jit(lambda f, x: _forward(f, units, x, mode="calib")[1])
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
    stem_w = qp["stem"]["w"] / jnp.asarray(
        255.0 * std, jnp.float32
    ).reshape(1, 1, 3, 1)
    stem_b = qp["stem"]["b"] - jnp.einsum(
        "hwco,c->o", stem_w, jnp.asarray(offs, jnp.float32)
    )
    w_q, sw = quantize_weight_per_channel(stem_w)
    qp["stem"] = {"w": w_q, "sw": sw, "b": stem_b}
    qp["stem_pad_vals"] = tuple(int(round(v)) for v in offs)

    for group in units:
        for u in group[1:]:
            if u is None:
                continue
            w_q, sw = quantize_weight_per_channel(jnp.asarray(qp[u.name]["w"]))
            qp[u.name] = {**qp[u.name], "w": w_q, "sw": sw}

    return QuantizedDenseNet(
        name=f"{clf.name}@int8",
        qparams=qp,
        units=units,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
