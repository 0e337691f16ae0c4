"""int8 post-training quantization of ConvNeXt (V1 + V2) for TPU eval.

Tenth int8 family. The FLOP budget is the pointwise 4× MLP (pwconv1/pwconv2
— plain matmuls → int8 MXU) plus the stage-boundary downsample convs and the
4×4 stem. The 7×7 depthwise conv stays FLOAT: it is VPU-FLOP-bound (WORKLOG
r3 — XLA's fused dwconv+bias+LN already runs at ~VPU peak in bf16) and an
int8 depthwise would add two requant passes for zero MXU benefit.

**The stem is exact** (up to weight rounding): 4×4 stride-4 VALID conv on
the normalized image — the uint8-grid fold loses nothing
(cf. quantize_vit.py patch embed).

V1's LayerScale ``gamma`` folds into pwconv2 (``(x@w2+b2)·γ = x@(w2·γ) +
b2·γ``) BEFORE weight quantization, so the per-output-channel scales absorb
the per-channel γ magnitudes exactly and the elementwise multiply
disappears. V2's GRN (global spatial reduction) stays float between GELU
and pwconv2.

Reference models: exprs/exp/imagenet-a_o-loop/config_convnext_base.yaml
(+ convnextv2_base, convnext_base_cvst aliases). Parity asserted by
tests/test_quantize_convnext.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.convnext import ConvNeXt
from robustart_tpu.models.layers import normalize_01
from robustart_tpu.ops.pallas_convnext import dwconv_ln_reference
from robustart_tpu.ops.quant import (
    dense_i8,
    ln_f32,
    quantize_weight_per_channel,
    requantize,
)


def _ln(x, p, eps=1e-6, out_dtype=jnp.float32):
    return ln_f32(x, p, eps, out_dtype)


def _grn(x, p):
    xf = x.astype(jnp.float32)
    gx = jnp.sqrt(jnp.sum(xf**2, axis=(1, 2), keepdims=True) + 1e-12)
    nx = gx / (jnp.mean(gx, axis=-1, keepdims=True) + 1e-6)
    return (p["gamma"] * (xf * nx) + p["beta"] + xf).astype(x.dtype)


def _conv_q(x_i8, entry, s_in, stride):
    y = jax.lax.conv_general_dilated(
        x_i8, entry["w"], (stride, stride), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return y * (s_in * entry["sw"]) + entry["b"]


def _forward(qp, cfg, x, *, mode: str):
    """Shared float-calibration / int8 forward.

    mode='calib': ``x`` = normalized f32 image, float weights; returns
    (logits, amax dict). mode='int8': ``x`` = uint8−128 int8 grid. ``qp``
    is a pure array pytree (jit ARGUMENT — the axon relay 413-caps
    constant-laden payloads); static config rides in ``cfg`` =
    (depths, use_grn).
    """
    depths, use_grn = cfg
    amax = {}
    adt = jnp.bfloat16 if mode == "int8" else jnp.float32

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def dense(a, site, name):
        if mode == "calib":
            record(site, a)
            e = qp[name]
            return a @ e["w"] + e["b"]
        a_i8 = requantize(a.astype(jnp.float32), qp["inv_scale"][site])
        return dense_i8(a_i8, qp[name], qp["scale"][site]).astype(adt)

    # stem (exact int8 fold in int8 mode), then float LN
    e = qp["stem_conv"]
    if mode == "calib":
        x = jax.lax.conv_general_dilated(
            x, e["w"], (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + e["b"]
    else:
        x = jax.lax.conv_general_dilated(
            x, e["wq"], (4, 4), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * e["sw"] + e["bq"]
    x = _ln(x, qp["stem_norm"], out_dtype=adt)

    for si, depth in enumerate(depths):
        if si > 0:
            # downsample: LN → 2×2/2 conv (int8: requant after the LN)
            y = _ln(x, qp[f"downsample_norm{si}"])
            site = f"down{si}_in"
            if mode == "calib":
                record(site, y)
                e = qp[f"downsample_conv{si}"]
                x = jax.lax.conv_general_dilated(
                    y, e["w"], (2, 2), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + e["b"]
            else:
                y_i8 = requantize(y, qp["inv_scale"][site])
                x = _conv_q(
                    y_i8, qp[f"downsample_conv{si}"], qp["scale"][site], 2
                ).astype(adt)
        for di in range(depth):
            pre = f"stage{si}_block{di}"
            # dwconv7×7 + LN stays float (VPU-bound; XLA fuses at ~peak)
            dw = qp[f"{pre}/dwconv"]
            nrm = qp[f"{pre}/norm"]
            y = dwconv_ln_reference(
                x, dw["w"], dw["b"], nrm["scale"], nrm["bias"]
            )
            h = dense(y, f"{pre}.fc1_in", f"{pre}/pwconv1")
            h = jax.nn.gelu(h, approximate=False).astype(adt)
            if use_grn:
                h = _grn(h, qp[f"{pre}/grn"])
            # pwconv2 carries the folded LayerScale γ (V1); residual add
            x = x + dense(h, f"{pre}.fc2_in", f"{pre}/pwconv2")

    x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
    x = _ln(x, qp["head_norm"])
    return x @ qp["head"]["w"] + qp["head"]["b"], amax


@dataclasses.dataclass
class QuantizedConvNeXt:
    """int8 eval-only ConvNeXt. Call with uint8 NHWC images (or [0,1]
    floats, rounded onto the uint8 grid)."""

    name: str
    qparams: Any
    depths: tuple
    use_grn: bool
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
            qparams, (self.depths, self.use_grn), x_i8, mode="int8"
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_convnext(clf, calib_images, calib_batch_size: int = 64
                      ) -> QuantizedConvNeXt:
    """Build the int8 eval path from a float ConvNeXt :class:`Classifier`."""
    module = clf.module
    if not isinstance(module, ConvNeXt):
        raise ValueError(
            f"quantize_convnext supports ConvNeXt; got {type(module).__name__}"
        )
    p = clf.variables["params"]
    depths = tuple(module.depths)
    use_grn = module.use_grn

    def _f32(node):
        return {k: np.asarray(v, np.float32) for k, v in node.items()}

    qp: dict = {
        "stem_conv": {"w": np.asarray(p["stem_conv"]["kernel"], np.float32),
                      "b": np.asarray(p["stem_conv"]["bias"], np.float32)},
        "stem_norm": _f32(p["stem_norm"]),
        "head_norm": _f32(p["head_norm"]),
        "head": {"w": np.asarray(p["head"]["kernel"], np.float32),
                 "b": np.asarray(p["head"]["bias"], np.float32)},
    }
    for si, depth in enumerate(depths):
        if si > 0:
            qp[f"downsample_norm{si}"] = _f32(p[f"downsample_norm{si}"])
            qp[f"downsample_conv{si}"] = {
                "w": np.asarray(p[f"downsample_conv{si}"]["kernel"],
                                np.float32),
                "b": np.asarray(p[f"downsample_conv{si}"]["bias"],
                                np.float32),
            }
        for di in range(depth):
            blk = p[f"stage{si}_block{di}"]
            pre = f"stage{si}_block{di}"
            qp[f"{pre}/dwconv"] = {
                "w": np.asarray(blk["dwconv"]["kernel"], np.float32),
                "b": np.asarray(blk["dwconv"]["bias"], np.float32),
            }
            qp[f"{pre}/norm"] = _f32(blk["norm"])
            qp[f"{pre}/pwconv1"] = {
                "w": np.asarray(blk["pwconv1"]["kernel"], np.float32),
                "b": np.asarray(blk["pwconv1"]["bias"], np.float32),
            }
            w2 = np.asarray(blk["pwconv2"]["kernel"], np.float32)
            b2 = np.asarray(blk["pwconv2"]["bias"], np.float32)
            if not use_grn and "gamma" in blk:
                # fold LayerScale into pwconv2 (exact in float)
                g = np.asarray(blk["gamma"], np.float32)
                w2 = w2 * g[None, :]
                b2 = b2 * g
            qp[f"{pre}/pwconv2"] = {"w": w2, "b": b2}
            if use_grn:
                qp[f"{pre}/grn"] = _f32(blk["grn"])

    # --- calibrate on the folded float graph (params as jit ARGUMENTS)
    calib_fn = jax.jit(
        lambda qp_arg, x: _forward(
            qp_arg, (depths, use_grn), x, mode="calib"
        )[1]
    )
    images = np.asarray(calib_images)
    nb = max(len(images) // calib_batch_size, 1)
    amax = None
    for i in range(nb):
        batch = images[i * calib_batch_size : (i + 1) * calib_batch_size]
        x01 = jnp.asarray(batch, jnp.float32) / 255.0
        stats = calib_fn(qp, normalize_01(x01, clf.mean, clf.std))
        amax = stats if amax is None else jax.tree.map(jnp.maximum, amax, stats)
    scale = {k: float(np.maximum(v, 1e-12)) / 127.0 for k, v in amax.items()}
    qp["scale"] = scale
    qp["inv_scale"] = {k: 1.0 / v for k, v in scale.items()}

    # --- quantize dense + downsample-conv weights per output feature
    for key in list(qp):
        e = qp[key]
        if not (isinstance(e, dict) and "w" in e):
            continue
        if "/pwconv" in key:
            w_q, sw = quantize_weight_per_channel(jnp.asarray(e["w"])[None, None])
            qp[key] = {"w": jnp.asarray(w_q[0, 0]), "sw": sw, "b": e["b"]}
        elif key.startswith("downsample_conv"):
            w_q, sw = quantize_weight_per_channel(jnp.asarray(e["w"]))
            qp[key] = {"w": w_q, "sw": sw, "b": e["b"]}

    # --- exact int8 stem (uint8-grid folding, stride-4 VALID → exact)
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    w2 = qp["stem_conv"]["w"] / (255.0 * std).reshape(1, 1, 3, 1).astype(
        np.float32
    )
    b2 = qp["stem_conv"]["b"] - np.einsum(
        "hwco,c->o", w2, offs.astype(np.float32)
    )
    wq, sw = quantize_weight_per_channel(jnp.asarray(w2))
    qp["stem_conv"].update(wq=wq, sw=sw, bq=jnp.asarray(b2, jnp.float32))

    return QuantizedConvNeXt(
        name=f"{clf.name}@int8",
        qparams=qp,
        depths=depths,
        use_grn=use_grn,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
    )
