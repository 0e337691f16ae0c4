"""int8 post-training quantization of MLP-Mixer for TPU eval.

Ninth int8 family (after ResNet/ViT/MobileNetV2/EfficientNet/DenseNet/
RegNet/RepVGG/ShuffleNetV2). Mixer is the purest matmul model in the zoo —
every block is two MLPs (token-mixing over the token axis, channel-mixing
over features) — so the entire FLOP budget rides the int8 MXU path; only
LayerNorm, GELU and the residual adds stay float (bf16 in int8 mode).

**The stem is exact** (up to weight rounding): like the ViT patch embed it
is a stride=patch VALID conv on a normalized image with 256 levels per
channel, so feeding ``uint8−128`` and folding ``1/(255·std_c)`` + the mean
offset into kernel/bias loses nothing.

Per-tensor activation scales are recorded at each dense input on a folded
float forward (per-output-channel int8 weights, TensorRT-style) exactly as
:mod:`robustart_tpu.models.quantize_vit` does. The token-mixing dense
contracts the TOKEN axis: activations are quantized before the (B,T,C) →
(B,C,T) transpose (per-tensor scales are transpose-invariant) so the
transpose moves 1-byte elements.

Reference model: exprs/robust_baseline_exp/mlp_mixer/*/config.yaml
(``model.type: mixer_b16_224 | mixer_L16_224``). Parity asserted by
tests/test_quantize_mixer.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.mlp_mixer import MlpMixer
from robustart_tpu.ops.quant import (
    dense_i8,
    ln_f32,
    quantize_weight_per_channel,
    requantize,
)


def _ln(x, p, eps=1e-6, out_dtype=jnp.float32):
    return ln_f32(x, p, eps, out_dtype)


def _forward(qp, cfg, x, *, mode: str):
    """Shared float-calibration / int8 forward.

    mode='calib': ``x`` is the normalized f32 image; float weights; returns
    (logits, amax dict). mode='int8': ``x`` is the uint8−128 int8 grid.
    ``qp`` is a pure array pytree (jit ARGUMENT — the axon relay 413-caps
    constant-laden compile payloads); static config rides in ``cfg`` =
    (depth, patch_stride).
    """
    depth, patch_stride = cfg
    amax = {}
    adt = jnp.bfloat16 if mode == "int8" else jnp.float32

    def dense(a, site, name):
        if mode == "calib":
            amax[site] = jnp.max(jnp.abs(a))
            e = qp[name]
            return a @ e["w"] + e["b"]
        if a.dtype == jnp.int8:  # requantize already fused upstream (LN)
            a_i8 = a
        else:
            a_i8 = requantize(a.astype(jnp.float32), qp["inv_scale"][site])
        return dense_i8(a_i8, qp[name], qp["scale"][site]).astype(adt)

    def ln_q(x, p, site):
        """LN emitting int8 at the site scale directly (int8 mode): the
        requantize fuses into the LN output loop, the write narrows to
        1 byte/elem, and the following transpose (token mix) moves bytes."""
        if mode == "calib":
            return _ln(x, p)
        return requantize(_ln(x, p), qp["inv_scale"][site])

    # stem (exact int8 fold in int8 mode)
    e = qp["stem"]
    if mode == "calib":
        x = jax.lax.conv_general_dilated(
            x, e["w"], patch_stride, "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + e["b"]
    else:
        x = (
            jax.lax.conv_general_dilated(
                x, e["wq"], patch_stride, "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * e["sw"] + e["bq"]
        ).astype(adt)
    b, c = x.shape[0], x.shape[-1]
    x = x.reshape(b, -1, c)

    for i in range(depth):
        pre = f"block{i}"
        # token mixing: contract the token axis; amax recorded pre-transpose
        # (per-tensor scale — transpose-invariant)
        y = ln_q(x, qp[f"{pre}/norm1"], f"b{i}.tok1_in")
        y = jnp.swapaxes(y, 1, 2)  # (B, C, T)
        h = dense(y, f"b{i}.tok1_in", f"{pre}/tok/fc1")
        h = jax.nn.gelu(h, approximate=False).astype(adt)
        t = dense(h, f"b{i}.tok2_in", f"{pre}/tok/fc2")
        x = x + jnp.swapaxes(t, 1, 2).astype(adt)
        # channel mixing
        y = ln_q(x, qp[f"{pre}/norm2"], f"b{i}.ch1_in")
        h = dense(y, f"b{i}.ch1_in", f"{pre}/ch/fc1")
        h = jax.nn.gelu(h, approximate=False).astype(adt)
        x = x + dense(h, f"b{i}.ch2_in", f"{pre}/ch/fc2")

    x = _ln(x, qp["norm"])
    pooled = jnp.mean(x, axis=1).astype(jnp.float32)
    logits = pooled @ qp["head"]["w"] + qp["head"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedMixer:
    """int8 eval-only MLP-Mixer. Call with uint8 NHWC images (or [0,1]
    floats, rounded onto the uint8 grid)."""

    name: str
    qparams: Any
    depth: int
    mean: Sequence[float]
    std: Sequence[float]
    num_classes: int = 1000
    input_size: int = 224
    patch_stride: tuple = (16, 16)

    def apply_fn(self, qparams, images):
        if images.dtype == jnp.uint8:
            x_i8 = (images.astype(jnp.int32) - 128).astype(jnp.int8)
        elif images.dtype == jnp.int8:
            x_i8 = images
        else:
            k = jnp.clip(jnp.round(images.astype(jnp.float32) * 255.0), 0, 255)
            x_i8 = (k - 128).astype(jnp.int8)
        logits, _ = _forward(
            qparams, (self.depth, self.patch_stride), x_i8, mode="int8"
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_mixer(clf, calib_images, calib_batch_size: int = 64
                   ) -> QuantizedMixer:
    """Build the int8 eval path from a float Mixer :class:`Classifier`."""
    module = clf.module
    if not isinstance(module, MlpMixer):
        raise ValueError(
            f"quantize_mixer supports MlpMixer; got {type(module).__name__}"
        )
    p = clf.variables["params"]
    depth = module.depth
    patch = module.patch_size

    qp: dict = {
        "norm": {k: np.asarray(v, np.float32) for k, v in p["norm"].items()},
        "head": {"w": np.asarray(p["head"]["kernel"], np.float32),
                 "b": np.asarray(p["head"]["bias"], np.float32)},
        "stem": {
            "w": np.asarray(p["stem"]["kernel"], np.float32),
            "b": np.asarray(p["stem"]["bias"], np.float32),
        },
    }
    for i in range(depth):
        blk = p[f"block{i}"]
        qp[f"block{i}/norm1"] = {
            k: np.asarray(v, np.float32) for k, v in blk["norm1"].items()
        }
        qp[f"block{i}/norm2"] = {
            k: np.asarray(v, np.float32) for k, v in blk["norm2"].items()
        }
        for sub, mlp in (("tok", "mlp_tokens"), ("ch", "mlp_channels")):
            for fc in ("fc1", "fc2"):
                node = blk[mlp][fc]
                qp[f"block{i}/{sub}/{fc}"] = {
                    "w": np.asarray(node["kernel"], np.float32),
                    "b": np.asarray(node["bias"], np.float32),
                }

    # --- calibrate on the folded float graph (params as jit ARGUMENTS)
    calib_fn = jax.jit(
        lambda qp_arg, x: _forward(
            qp_arg, (depth, (patch, patch)), x, mode="calib"
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

    # --- quantize dense weights per output feature
    for key, e in list(qp.items()):
        if isinstance(e, dict) and "w" in e and key.startswith("block"):
            w_q, sw = quantize_weight_per_channel(e["w"][None, None])
            qp[key] = {"w": jnp.asarray(w_q[0, 0]), "sw": sw, "b": e["b"]}

    # --- exact int8 stem (uint8-grid folding, stride=patch VALID → exact)
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    w2 = qp["stem"]["w"] / (255.0 * std).reshape(1, 1, 3, 1).astype(np.float32)
    b2 = qp["stem"]["b"] - np.einsum("hwco,c->o", w2, offs.astype(np.float32))
    wq, sw = quantize_weight_per_channel(jnp.asarray(w2))
    qp["stem"].update(wq=wq, sw=sw, bq=jnp.asarray(b2, jnp.float32))

    return QuantizedMixer(
        name=f"{clf.name}@int8",
        qparams=qp,
        depth=depth,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
        patch_stride=(patch, patch),
    )
