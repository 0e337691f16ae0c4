"""int8 post-training quantization of the ViT/DeiT family for TPU eval.

Counterpart of :mod:`robustart_tpu.models.quantize` (ResNet family): the
dense projections — qkv, attention out-proj, MLP fc1/fc2 — carry ~92% of a
ViT forward's FLOPs and run at ~1.76× on the int8 MXU. LayerNorm, softmax
(the fused Pallas attention kernel), GELU, residual adds and the head stay
float; activations are requantized per-tensor just before each dense.

**The patch embedding is exact** (up to weight rounding): like the ResNet
stem, a normalized image has only 256 levels per channel and the patch conv
is stride=patch VALID (no padding), so feeding ``uint8−128`` and folding
``1/(255·std_c)`` + the mean offset into kernel/bias loses nothing.

Calibration records per-site amax on a folded float forward, exactly as the
ResNet path does. Parity asserted by tests/test_quantize_vit.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.vit import VisionTransformer
from robustart_tpu.ops.quant import quantize_weight_per_channel, requantize


def _ln(x, p, eps=1e-6, out_dtype=jnp.float32):
    x = x.astype(jnp.float32)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]
    return y.astype(out_dtype)


def _attention(q, k, v, *, pallas: bool):
    if pallas:
        from robustart_tpu.ops.pallas_attention import mha_pallas

        return mha_pallas(q, k, v)  # fp32 softmax inside the kernel
    scale = 1.0 / np.sqrt(q.shape[-1])
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _dense_q(x_i8, entry, s_in):
    y = jax.lax.dot_general(
        x_i8, entry["w"],
        dimension_numbers=(((x_i8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return y * (s_in * entry["sw"]) + entry["b"]


def _forward(qp, blocks_cfg, x, *, mode: str, pallas: bool):
    """Shared float-calibration / int8 forward.

    mode='calib': ``x`` is the normalized f32 image; float weights; returns
    (logits, amax dict). mode='int8': ``x`` is the uint8−128 int8 grid.
    ``qp`` is a pure array pytree (safe to pass as a jit argument — weights
    must NOT be closure constants: the axon relay rejects multi-hundred-MB
    constant-laden compile payloads with HTTP 413); static config rides in
    ``blocks_cfg`` = (depth, num_heads, patch_stride).
    """
    depth, num_heads, patch_stride = blocks_cfg
    amax = {}
    # int8 mode keeps all float-side activations bf16: the element-wise
    # passes (LN, GELU, residuals, requantize) are HBM-bandwidth bound and
    # would otherwise eat the int8 matmul win in f32 traffic
    adt = jnp.bfloat16 if mode == "int8" else jnp.float32

    def record(site, t):
        amax[site] = jnp.max(jnp.abs(t))
        return t

    def dense(a, site, name):
        if mode == "calib":
            record(site, a)
            e = qp[name]
            return a @ e["w"] + e["b"]
        if a.dtype == jnp.int8:  # requantize already fused upstream (LN)
            a_i8 = a
        else:
            a_i8 = requantize(a.astype(jnp.float32), qp["inv_scale"][site])
        return _dense_q(a_i8, qp[name], qp["scale"][site]).astype(adt)

    def ln_q(x, p, site):
        """LN emitting int8 at the site scale directly (int8 mode): the
        requantize fuses into the LN output loop and the write narrows to
        1 byte/elem."""
        if mode == "calib":
            return _ln(x, p)
        y = _ln(x, p)
        return requantize(y, qp["inv_scale"][site])

    # patch embed
    e = qp["patch"]
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
    b = x.shape[0]
    c = x.shape[-1]
    x = x.reshape(b, -1, c)
    cls = jnp.broadcast_to(qp["cls_token"], (b, 1, c)).astype(x.dtype)
    x = (jnp.concatenate([cls, x], axis=1) + qp["pos_embed"]).astype(adt)

    n = x.shape[1]
    head_dim = c // num_heads
    for i in range(depth):
        pre = f"block{i}"
        y = ln_q(x, qp[f"{pre}/norm1"], f"b{i}.qkv_in")
        qkv = dense(y, f"b{i}.qkv_in", f"{pre}/attn/qkv")
        # head-major packed qkv (models/vit.py Attention layout)
        qkv = qkv.reshape(b, n, num_heads, 3, head_dim)
        out = _attention(qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2],
                         pallas=pallas and mode == "int8")
        out = out.reshape(b, n, c)
        x = x + dense(out, f"b{i}.proj_in", f"{pre}/attn/proj")
        y = ln_q(x, qp[f"{pre}/norm2"], f"b{i}.fc1_in")
        h = dense(y, f"b{i}.fc1_in", f"{pre}/mlp/fc1")
        h = jax.nn.gelu(h, approximate=False).astype(adt)
        x = x + dense(h, f"b{i}.fc2_in", f"{pre}/mlp/fc2")

    x = _ln(x, qp["norm"])
    logits = x[:, 0].astype(jnp.float32) @ qp["head"]["w"] + qp["head"]["b"]
    return logits, amax


@dataclasses.dataclass
class QuantizedViT:
    """int8 eval-only ViT. Call with uint8 NHWC images (or [0,1] floats,
    rounded onto the uint8 grid)."""

    name: str
    qparams: Any
    depth: int
    num_heads: int
    mean: Sequence[float]
    std: Sequence[float]
    num_classes: int = 1000
    input_size: int = 224
    pallas: bool = True
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
            qparams, (self.depth, self.num_heads, self.patch_stride), x_i8,
            mode="int8", pallas=self.pallas,
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_vit(clf, calib_images, calib_batch_size: int = 64,
                 pallas: bool | None = None) -> QuantizedViT:
    """Build the int8 eval path from a float ViT :class:`Classifier`."""
    module = clf.module
    if not isinstance(module, VisionTransformer):
        raise ValueError(
            f"quantize_vit supports VisionTransformer; got {type(module).__name__}"
        )
    if pallas is None:
        pallas = jax.default_backend() == "tpu"
    p = clf.variables["params"]
    depth, num_heads = module.depth, module.num_heads
    patch = module.patch_size

    qp: dict = {
        "cls_token": np.asarray(p["cls_token"], np.float32),
        "pos_embed": np.asarray(p["pos_embed"], np.float32),
        "norm": {k: np.asarray(v, np.float32) for k, v in p["norm"].items()},
        "head": {"w": np.asarray(p["head"]["kernel"], np.float32),
                 "b": np.asarray(p["head"]["bias"], np.float32)},
        "patch": {
            "w": np.asarray(p["patch_embed"]["kernel"], np.float32),
            "b": np.asarray(p["patch_embed"]["bias"], np.float32),
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
        for sub, flax_name in (
            ("attn/qkv", ("attn", "qkv")), ("attn/proj", ("attn", "proj")),
            ("mlp/fc1", ("mlp", "fc1")), ("mlp/fc2", ("mlp", "fc2")),
        ):
            node = blk[flax_name[0]][flax_name[1]]
            qp[f"block{i}/{sub}"] = {
                "w": np.asarray(node["kernel"], np.float32),
                "b": np.asarray(node["bias"], np.float32),
            }

    # --- calibrate on the folded float graph (params as jit ARGUMENTS, not
    # closure constants — see _forward docstring)
    calib_fn = jax.jit(
        lambda qp_arg, x: _forward(
            qp_arg, (depth, num_heads, (patch, patch)), x, mode="calib",
            pallas=False,
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

    # --- exact int8 patch embed (uint8-grid folding, no padding → exact)
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    w2 = qp["patch"]["w"] / (255.0 * std).reshape(1, 1, 3, 1).astype(np.float32)
    b2 = qp["patch"]["b"] - np.einsum("hwco,c->o", w2, offs.astype(np.float32))
    wq, sw = quantize_weight_per_channel(jnp.asarray(w2))
    qp["patch"].update(wq=wq, sw=sw, bq=jnp.asarray(b2, jnp.float32))

    return QuantizedViT(
        name=f"{clf.name}@int8",
        qparams=qp,
        depth=depth,
        num_heads=num_heads,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
        pallas=pallas,
        patch_stride=(patch, patch),
    )
