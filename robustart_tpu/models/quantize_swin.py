"""int8 post-training quantization of Swin Transformer for TPU eval.

Eleventh int8 family. Like the ViT path (quantize_vit.py), the dense
projections — qkv, attention out-proj, MLP fc1/fc2, the patch-merge
reductions — carry the FLOPs and run on the int8 MXU; LayerNorm, the
window-attention core (fp32-softmax Pallas kernel on TPU), GELU, residual
adds and the head stay float (bf16 in int8 mode). LN emits int8 at the next
dense's activation scale directly, so the windowed layout ops (roll /
window partition) move 1-byte elements.

**The patch embedding is exact** (up to weight rounding): 4×4 stride-4
VALID conv on the normalized image — the uint8-grid fold loses nothing.

The relative-position bias is gathered from the table ONCE at quantize time
(window size is static) and stored as a dense (H, N, N) f32 block per
stage; shift masks come from the same static
:func:`robustart_tpu.models.swin.shift_attn_mask` tables the float model
uses.

Reference models: exprs/exp/swin/config.yaml eval_list (swin_tiny/small/
base, 224/384). Parity asserted by tests/test_quantize_swin.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.models.layers import normalize_01
from robustart_tpu.models.swin import (
    SwinTransformer,
    relative_position_index,
    shift_attn_mask,
    window_partition,
    window_reverse,
)
from robustart_tpu.ops.quant import (
    dense_i8,
    ln_f32,
    quantize_weight_per_channel,
    requantize,
)


def _ln(x, p, eps=1e-5, out_dtype=jnp.float32):
    return ln_f32(x, p, eps, out_dtype)


def _attention(q, k, v, rel_bias, mask, nw, *, pallas: bool):
    """q/k/v: (B·nW, N, H, D); rel_bias: (H, N, N) f32; mask (nW, N, N)."""
    if pallas:
        from robustart_tpu.ops.pallas_attention import window_mha_pallas

        return window_mha_pallas(q, k, v, rel_bias, mask, num_windows=nw)
    bnw, n, h, d = q.shape
    scale = 1.0 / np.sqrt(d)
    attn = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    attn = attn + rel_bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn.reshape(bnw // nw, nw, h, n, n)
        attn = attn + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(bnw, h, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", attn, v)


def _forward(qp, cfg, x, *, mode: str, pallas: bool):
    """Shared float-calibration / int8 forward.

    mode='calib': ``x`` = normalized f32 image, float weights; returns
    (logits, amax dict). mode='int8': ``x`` = uint8−128 int8 grid. ``qp``
    is a pure array pytree (jit ARGUMENT — the axon relay 413-caps
    constant-laden payloads); static config rides in ``cfg`` =
    (embed_dim, depths, num_heads, window_size).
    """
    embed_dim, depths, num_heads, window_size = cfg
    amax = {}
    adt = jnp.bfloat16 if mode == "int8" else jnp.float32

    def dense(a, site, name):
        if mode == "calib":
            amax[site] = jnp.max(jnp.abs(a))
            e = qp[name]
            y = a @ e["w"]
            return y + e["b"] if e.get("b") is not None else y
        if a.dtype == jnp.int8:  # requantize already fused upstream (LN)
            a_i8 = a
        else:
            a_i8 = requantize(a.astype(jnp.float32), qp["inv_scale"][site])
        return dense_i8(a_i8, qp[name], qp["scale"][site]).astype(adt)

    def ln_q(x, p, site, eps=1e-5):
        if mode == "calib":
            return _ln(x, p, eps)
        return requantize(_ln(x, p, eps), qp["inv_scale"][site])

    # patch embed (exact int8 fold in int8 mode), then float LN
    e = qp["patch_embed"]
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
    x = _ln(x, qp["patch_norm"], out_dtype=adt)

    res = x.shape[1]
    for si, (depth, heads) in enumerate(zip(depths, num_heads)):
        dim = embed_dim * (2**si)
        if si > 0:
            bsz, h, w, c = x.shape
            x = x.reshape(bsz, h // 2, 2, w // 2, 2, c)
            x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                bsz, h // 2, w // 2, 4 * c
            )
            y = ln_q(x, qp[f"merge_norm{si}"], f"merge{si}_in")
            x = dense(y, f"merge{si}_in", f"merge_reduction{si}")
            res = res // 2
        ws = min(window_size, res)
        head_dim = dim // heads
        for di in range(depth):
            pre = f"stage{si}_block{di}"
            shift = (window_size // 2) if (di % 2 == 1 and ws < res) else 0
            b, h, w, c = x.shape
            mask = (
                jnp.asarray(shift_attn_mask(h, w, ws, shift))
                if shift > 0 else None
            )
            nw = 1 if mask is None else mask.shape[0]
            # LN1 emits int8; roll + window partition move bytes
            y = ln_q(x, qp[f"{pre}/norm1"], f"{pre}.qkv_in")
            if shift > 0:
                y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            windows = window_partition(y, ws)
            n = ws * ws
            qkv = dense(windows, f"{pre}.qkv_in", f"{pre}/attn/qkv")
            qkv = qkv.reshape(-1, n, heads, 3, head_dim)
            out = _attention(
                qkv[:, :, :, 0], qkv[:, :, :, 1], qkv[:, :, :, 2],
                qp[f"{pre}/rel_bias"], mask, nw,
                pallas=pallas and mode == "int8",
            ).reshape(-1, n, c)
            out = dense(out, f"{pre}.proj_in", f"{pre}/attn/proj")
            y = window_reverse(out, ws, h, w)
            if shift > 0:
                y = jnp.roll(y, (shift, shift), axis=(1, 2))
            x = x + y.astype(adt)
            # MLP half
            y = ln_q(x, qp[f"{pre}/norm2"], f"{pre}.fc1_in")
            hdn = dense(y, f"{pre}.fc1_in", f"{pre}/mlp_fc1")
            hdn = jax.nn.gelu(hdn, approximate=False).astype(adt)
            x = x + dense(hdn, f"{pre}.fc2_in", f"{pre}/mlp_fc2")

    x = _ln(x, qp["norm"])
    pooled = jnp.mean(x, axis=(1, 2)).astype(jnp.float32)
    return pooled @ qp["head"]["w"] + qp["head"]["b"], amax


@dataclasses.dataclass
class QuantizedSwin:
    """int8 eval-only Swin. Call with uint8 NHWC images (or [0,1] floats,
    rounded onto the uint8 grid)."""

    name: str
    qparams: Any
    embed_dim: int
    depths: tuple
    num_heads: tuple
    window_size: int
    mean: Sequence[float]
    std: Sequence[float]
    num_classes: int = 1000
    input_size: int = 224
    pallas: bool = True

    def apply_fn(self, qparams, images):
        if images.dtype == jnp.uint8:
            x_i8 = (images.astype(jnp.int32) - 128).astype(jnp.int8)
        elif images.dtype == jnp.int8:
            x_i8 = images
        else:
            k = jnp.clip(jnp.round(images.astype(jnp.float32) * 255.0), 0, 255)
            x_i8 = (k - 128).astype(jnp.int8)
        logits, _ = _forward(
            qparams,
            (self.embed_dim, self.depths, self.num_heads, self.window_size),
            x_i8, mode="int8", pallas=self.pallas,
        )
        return logits

    def __call__(self, images):
        return self.apply_fn(self.qparams, images)


def quantize_swin(clf, calib_images, calib_batch_size: int = 64,
                  pallas: bool | None = None) -> QuantizedSwin:
    """Build the int8 eval path from a float Swin :class:`Classifier`."""
    module = clf.module
    if not isinstance(module, SwinTransformer):
        raise ValueError(
            f"quantize_swin supports SwinTransformer; got {type(module).__name__}"
        )
    if pallas is None:
        pallas = jax.default_backend() == "tpu"
    p = clf.variables["params"]
    embed_dim = module.embed_dim
    depths = tuple(module.depths)
    num_heads = tuple(module.num_heads)
    window_size = module.window_size

    def _f32(node):
        return {k: np.asarray(v, np.float32) for k, v in node.items()}

    qp: dict = {
        "patch_embed": {
            "w": np.asarray(p["patch_embed"]["kernel"], np.float32),
            "b": np.asarray(p["patch_embed"]["bias"], np.float32),
        },
        "patch_norm": _f32(p["patch_norm"]),
        "norm": _f32(p["norm"]),
        "head": {"w": np.asarray(p["head"]["kernel"], np.float32),
                 "b": np.asarray(p["head"]["bias"], np.float32)},
    }
    res = clf.input_size // 4
    for si, depth in enumerate(depths):
        if si > 0:
            qp[f"merge_norm{si}"] = _f32(p[f"merge_norm{si}"])
            qp[f"merge_reduction{si}"] = {
                "w": np.asarray(p[f"merge_reduction{si}"]["kernel"],
                                np.float32),
                "b": None,
            }
            res //= 2
        ws = min(window_size, res)
        for di in range(depth):
            blk = p[f"stage{si}_block{di}"]
            pre = f"stage{si}_block{di}"
            qp[f"{pre}/norm1"] = _f32(blk["norm1"])
            qp[f"{pre}/norm2"] = _f32(blk["norm2"])
            for sub, node in (
                ("attn/qkv", blk["attn"]["qkv"]),
                ("attn/proj", blk["attn"]["proj"]),
                ("mlp_fc1", blk["mlp_fc1"]),
                ("mlp_fc2", blk["mlp_fc2"]),
            ):
                qp[f"{pre}/{sub}"] = {
                    "w": np.asarray(node["kernel"], np.float32),
                    "b": np.asarray(node["bias"], np.float32),
                }
            # static window size → gather the bias table once, store dense
            table = np.asarray(
                blk["attn"]["relative_position_bias_table"], np.float32
            )
            idx = relative_position_index(ws).reshape(-1)
            n = ws * ws
            bias = table[idx].reshape(n, n, -1).transpose(2, 0, 1)
            qp[f"{pre}/rel_bias"] = np.ascontiguousarray(bias)

    # --- calibrate on the folded float graph (params as jit ARGUMENTS)
    cfg = (embed_dim, depths, num_heads, window_size)
    calib_fn = jax.jit(
        lambda qp_arg, x: _forward(
            qp_arg, cfg, x, mode="calib", pallas=False
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
    for key in list(qp):
        e = qp[key]
        if not (isinstance(e, dict) and "w" in e):
            continue
        if "/attn/" in key or "/mlp_" in key or key.startswith(
            "merge_reduction"
        ):
            w_q, sw = quantize_weight_per_channel(jnp.asarray(e["w"])[None, None])
            qp[key] = {"w": jnp.asarray(w_q[0, 0]), "sw": sw, "b": e["b"]}

    # --- exact int8 patch embed (uint8-grid folding, stride-4 VALID)
    mean = np.asarray(clf.mean, np.float64)
    std = np.asarray(clf.std, np.float64)
    offs = 255.0 * mean - 128.0
    w2 = qp["patch_embed"]["w"] / (255.0 * std).reshape(1, 1, 3, 1).astype(
        np.float32
    )
    b2 = qp["patch_embed"]["b"] - np.einsum(
        "hwco,c->o", w2, offs.astype(np.float32)
    )
    wq, sw = quantize_weight_per_channel(jnp.asarray(w2))
    qp["patch_embed"].update(wq=wq, sw=sw, bq=jnp.asarray(b2, jnp.float32))

    return QuantizedSwin(
        name=f"{clf.name}@int8",
        qparams=qp,
        embed_dim=embed_dim,
        depths=depths,
        num_heads=num_heads,
        window_size=window_size,
        mean=clf.mean,
        std=clf.std,
        num_classes=clf.num_classes,
        input_size=clf.input_size,
        pallas=pallas,
    )
