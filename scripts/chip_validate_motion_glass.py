"""Real-chip equality check for the round-5 motion/glass Pallas kernels
(interpret-mode tests cover semantics; this pins CHIP numerics before the
bench rows move — same pattern as chip_validate_warp.py).

- motion: motion_taps_pallas (interleaved-layout rewrite) vs the union-taps
  XLA form at severities 1/3/5 tap tables.
- glass: glass_shuffle_pallas vs the XLA roll/select loop, interior pixels.

Usage: python scripts/chip_validate_motion_glass.py
"""

from __future__ import annotations

import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/robustart_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def validate_motion():
    from robustart_tpu.ops.image import _motion_bank_table
    from robustart_tpu.ops.pallas_motion import (
        _angle_tap_table,
        motion_taps_pallas,
    )

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (224, 224, 3)), jnp.float32)
    worst = 0.0
    for radius, sigma in ((10, 3), (15, 8), (20, 15)):
        DY, DX, WT, py, px = _angle_tap_table(
            float(radius), float(sigma),
            tuple(float(a) for a in np.linspace(-45.0, 45.0, 32)),
        )
        for ai in (0, 13, 31):
            dy, dx, wt = (jnp.asarray(DY[ai]), jnp.asarray(DX[ai]),
                          jnp.asarray(WT[ai]))
            got = np.asarray(motion_taps_pallas(img, dy, dx, wt, py, px))
            # reference: explicit edge-padded shifts
            pad = np.pad(np.asarray(img), ((py, py), (px, px), (0, 0)),
                         mode="edge")
            ref = np.zeros((224, 224, 3), np.float32)
            for t in range(len(WT[ai])):
                ref += WT[ai][t] * pad[py + DY[ai][t]: py + DY[ai][t] + 224,
                                       px + DX[ai][t]: px + DX[ai][t] + 224]
            worst = max(worst, float(np.abs(got - ref).max()))
    print(json.dumps({"motion_max_abs_err": worst}))
    assert worst < 1e-5, worst


def validate_glass():
    from robustart_tpu.ops.pallas_motion import glass_shuffle_pallas

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(0, 1, (224, 224, 3)), jnp.float32)
    worst = 0.0
    for d in (1, 2, 3, 4):
        code = jnp.asarray(
            rng.integers(0, (2 * d) * (2 * d), (224, 224)), jnp.int32
        )
        got = np.asarray(glass_shuffle_pallas(x, code, d))
        acc = np.zeros_like(got)
        xn = np.asarray(x)
        cn = np.asarray(code)
        for a in range(-d, d):
            for b in range(-d, d):
                t = (a + d) * (2 * d) + (b + d)
                m = (cn == t)[..., None]
                acc = acc + np.where(m, np.roll(xn, (-a, -b), (0, 1)), 0.0)
        sl = slice(d + 1, 224 - d - 1)
        worst = max(worst,
                    float(np.abs(got[sl, sl] - acc[sl, sl]).max()))
    print(json.dumps({"glass_interior_max_abs_err": worst}))
    assert worst == 0.0, worst


def validate_chamfer():
    """chamfer_pallas on chip == the non-wrap slice oracle, bitwise."""
    from robustart_tpu.noise.corruptions.jax_kernels import (
        _CHAMFER_OFFSETS,
    )
    from robustart_tpu.ops.pallas_motion import chamfer_pallas

    rng = np.random.default_rng(2)
    mask = rng.uniform(size=(224, 224)) < 0.01
    dist0 = jnp.where(jnp.asarray(mask), 0.0, 20.0).astype(jnp.float32)
    got = np.asarray(chamfer_pallas(dist0, cap=20.0, iters=12))
    dist = np.where(mask, 0.0, 20.0).astype(np.float32)
    for _ in range(12):
        p = np.pad(dist, 2, constant_values=20.0)
        best = dist
        for dy, dx, wt in _CHAMFER_OFFSETS:
            best = np.minimum(
                best, p[2 + dy: 2 + dy + 224, 2 + dx: 2 + dx + 224]
                + np.float32(wt)
            )
        dist = np.minimum(best, np.float32(20.0))
    err = float(np.abs(got - dist).max())
    print(json.dumps({"chamfer_max_abs_err": err}))
    assert err == 0.0, err


def validate_blur_matmul():
    """Banded-matmul gaussian_blur / SVD-matmul filter2d on chip vs the
    tap-sum forms (f32 HIGHEST accumulation: ulp-class tolerance)."""
    from robustart_tpu.ops.image import (
        _sep_conv2d_nearest,
        disk_kernel,
        filter2d_same,
        gaussian_blur,
        gaussian_kernel_1d,
    )

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (224, 224, 3)), jnp.float32)
    worst = 0.0
    for sigma in (1.0, 2.0, 3.0):
        got = np.asarray(gaussian_blur(x, sigma))
        ref = np.asarray(_sep_conv2d_nearest(x, gaussian_kernel_1d(sigma)))
        worst = max(worst, float(np.abs(got - ref).max()))
    print(json.dumps({"gaussian_blur_matmul_max_abs_err": worst}))
    assert worst < 5e-6, worst
    k = disk_kernel(6, 0.5)
    got = np.asarray(filter2d_same(x, k))
    import cv2

    ref = np.stack([cv2.filter2D(np.asarray(x)[..., c], -1, k)
                    for c in range(3)], -1)
    err = float(np.abs(got - ref).max())
    print(json.dumps({"filter2d_svd_vs_cv2_max_abs_err": err}))
    assert err < 1e-5, err


if __name__ == "__main__":
    validate_motion()
    validate_glass()
    validate_chamfer()
    validate_blur_matmul()
    print(json.dumps({"chip_validate_motion_glass": "ok"}))
