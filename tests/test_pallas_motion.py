"""Pallas motion-blur tap kernel: parity vs the direct per-angle form.

The kernel (ops/pallas_motion.py) replaces the union-taps HBM streams of
ops.image.motion_blur_bank on TPU. Agreement with the direct
ops.image.motion_blur is ulp-level (VPU multiply-accumulate fusion); the
union-taps form's own test uses the same tolerance class
(tests/test_corruptions.py::test_motion_blur_bank_matches_branch_blur).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.image import motion_blur
from robustart_tpu.ops.pallas_motion import (
    _angle_tap_table,
    motion_blur_bank_pallas,
)

BANK = tuple(np.linspace(-45.0, 45.0, 32))


@pytest.mark.parametrize("idx", [0, 13, 31])
def test_matches_direct_motion_blur(idx):
    rng = np.random.default_rng(idx)
    x = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    want = np.asarray(motion_blur(x, 15.0, 8.0, BANK[idx]))
    got = np.asarray(
        motion_blur_bank_pallas(x, jnp.int32(idx), 15.0, 8.0, BANK,
                                interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-7)


def test_snow_shape_single_channel():
    rng = np.random.default_rng(0)
    bank = tuple(np.linspace(-135.0, -45.0, 32))
    x = jnp.asarray(rng.uniform(0, 1, (64, 64, 1)), jnp.float32)
    want = np.asarray(motion_blur(x, 20.0, 15.0, bank[5]))
    got = np.asarray(
        motion_blur_bank_pallas(x, jnp.int32(5), 20.0, 15.0, bank,
                                interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=3e-7)


def test_vmapped_batch_each_image_gets_its_angle():
    rng = np.random.default_rng(2)
    xb = jnp.asarray(rng.uniform(0, 1, (4, 64, 64, 3)), jnp.float32)
    idxs = jnp.asarray([0, 7, 13, 31], jnp.int32)
    outs = jax.vmap(
        lambda xx, ii: motion_blur_bank_pallas(xx, ii, 15.0, 8.0, BANK,
                                               interpret=True)
    )(xb, idxs)
    for bi in range(4):
        want = np.asarray(motion_blur(xb[bi], 15.0, 8.0, BANK[int(idxs[bi])]))
        np.testing.assert_allclose(np.asarray(outs[bi]), want, atol=3e-7)


def test_tap_table_padding_is_zero_weight():
    DY, DX, WT, py, px = _angle_tap_table(15.0, 8.0, BANK)
    # per-severity radii give each angle the same tap count n = radius+1;
    # any padded slots must carry exactly zero weight
    for a in range(DY.shape[0]):
        n = int((WT[a] > 0).sum())
        assert np.all(WT[a, n:] == 0.0)
    assert py <= 15 and px <= 15 + 1


def test_all_severity_shapes_compile_in_interpreter():
    """One tiny run per severity's (radius, sigma) — pins the pad/window
    geometry (hw alignment) for every shape the corruption produces."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)), jnp.float32)
    for radius, sigma in [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)]:
        got = motion_blur_bank_pallas(x, jnp.int32(7), float(radius),
                                      float(sigma), BANK, interpret=True)
        want = motion_blur(x, float(radius), float(sigma), BANK[7])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-7)


def test_glass_shuffle_matches_xla_selects():
    """glass_shuffle_pallas (interpret mode) == the XLA roll/select loop on
    interior pixels, for every severity's (d) and a non-square image."""
    from robustart_tpu.ops.pallas_motion import glass_shuffle_pallas

    rng = np.random.default_rng(3)
    for d, (h, w) in [(1, (32, 48)), (2, (32, 48)), (3, (40, 32)),
                      (4, (32, 32))]:
        x = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
        code = jnp.asarray(
            rng.integers(0, (2 * d) * (2 * d), (h, w)), jnp.int32
        )
        acc = jnp.zeros_like(x)
        for a in range(-d, d):
            for b in range(-d, d):
                t = (a + d) * (2 * d) + (b + d)
                m = (code == t)[..., None]
                acc = acc + jnp.where(m, jnp.roll(x, (-a, -b), (0, 1)), 0.0)
        got = glass_shuffle_pallas(x, code, d, interpret=True)
        rows = np.arange(h)[:, None]
        cols = np.arange(w)[None, :]
        interior = ((rows > d) & (rows < h - d) & (cols > d)
                    & (cols < w - d))[..., None]
        np.testing.assert_array_equal(
            np.asarray(got)[np.broadcast_to(interior, got.shape)],
            np.asarray(acc)[np.broadcast_to(interior, acc.shape)],
        )


def _chamfer_oracle(zero_mask, cap, iters):
    """The non-wrap slice form (jax_kernels._chamfer_distance CPU path),
    inlined so the test is oracle-independent of the dispatcher."""
    import math

    from robustart_tpu.noise.corruptions.jax_kernels import _CHAMFER_OFFSETS

    h, w = zero_mask.shape
    dist = np.where(zero_mask, 0.0, cap).astype(np.float32)
    for _ in range(iters):
        p = np.pad(dist, 2, constant_values=cap)
        best = dist
        for dy, dx, wt in _CHAMFER_OFFSETS:
            best = np.minimum(
                best, p[2 + dy: 2 + dy + h, 2 + dx: 2 + dx + w]
                + np.float32(wt)
            )
        dist = np.minimum(best, np.float32(cap))
    return dist


def test_chamfer_pallas_matches_slice_form():
    """chamfer_pallas (interpret mode) == the non-wrap slice propagation,
    bitwise, incl. non-128-multiple widths (cap-filled lane padding)."""
    from robustart_tpu.ops.pallas_motion import chamfer_pallas

    rng = np.random.default_rng(5)
    for h, w in [(32, 48), (40, 224), (32, 130)]:
        mask = rng.uniform(size=(h, w)) < 0.01
        dist0 = jnp.where(jnp.asarray(mask), 0.0, 20.0).astype(jnp.float32)
        got = np.asarray(chamfer_pallas(dist0, cap=20.0, iters=12,
                                        interpret=True))
        want = _chamfer_oracle(mask, 20.0, 12)
        np.testing.assert_array_equal(got, want)


def test_chamfer_dispatcher_cpu_matches_oracle():
    from robustart_tpu.noise.corruptions.jax_kernels import _chamfer_distance

    rng = np.random.default_rng(6)
    mask = rng.uniform(size=(64, 96)) < 0.02
    got = np.asarray(_chamfer_distance(jnp.asarray(mask), cap=20.0,
                                       iters=12))
    np.testing.assert_array_equal(got, _chamfer_oracle(mask, 20.0, 12))
