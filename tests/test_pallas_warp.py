"""Bounded-band Pallas warp == gather warp, bitwise (TPU-semantics interpreter).

The kernel replaces the gather path for elastic_transform severities 3-5 on
TPU (reference corruptions.py:392-427 — the two-warp elastic); exactness is
the same disjoint-exhaustive-mask argument as ops/image._map_coords_banded.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from robustart_tpu.ops.image import map_coordinates_bilinear_reflect
from robustart_tpu.ops.pallas_warp import warp_banded_pallas

# the oracle is the JITTED gather form — the regime elastic_transform
# actually runs in (the eager form differs from its own jitted self by
# XLA's mult-add FMA contraction, ~1 ulp)
_gather = jax.jit(map_coordinates_bilinear_reflect)


def _coords(rng, h, w, d):
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy = yy + jnp.asarray(rng.uniform(-d + 0.01, d - 0.01, (h, w)),
                          jnp.float32)
    cx = xx + jnp.asarray(rng.uniform(-d + 0.01, d - 0.01, (h, w)),
                          jnp.float32)
    return cy, cx


@pytest.mark.parametrize("d", [3, 13, 29])
def test_matches_gather_bitwise(d):
    rng = np.random.default_rng(7)
    h, w = 64, 56
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    cy, cx = _coords(rng, h, w, d)
    want = np.asarray(_gather(img, cy, cx))
    got = np.asarray(warp_banded_pallas(img, cy, cx, d, d, interpret=True))
    np.testing.assert_array_equal(got, want, err_msg=f"d={d}")


@pytest.mark.parametrize("tile_h", [8, 16, 32, 56])
def test_tile_height_invariant(tile_h):
    """tile_h only re-tiles the grid — output stays bitwise-identical.

    Chip sweep (scripts/bench_warp_tile.py): T=56 runs elastic's warps
    1.6-1.8x faster than T=8 (the per-tile offset walk is nearly
    tile-height-invariant), so the dispatcher defaults to the largest
    multiple-of-8 divisor of H ≤ WARP_TILE_H=56.
    """
    rng = np.random.default_rng(13)
    h, w, d = 224, 56, 9  # 224 is divisible by every tile_h tested
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    cy, cx = _coords(rng, h, w, d)
    want = np.asarray(_gather(img, cy, cx))
    got = np.asarray(warp_banded_pallas(img, cy, cx, d, d, interpret=True,
                                        tile_h=tile_h))
    np.testing.assert_array_equal(got, want, err_msg=f"tile_h={tile_h}")


def test_integer_coords_exact():
    rng = np.random.default_rng(3)
    h, w = 32, 48
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy = jnp.clip(jnp.round(yy + 3), 0, h + 2)  # fractional part exactly 0
    cx = xx
    want = np.asarray(_gather(img, cy, cx))
    got = np.asarray(warp_banded_pallas(img, cy, cx, 4, 1, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_vmapped_batch():
    rng = np.random.default_rng(11)
    h, w, b, d = 32, 40, 3, 5
    imgs = jnp.asarray(rng.uniform(0, 1, (b, h, w, 3)), jnp.float32)
    cys, cxs = [], []
    for _ in range(b):
        cy, cx = _coords(rng, h, w, d)
        cys.append(cy)
        cxs.append(cx)
    cys, cxs = jnp.stack(cys), jnp.stack(cxs)
    want = np.asarray(jax.jit(jax.vmap(map_coordinates_bilinear_reflect))(
        imgs, cys, cxs))
    fn = lambda im, cy, cx: warp_banded_pallas(  # noqa: E731
        im, cy, cx, d, d, interpret=True)
    got = np.asarray(jax.vmap(fn)(imgs, cys, cxs))
    np.testing.assert_array_equal(got, want)


def test_boundary_overhang():
    """coords whose floor lands outside the image (reflect region)."""
    rng = np.random.default_rng(5)
    h, w, d = 24, 32, 6
    img = jnp.asarray(rng.uniform(0, 1, (h, w, 3)), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    # push every border pixel's source fully outside
    cy = yy - (d - 0.5)
    cx = xx + (d - 0.5)
    want = np.asarray(_gather(img, cy, cx))
    got = np.asarray(warp_banded_pallas(img, cy, cx, d, d, interpret=True))
    np.testing.assert_array_equal(got, want)
