"""ImageNet-C corruption kernels — batched, jittable, TPU-native.

Re-implements all 19 corruption functions of the reference
(reference RobustART/noise/utils/imagenet_c/corruptions.py:122-427) as pure
JAX functions of a single (H, W, 3) float image in [0, 1] plus a PRNG key,
designed to ``vmap`` over the batch axis and jit end-to-end. This replaces
the reference's per-image PIL/C-library loop (the hot spot flagged at
reference add_noise_utils.py:22-31) with on-device batched kernels.

Severity constants are copied from the reference tables verbatim. The
per-image library calls map to on-device equivalents:

- skimage/scipy gaussian      → ops.image.gaussian_blur (scipy-exact)
- cv2.filter2D + disk kernel  → ops.image.filter2d_same (cv2-exact)
- ImageMagick MotionBlurImage → ops.image.motion_blur (kernel-shape match)
- scipy.ndimage.zoom order=1  → align-corners bilinear resize matrices
- PIL BOX resize (pixelate)   → ops.image.resize (PIL-exact)
- skimage rgb2hsv/hsv2rgb     → ops.image.rgb_to_hsv/hsv_to_rgb (exact)
- cv2.Canny/distanceTransform/equalizeHist (spatter water branch)
                              → sobel+NMS edges, chamfer distance, exact
                                histogram equalization (documented approx)

RNG-dependent corruptions cannot be bitwise-equal to numpy's MT19937 stream;
they are validated distributionally (SURVEY.md §7 "hard parts" #1). The
glass_blur pixel shuffle is the standard gather approximation of the
reference's sequential swap loop (corruptions.py:169-185).

``jpeg_compression`` runs on device through the bit-exact integer libjpeg
transcode in robustart_tpu.noise.corruptions.jpeg_jax (the entropy stage is
lossless, so no codec is needed for the pixel effect); the PIL host path
remains available as robustart_tpu.noise.corruptions.jpeg_compression_host.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from robustart_tpu.noise.corruptions.jpeg_jax import (
    jpeg_compression as _jpeg_compression,
)
from robustart_tpu.ops.image import (
    disk_kernel,
    filter2d_same,
    gaussian_blur,
    hsv_to_rgb,
    map_coordinates_bilinear_reflect,
    motion_blur,
    motion_blur_bank,
    resize,
    resize_matrix,
    rgb_to_gray,
    rgb_to_hsv,
)

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _zoom_matrix(in_size: int, out_size: int) -> np.ndarray:
    """scipy.ndimage.zoom(order=1, grid_mode=False) 1-D matrix:
    x_in = i * (in-1)/(out-1) with bilinear taps."""
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1:
        w[0, 0] = 1.0
        return w.astype(np.float32)
    ratio = (in_size - 1) / (out_size - 1)
    for i in range(out_size):
        src = i * ratio
        j0 = int(np.floor(src))
        frac = src - j0
        j0 = min(j0, in_size - 1)
        j1 = min(j0 + 1, in_size - 1)
        w[i, j0] += 1.0 - frac
        w[i, j1] += frac
    return w.astype(np.float32)


def _scizoom_2d(img: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """(H, W, C) → (out_h, out_w, C) with scipy-zoom bilinear semantics."""
    mh = jnp.asarray(_zoom_matrix(img.shape[0], out_h))
    mw = jnp.asarray(_zoom_matrix(img.shape[1], out_w))
    img = jnp.einsum("oh,hwc->owc", mh, img)
    return jnp.einsum("ow,hwc->hoc", mw, img)


def clipped_zoom(img: jax.Array, zoom_factor: float) -> jax.Array:
    """Reference clipped_zoom (corruptions.py:105-115): center-crop
    ceil(h/zoom), scipy-zoom by the factor, trim back to h."""
    h = img.shape[0]
    ch = int(np.ceil(h / float(zoom_factor)))
    top = (h - ch) // 2
    crop = img[top : top + ch, top : top + ch]
    # scipy zoom output size: int(round(ch * zoom))
    zh = int(round(ch * float(zoom_factor)))
    out = _scizoom_2d(crop, zh, zh)
    trim = (zh - h) // 2
    return out[trim : trim + h, trim : trim + h]


def plasma_fractal(key: jax.Array, mapsize: int = 256, wibbledecay: float = 3.0) -> jax.Array:
    """Diamond-square heightmap, normalized to [0, 1].

    Faithful re-expression of the reference generator (corruptions.py:55-102)
    including its ``wibble * uniform(-wibble, wibble)`` noise scale. The
    stride loop is Python-unrolled (static shapes per step) so the whole
    generator jit-compiles.
    """
    maparray = jnp.zeros((mapsize, mapsize), jnp.float32)
    stepsize = mapsize
    wibble = 100.0

    def wibbledmean(array, key, wibble):
        noise = jax.random.uniform(
            key, array.shape, jnp.float32, -wibble, wibble
        )
        return array / 4.0 + wibble * noise

    while stepsize >= 2:
        key, k1, k2, k3 = jax.random.split(key, 4)
        half = stepsize // 2
        # fillsquares
        corner = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        acc = corner + jnp.roll(corner, -1, axis=0)
        acc = acc + jnp.roll(acc, -1, axis=1)
        maparray = maparray.at[half:mapsize:stepsize, half:mapsize:stepsize].set(
            wibbledmean(acc, k1, wibble)
        )
        # filldiamonds
        drgrid = maparray[half:mapsize:stepsize, half:mapsize:stepsize]
        ulgrid = maparray[0:mapsize:stepsize, 0:mapsize:stepsize]
        ldrsum = drgrid + jnp.roll(drgrid, 1, axis=0)
        lulsum = ulgrid + jnp.roll(ulgrid, -1, axis=1)
        maparray = maparray.at[0:mapsize:stepsize, half:mapsize:stepsize].set(
            wibbledmean(ldrsum + lulsum, k2, wibble)
        )
        tdrsum = drgrid + jnp.roll(drgrid, 1, axis=1)
        tulsum = ulgrid + jnp.roll(ulgrid, -1, axis=0)
        maparray = maparray.at[half:mapsize:stepsize, 0:mapsize:stepsize].set(
            wibbledmean(tdrsum + tulsum, k3, wibble)
        )
        stepsize //= 2
        wibble /= wibbledecay

    maparray = maparray - maparray.min()
    return maparray / maparray.max()


def _uint8_roundtrip(x01: jax.Array) -> jax.Array:
    """Quantize through the uint8 grid (PIL save/load steps in the reference
    truncate via np.uint8 casts)."""
    return jnp.floor(jnp.clip(x01, 0.0, 1.0) * 255.0) / 255.0


def _uint8_round(x01: jax.Array) -> jax.Array:
    """Quantize to the uint8 grid by ROUNDING — PIL's own resample output
    quantization (fixed-point round-half-up), vs the truncating np.uint8
    casts `_uint8_roundtrip` models."""
    return jnp.floor(jnp.clip(x01, 0.0, 1.0) * 255.0 + 0.5) / 255.0


# ---------------------------------------------------------------------------
# noise family
# ---------------------------------------------------------------------------


def gaussian_noise(x, key, severity=1):
    c = [0.08, 0.12, 0.18, 0.26, 0.38][severity - 1]
    return jnp.clip(x + c * jax.random.normal(key, x.shape, x.dtype), 0.0, 1.0)


def _poisson_inverse_cdf(key, lam: jax.Array, kmax: int) -> jax.Array:
    """Poisson via CDF inversion: X = min{k : U < CDF_k(lam)}, exact for the
    bounded-rate case (lam ≤ x·c ≤ c here).

    jax.random.poisson's Knuth/rejection sampler is while_loop-bound and
    runs ~10× slower than the forward on TPU (measured: shot_noise was the
    4th-slowest corruption at 1.5k img/s while gaussian_noise ran 12.6k).
    This is a straight fori_loop of fused elementwise ops: p_{k+1} =
    p_k·lam/(k+1), cdf accumulates, one compare per term. ``kmax`` bounds
    the support: P(X ≥ lam + 12√lam) < 1e-26, far below f32 resolution.
    """
    u = jax.random.uniform(key, lam.shape, jnp.float32)
    p0 = jnp.exp(-lam)

    # UNROLLED (kmax is small and static): a lax.fori_loop here writes the
    # (p, cdf, n) carry to HBM every iteration (~1.5 GB/iter at batch 512,
    # chip-measured 1.9k img/s); straight-line elementwise code fuses into
    # one VMEM-resident pass (the whole chain is ~5 ops/term).
    p, cdf, n = p0, p0, jnp.zeros_like(lam)
    for k in range(kmax):
        n = n + (u >= cdf).astype(jnp.float32)
        p = p * (lam * (1.0 / (k + 1.0)))
        cdf = cdf + p
    return n


def shot_noise(x, key, severity=1):
    c = float([60, 25, 12, 5, 3][severity - 1])
    kmax = int(c + 12.0 * math.sqrt(c) + 12.0)
    n = _poisson_inverse_cdf(key, x.astype(jnp.float32) * c, kmax)
    return jnp.clip(n.astype(x.dtype) / c, 0.0, 1.0)


def impulse_noise(x, key, severity=1):
    # skimage random_noise(mode='s&p', amount=c): elementwise salt (1.0) or
    # pepper (0.0) with probability c/2 each
    c = [0.03, 0.06, 0.09, 0.17, 0.27][severity - 1]
    u = jax.random.uniform(key, x.shape, x.dtype)
    x = jnp.where(u < c / 2, 0.0, x)
    x = jnp.where(u > 1.0 - c / 2, 1.0, x)
    return jnp.clip(x, 0.0, 1.0)


def speckle_noise(x, key, severity=1):
    c = [0.15, 0.2, 0.35, 0.45, 0.6][severity - 1]
    return jnp.clip(x + x * c * jax.random.normal(key, x.shape, x.dtype), 0.0, 1.0)


# ---------------------------------------------------------------------------
# blur family
# ---------------------------------------------------------------------------


def gaussian_blur_c(x, key, severity=1):
    c = [1, 2, 3, 4, 6][severity - 1]
    return jnp.clip(gaussian_blur(x, float(c)), 0.0, 1.0)


def _glass_pallas_ok(h: int) -> bool:
    """Gate glass_shuffle_pallas to real TPU backends and evenly-tiled
    heights (same policy as ops.image._pallas_warp_ok)."""
    from robustart_tpu.ops.image import _pallas_warp_ok

    return _pallas_warp_ok(h)


def glass_blur(x, key, severity=1):
    # (sigma, max_delta, iterations); gather approximation of the swap loop
    sigma, d, iters = [
        (0.7, 1, 2), (0.9, 2, 1), (1, 2, 3), (1.1, 3, 2), (1.5, 4, 2)
    ][severity - 1]
    h, w = x.shape[0], x.shape[1]
    x = _uint8_roundtrip(gaussian_blur(x, float(sigma)))
    rows = jnp.arange(h)[:, None]
    cols = jnp.arange(w)[None, :]
    interior = (
        (rows > d) & (rows < h - d) & (cols > d) & (cols < w - d)
    )[..., None]
    # The swap is a 2D gather with BOUNDED offsets (|off| ≤ d ≤ 4), so it
    # runs as (2d)² shifted SELECTS instead: one equality mask per offset
    # pair picks the rolled image. Bitwise-identical to the gather (masks
    # are disjoint and exhaustive over randint's [-d, d) range; the clip in
    # the gather form never binds inside ``interior``), but it's pure
    # VPU roll/select work — the gather ran at 429 img/s on chip, ~35×
    # under the clean forward.
    use_pallas = _glass_pallas_ok(h)
    for i in range(iters):
        key, sub = jax.random.split(key)
        off = jax.random.randint(sub, (h, w, 2), -d, d)
        code = (off[..., 0] + d) * (2 * d) + (off[..., 1] + d)
        if use_pallas:
            # VMEM shuffle-select kernel: one image read/write per
            # iteration instead of (2d)² rolled HBM streams; bitwise-equal
            # on the interior (ops/pallas_motion.glass_shuffle_pallas)
            from robustart_tpu.ops.pallas_motion import glass_shuffle_pallas

            acc = glass_shuffle_pallas(x, code, d)
        else:
            acc = jnp.zeros_like(x)
            for a in range(-d, d):
                for b in range(-d, d):
                    t = (a + d) * (2 * d) + (b + d)
                    m = (code == t)[..., None]
                    acc = acc + jnp.where(m, jnp.roll(x, (-a, -b), (0, 1)),
                                          0.0)
        x = jnp.where(interior, acc, x)
    return jnp.clip(gaussian_blur(x, float(sigma)), 0.0, 1.0)


def defocus_blur(x, key, severity=1):
    radius, alias = [(3, 0.1), (4, 0.5), (6, 0.5), (8, 0.5), (10, 0.5)][severity - 1]
    kernel = disk_kernel(radius, alias)
    return jnp.clip(filter2d_same(x, kernel), 0.0, 1.0)


def motion_blur_c(x, key, severity=1):
    radius, sigma = [(10, 3), (15, 5), (15, 8), (15, 12), (20, 15)][severity - 1]
    angle = jax.random.uniform(key, (), jnp.float32, -45.0, 45.0)
    # randomize among a static bank of angles (motion kernel offsets are
    # host-precomputed per angle; pick nearest of 32 to stay jittable).
    # union-taps formulation (ops.image.motion_blur_bank): a lax.switch
    # over per-angle blurs executes all 32 branches under vmap and its
    # fusion with the int8 ResNet crashed the XLA TPU compiler.
    n_angles = 32
    bank = np.linspace(-45.0, 45.0, n_angles)
    idx = jnp.clip(
        jnp.round((angle + 45.0) / 90.0 * (n_angles - 1)).astype(jnp.int32),
        0,
        n_angles - 1,
    )
    out = motion_blur_bank(x, idx, float(radius), float(sigma), tuple(bank))
    return jnp.clip(out, 0.0, 1.0)


def zoom_blur(x, key, severity=1):
    factors = [
        np.arange(1, 1.11, 0.01),
        np.arange(1, 1.16, 0.01),
        np.arange(1, 1.21, 0.02),
        np.arange(1, 1.26, 0.02),
        np.arange(1, 1.31, 0.03),
    ][severity - 1]
    out = x
    for z in factors:
        out = out + clipped_zoom(x, float(z))
    return jnp.clip(out / (len(factors) + 1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# weather family
# ---------------------------------------------------------------------------


def fog(x, key, severity=1):
    c0, decay = [(1.5, 2), (2.0, 2), (2.5, 1.7), (2.5, 1.5), (3.0, 1.4)][severity - 1]
    h, w = x.shape[0], x.shape[1]
    mapsize = 1 << max(h, w).bit_length() if (max(h, w) & (max(h, w) - 1)) else max(h, w)
    max_val = x.max()
    fractal = plasma_fractal(key, mapsize=max(mapsize, 256), wibbledecay=decay)
    x = x + c0 * fractal[:h, :w, None]
    return jnp.clip(x * max_val / (max_val + c0), 0.0, 1.0)


# Frost texture bank: the reference blends six bundled frost photographs
# (corruptions.py:244-263) which are ABSENT from the snapshot (SURVEY.md §7
# hard-part #1). We regenerate six deterministic procedural frost textures at
# import time (fractal noise + directional streak + blur) and document the
# substitution; the blend math matches the reference exactly.
@functools.lru_cache(maxsize=1)
def _frost_bank(size: int = 320) -> np.ndarray:
    rng = np.random.default_rng(20260816)
    bank = []
    for i in range(6):
        base = rng.normal(0.65, 0.2, size=(size, size))
        # a few octaves of blurred noise = ice sheet
        acc = np.zeros((size, size))
        for octave, s in enumerate([4, 8, 16, 32]):
            layer = rng.normal(0, 1, size=(size // s + 1, size // s + 1))
            layer = np.kron(layer, np.ones((s, s)))[:size, :size]
            acc += layer / (octave + 1)
        tex = base + 0.15 * acc
        # directional streaks (crystal growth)
        angle = rng.uniform(0, np.pi)
        ky, kx = np.sin(angle), np.cos(angle)
        yy, xx = np.mgrid[0:size, 0:size]
        streak = 0.08 * np.sin((yy * ky + xx * kx) * rng.uniform(0.3, 0.9))
        tex = np.clip(tex + streak, 0, 1.3)
        tex = (tex - tex.min()) / (tex.max() - tex.min())
        img = np.stack([tex * 255, tex * 245 + 5, tex * 235 + 15], axis=-1)
        bank.append(img.astype(np.float32))
    return np.stack(bank)  # (6, size, size, 3) in [0,255]


def frost(x, key, severity=1):
    ca, cb = [(1, 0.4), (0.8, 0.6), (0.7, 0.7), (0.65, 0.7), (0.6, 0.75)][severity - 1]
    h, w = x.shape[0], x.shape[1]
    bank = jnp.asarray(_frost_bank()) / 255.0  # (6, S, S, 3)
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (), 0, bank.shape[0])
    ys = jax.random.randint(k2, (), 0, bank.shape[1] - h)
    xs = jax.random.randint(k3, (), 0, bank.shape[2] - w)
    # random crop as one-hot MXU contractions: a vmapped dynamic_slice is a
    # per-image gather (chip: 1.9k img/s, ~240 ms/512 overhead to move
    # 600 KB/image). Texture pick = 6 exact masked adds; the (h,S)/(w,S)
    # one-hot row/col matmuls are exact at HIGHEST precision (single
    # nonzero product per output, bf16x6 reassembles the f32 operand).
    sel = jnp.zeros(bank.shape[1:], jnp.float32)
    for m in range(bank.shape[0]):
        sel = sel + jnp.where(idx == m, bank[m], 0.0)
    s_full = bank.shape[1]
    my = (jnp.arange(s_full)[None, :]
          == (ys + jnp.arange(h)[:, None])).astype(jnp.float32)
    mx = (jnp.arange(s_full)[None, :]
          == (xs + jnp.arange(w)[:, None])).astype(jnp.float32)
    rows = jnp.einsum("ir,rkc->ikc", my, sel,
                      precision=jax.lax.Precision.HIGHEST)
    crop = jnp.einsum("jk,ikc->ijc", mx, rows,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.clip(ca * x + cb * crop, 0.0, 1.0)


def snow(x, key, severity=1):
    c = [
        (0.1, 0.3, 3, 0.5, 10, 4, 0.8),
        (0.2, 0.3, 2, 0.5, 12, 4, 0.7),
        (0.55, 0.3, 4, 0.9, 12, 8, 0.7),
        (0.55, 0.3, 4.5, 0.85, 12, 8, 0.65),
        (0.55, 0.3, 2.5, 0.85, 12, 12, 0.55),
    ][severity - 1]
    h, w = x.shape[0], x.shape[1]
    k1, k2 = jax.random.split(key)
    layer = c[0] + c[1] * jax.random.normal(k1, (h, w), x.dtype)
    layer = clipped_zoom(layer[..., None], c[2])
    layer = jnp.where(layer < c[3], 0.0, layer)
    layer = _uint8_roundtrip(layer)
    angle = jax.random.uniform(k2, (), jnp.float32, -135.0, -45.0)
    n_angles = 32
    bank = np.linspace(-135.0, -45.0, n_angles)
    idx = jnp.clip(
        jnp.round((angle + 135.0) / 90.0 * (n_angles - 1)).astype(jnp.int32),
        0, n_angles - 1,
    )
    layer = motion_blur_bank(layer, idx, float(c[4]), float(c[5]),
                             tuple(bank))
    layer = _uint8_roundtrip(layer)
    gray_boost = rgb_to_gray(x)[..., None] * 1.5 + 0.5
    x = c[6] * x + (1 - c[6]) * jnp.maximum(x, gray_boost)
    return jnp.clip(x + layer + jnp.rot90(layer, k=2), 0.0, 1.0)


# --- spatter helpers (JAX stand-ins for the cv2 water branch) ---


def _sobel_edges(gray: jax.Array, low: float, high: float) -> jax.Array:
    """Canny-style binary edges: sobel magnitude + double threshold +
    one hysteresis dilation pass (approximation of cv2.Canny 50/150)."""
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ky = kx.T
    gx = filter2d_same(gray[..., None], kx)[..., 0]
    gy = filter2d_same(gray[..., None], ky)[..., 0]
    mag = jnp.abs(gx) + jnp.abs(gy)  # cv2.Canny default uses L1 magnitude
    strong = mag >= high
    weak = mag >= low
    # hysteresis: weak pixels adjacent to strong survive (one pass)
    neigh = filter2d_same(strong.astype(jnp.float32)[..., None], np.ones((3, 3), np.float32))[..., 0]
    return (strong | (weak & (neigh > 0))).astype(jnp.float32)


_CHAMFER_OFFSETS = tuple(
    (dy, dx, w)
    for w, pairs in (
        (1.0, ((0, 1), (0, -1), (1, 0), (-1, 0))),
        (math.sqrt(2.0), ((1, 1), (1, -1), (-1, 1), (-1, -1))),
        (math.sqrt(5.0), ((1, 2), (1, -2), (-1, 2), (-1, -2),
                          (2, 1), (2, -1), (-2, 1), (-2, -1))),
    )
    for dy, dx in pairs
)


def _chamfer_distance(zero_mask: jax.Array, cap: float, iters: int) -> jax.Array:
    """Distance to the nearest True pixel of ``zero_mask``, chamfer 5x5
    propagation (cv2.distanceTransform DIST_L2/maskSize=5 analog), capped.

    Out-of-image neighbors are treated as cap-distance (cv2 never wraps);
    an earlier revision used jnp.roll (wraparound) — non-wrap is both more
    faithful and Pallas-friendly. The XLA form streams iters×16 shifted
    copies through HBM (131.6 of spatter's 183.5 ms/batch-512 on chip,
    scripts/probe_spatter_stages.py); on TPU the whole map propagates in
    VMEM instead (ops/pallas_motion.chamfer_pallas, bitwise-equal)."""
    h, w_dim = zero_mask.shape
    dist = jnp.where(zero_mask, 0.0, cap)

    from robustart_tpu.ops.pallas_motion import chamfer_pallas
    if _glass_pallas_ok(h):
        return chamfer_pallas(dist, cap=cap, iters=iters)

    def body(_, dist):
        p = jnp.pad(dist, 2, constant_values=cap)
        best = dist
        for dy, dx, w in _CHAMFER_OFFSETS:
            shifted = jax.lax.slice(
                p, (2 + dy, 2 + dx), (2 + dy + h, 2 + dx + w_dim)
            )
            best = jnp.minimum(best, shifted + w)
        return jnp.minimum(best, cap)

    return jax.lax.fori_loop(0, iters, body, dist)


def _equalize_hist(u8: jax.Array) -> jax.Array:
    """cv2.equalizeHist: histogram-equalize a (H, W) uint8-valued array.

    TPU-shaped, third design. The scatter (.at[].add) serialized on chip
    (705 img/s spatter); the 256-level where-sum fixed that but still did
    2×256×N fused compare-selects (~27 of spatter's 53 ms/batch-512,
    scripts/probe_spatter_stages.py — the dominant stage after the
    chamfer kernel). Here the 8-bit value is split into nibbles
    v = 16·h + l and both directions become contractions of 16+16
    indicator planes:

      hist[16·hh + ll] = Σ_p Hm[hh,p]·Lm[ll,p]   —  Hm @ Lmᵀ on the MXU
      lut-apply:  G = T @ Lm  (T = lut as (16,16)), then a 16-way
                  masked sum  out[p] = Σ_hh Hm[hh,p]·G[hh,p]

    16× fewer VPU compares (32·N vs 512·N) and two trivial MXU matmuls.
    Exact: every pixel's column in Hm/Lm has exactly one nonzero; bf16
    operands hold 0/1 and integer LUT values ≤ 255 exactly; the MXU
    accumulates in f32 and counts stay < 2^24. Bit-identical to the
    where-sum form (tests/test_corruptions.py::test_equalize_nibble).
    """
    flat = u8.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    hi = jnp.floor(flat / 16.0)
    lo = flat - 16.0 * hi
    nib = jnp.arange(16, dtype=jnp.float32)
    hm = (hi[None, :] == nib[:, None]).astype(jnp.bfloat16)  # (16, N)
    lm = (lo[None, :] == nib[:, None]).astype(jnp.bfloat16)  # (16, N)
    hist2d = jax.lax.dot_general(
        hm, lm, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (16, 16): [hh, ll]
    hist = hist2d.reshape(256)
    cdf = jnp.cumsum(hist)
    cdf_min = cdf[jnp.argmax(hist > 0)]
    lut = jnp.round((cdf - cdf_min) / jnp.maximum(n - cdf_min, 1.0) * 255.0)
    lut = jnp.clip(lut, 0, 255)
    t16 = lut.reshape(16, 16).astype(jnp.bfloat16)
    g = jax.lax.dot_general(
        t16, lm, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (16, N): lut[16·hh + l_p]
    out = jnp.sum(jnp.where(hm != 0, g, 0.0), axis=0)
    return out.reshape(u8.shape)


def spatter(x, key, severity=1):
    c = [
        (0.65, 0.3, 4, 0.69, 0.6, 0),
        (0.65, 0.3, 3, 0.68, 0.6, 0),
        (0.65, 0.3, 2, 0.68, 0.5, 0),
        (0.65, 0.3, 1, 0.65, 1.5, 1),
        (0.67, 0.4, 1, 0.65, 1.5, 1),
    ][severity - 1]
    h, w = x.shape[0], x.shape[1]
    liquid = c[0] + c[1] * jax.random.normal(key, (h, w), x.dtype)
    liquid = gaussian_blur(liquid[..., None], float(c[2]))[..., 0]
    liquid = jnp.where(liquid < c[3], 0.0, liquid)
    if c[5] == 0:
        # water branch (severities 1-3) — reference corruptions.py:327-350
        liquid_u8 = jnp.floor(jnp.clip(liquid, 0.0, 1.0) * 255.0)
        edges = _sobel_edges(liquid_u8, 50.0, 150.0)
        dist = _chamfer_distance(edges > 0, cap=20.0, iters=12)
        # cv2: threshold-trunc at 20, 3x3 blur, equalizeHist
        dist = filter2d_same(dist[..., None], np.ones((3, 3), np.float32) / 9.0)[..., 0]
        dist = _equalize_hist(jnp.floor(jnp.clip(dist, 0, 255)))
        ker = np.array([[-2, -1, 0], [-1, 1, 1], [0, 1, 2]], np.float32)
        dist = filter2d_same(dist[..., None].astype(x.dtype), ker)[..., 0]
        dist = jnp.clip(dist, 0.0, 255.0)  # cv2.CV_8U saturation
        dist = filter2d_same(dist[..., None], np.ones((3, 3), np.float32) / 9.0)[..., 0]
        m = liquid * dist
        m = m / jnp.maximum(m.max(), 1e-12)
        m = (m * c[4])[..., None]
        # water is pale turquoise (BGR constants in reference; x is RGB here —
        # reference feeds RGB arrays through BGR-named conversions, so the
        # channel order is effectively preserved)
        color = jnp.asarray([175 / 255.0, 238 / 255.0, 238 / 255.0], x.dtype)
        return jnp.clip(x + m * color, 0.0, 1.0)
    # mud branch (severities 4-5) — reference corruptions.py:351-364
    m = jnp.where(liquid > c[3], 1.0, 0.0)
    m = gaussian_blur(m[..., None], float(c[4]))[..., 0]
    m = jnp.where(m < 0.8, 0.0, m)[..., None]
    color = jnp.asarray([63 / 255.0, 42 / 255.0, 20 / 255.0], x.dtype)
    return jnp.clip(x * (1.0 - m) + color * m, 0.0, 1.0)


# ---------------------------------------------------------------------------
# digital family
# ---------------------------------------------------------------------------


def contrast(x, key, severity=1):
    c = [0.4, 0.3, 0.2, 0.1, 0.05][severity - 1]
    means = jnp.mean(x, axis=(0, 1), keepdims=True)
    return jnp.clip((x - means) * c + means, 0.0, 1.0)


def brightness(x, key, severity=1):
    c = [0.1, 0.2, 0.3, 0.4, 0.5][severity - 1]
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 2].set(jnp.clip(hsv[..., 2] + c, 0.0, 1.0))
    return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)


def saturate(x, key, severity=1):
    cs, cb = [(0.3, 0), (0.1, 0), (2, 0), (5, 0.1), (20, 0.2)][severity - 1]
    hsv = rgb_to_hsv(x)
    hsv = hsv.at[..., 1].set(jnp.clip(hsv[..., 1] * cs + cb, 0.0, 1.0))
    return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)


def _pil_u8_resize(x01, out_hw, method="pil-box"):
    """PIL 8-bit-mode separable resize: Pillow's 8bpc path runs the
    HORIZONTAL pass first and stores the intermediate as uint8 (clip8
    rounds half up), then the vertical pass rounds again — two grid
    quantizations, not one (Pillow Resample.c ImagingResampleInner)."""
    from robustart_tpu.ops.image import resize_matrix

    h_in, w_in = x01.shape[0], x01.shape[1]
    ww = jnp.asarray(resize_matrix(w_in, out_hw[1], method))
    wh = jnp.asarray(resize_matrix(h_in, out_hw[0], method))
    x = _uint8_round(jnp.einsum("ow,hwc->hoc", ww, x01))
    return _uint8_round(jnp.einsum("oh,hwc->owc", wh, x))


def pixelate(x, key, severity=1):
    c = [0.6, 0.5, 0.4, 0.3, 0.25][severity - 1]
    h, w = x.shape[0], x.shape[1]
    dh, dw = int(h * c), int(w * c)
    # the reference resizes PIL uint8 'RGB' images (corruptions.py:385-391)
    # — replicate PIL's per-pass uint8 rounding exactly
    down = _pil_u8_resize(x, (dh, dw))
    up = _pil_u8_resize(down, (h, w))
    return jnp.clip(up, 0.0, 1.0)


# max (2D+1)^2 band size for which elastic passes a static bound down to
# the warp at all (ops/image.py routes bounded bands to masked slices or a
# single (2,2,C)-patch gather by size; unbounded falls back to the plain
# gather). severity-5 displacement D=30 -> 3721 taps is the largest band
# any severity produces; 0 is the test hook that forces the gather oracle.
ELASTIC_TAPS_MAX = 4000


@functools.lru_cache(maxsize=None)
def _affine_band_bound(h: int, w: int, cc: float) -> float | None:
    """Static sup of the inverse-affine warp displacement for elastic.

    The random affine maps three anchor points ``pts1`` to ``pts1 + U`` with
    ``|U|_inf <= cc`` per coordinate; the warp evaluates the INVERSE map at
    every output pixel p. Its displacement is affine with values ``-U_i`` at
    the perturbed anchors, so ``|disp(p)|_inf <= cc * sum_i |mu_i(p)|`` with
    mu the barycentrics w.r.t. the perturbed triangle. This returns a sound
    sup over ALL draws: numerators/denominator are bounded with
    ``|cross(u, v)| <= |u||v|`` perturbation terms, and the convex bound is
    maximized over the four image corners. Returns None when the
    denominator bound is non-positive (cc too large vs the anchor triangle
    — severities 1-2), i.e. no finite static band exists.
    """
    s = float(min(h, w) // 3)
    cyc, cxc = h // 2, w // 2
    pts1 = np.array(
        [[cxc + s, cyc + s], [cxc + s, cyc - s], [cxc - s, cyc - s]],
        np.float64,
    )
    e1, e2 = pts1[1] - pts1[0], pts1[2] - pts1[0]
    a0 = abs(e1[0] * e2[1] - e1[1] * e2[0])
    den = (a0
           - 2 * math.sqrt(2) * cc
           * (np.linalg.norm(e1) + np.linalg.norm(e2))
           - 8 * cc * cc)
    if den <= 0:
        return None
    worst = 0.0
    for px, py in ((0, 0), (w - 1, 0), (0, h - 1), (w - 1, h - 1)):
        p = np.array([px, py], np.float64)
        tot = 0.0
        for i in range(3):
            aj = pts1[(i + 1) % 3] - p
            ak = pts1[(i + 2) % 3] - p
            tot += (abs(aj[0] * ak[1] - aj[1] * ak[0])
                    + math.sqrt(2) * cc
                    * (np.linalg.norm(aj) + np.linalg.norm(ak))
                    + 2 * cc * cc)
        worst = max(worst, tot / den)
    return cc * worst


def _band(d: float | None) -> tuple[int, int] | None:
    """(D, D) offset band for the masked-slice warp, or None (gather)."""
    if d is None:
        return None
    di = int(math.ceil(d))
    return (di, di) if (2 * di + 1) ** 2 <= ELASTIC_TAPS_MAX else None


def elastic_transform(x, key, severity=1):
    # constants keep the reference's 244 quirk (corruptions.py:392-396)
    ca, cb, cc = [
        (244 * 2, 244 * 0.7, 244 * 0.1),
        (244 * 2, 244 * 0.08, 244 * 0.2),
        (244 * 0.05, 244 * 0.01, 244 * 0.02),
        (244 * 0.07, 244 * 0.01, 244 * 0.02),
        (244 * 0.12, 244 * 0.01, 244 * 0.02),
    ][severity - 1]
    h, w = x.shape[0], x.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)

    # random affine of three anchor points (cv2.getAffineTransform + warp)
    center = jnp.asarray([h // 2, w // 2], jnp.float32)
    square = float(min(h, w) // 3)
    pts1 = jnp.asarray(
        [
            [center[1] + square, center[0] + square],
            [center[1] + square, center[0] - square],
            [center[1] - square, center[0] - square],
        ],
        jnp.float32,
    )
    pts2 = pts1 + jax.random.uniform(k1, (3, 2), jnp.float32, -cc, cc)
    # solve 2x3 affine M mapping pts1 -> pts2 (cv2.getAffineTransform)
    ones = jnp.ones((3, 1), jnp.float32)
    src = jnp.concatenate([pts1, ones], axis=1)  # (3,3)
    m_t = jnp.linalg.solve(src, pts2)  # (3,2): [x', y'] = [x y 1] @ m_t
    # warpAffine maps OUTPUT coords through the INVERSE of M
    minv_t = jnp.linalg.solve(
        jnp.concatenate([pts2, ones], axis=1), pts1
    )  # output -> input
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)  # (h,w,3)
    srcpts = coords @ minv_t  # (h,w,2) -> (x_src, y_src)
    # the warps dominate the corruption sweep (chip: ~170 img/s, ~88x
    # under clean — benchmarks/corruptions.json). Both displacement fields
    # have sound STATIC bounds at severities 3-5 (the affine via the
    # barycentric bound, the smoothed field by |field| <= 1 since the blur
    # kernel is positive and normalized -> |disp| <= ca), and the bound is
    # passed down so ops/image.py can pick a faster exact form — but on
    # this chip every such form measured or crashed worse than the plain
    # gather at these band sizes (729-3721 taps: unrolled masked slices
    # crash the compile helper, multi-element-slice gathers crash it too,
    # single-row takes are rate-bound ~380-400 img/s/warp; see
    # scripts/bench_warp_bounded.py). The bound stays plumbed for a future
    # VMEM-resident Pallas banded kernel.
    x_aff = map_coordinates_bilinear_reflect(
        x, srcpts[..., 1], srcpts[..., 0],
        max_offset=_band(_affine_band_bound(h, w, float(cc))),
    )
    del m_t

    # gaussian-smoothed random displacement field, sigma=cb, truncate=3
    dx = jax.random.uniform(k2, (h, w), jnp.float32, -1.0, 1.0)
    dy = jax.random.uniform(k3, (h, w), jnp.float32, -1.0, 1.0)
    dx = gaussian_blur(dx[..., None], float(cb), truncate=3.0)[..., 0] * ca
    dy = gaussian_blur(dy[..., None], float(cb), truncate=3.0)[..., 0] * ca
    out = map_coordinates_bilinear_reflect(
        x_aff, yy + dy, xx + dx, max_offset=_band(float(ca)),
    )
    return jnp.clip(out, 0.0, 1.0)


# ---------------------------------------------------------------------------
# registry (order matches reference corruption_tuple,
# imagenet_c/__init__.py:5-10 — first 15 standard, last 4 validation)
# ---------------------------------------------------------------------------

CORRUPTIONS = {
    "gaussian_noise": gaussian_noise,
    "shot_noise": shot_noise,
    "impulse_noise": impulse_noise,
    "defocus_blur": defocus_blur,
    "glass_blur": glass_blur,
    "motion_blur": motion_blur_c,
    "zoom_blur": zoom_blur,
    "snow": snow,
    "frost": frost,
    "fog": fog,
    "brightness": brightness,
    "contrast": contrast,
    "elastic_transform": elastic_transform,
    "pixelate": pixelate,
    # bit-exact on-device libjpeg transcode (entropy coding is lossless, so
    # the pixel effect needs no codec) — robustart_tpu/noise/corruptions/
    # jpeg_jax.py, asserted bitwise vs PIL in tests/test_jpeg_jax.py
    "jpeg_compression": _jpeg_compression,
    "speckle_noise": speckle_noise,
    "gaussian_blur": gaussian_blur_c,
    "spatter": spatter,
    "saturate": saturate,
}

CORRUPTION_ORDER = (
    "gaussian_noise", "shot_noise", "impulse_noise", "defocus_blur",
    "glass_blur", "motion_blur", "zoom_blur", "snow", "frost", "fog",
    "brightness", "contrast", "elastic_transform", "pixelate",
    "jpeg_compression", "speckle_noise", "gaussian_blur", "spatter",
    "saturate",
)


@functools.partial(jax.jit, static_argnames=("name", "severity"))
def corrupt_batch(x: jax.Array, key: jax.Array, name: str, severity: int = 1) -> jax.Array:
    """Apply one corruption to a batch (B, H, W, 3) of [0,1] images on device.

    vmapped over the batch with per-image keys — the TPU-native replacement
    for the reference's per-image Python loop (add_noise_utils.py:22-31).
    """
    fn = CORRUPTIONS[name]
    keys = jax.random.split(key, x.shape[0])
    return jax.vmap(lambda img, k: fn(img, k, severity))(x, keys)
