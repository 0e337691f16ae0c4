"""On-device image ops: separable resizes as matmuls, blurs, color space.

TPU-native replacements for the reference's host-side C libraries
(ImageMagick/Wand motion blur, OpenCV filter2D/resize, scipy/skimage
gaussian+zoom — reference RobustART/noise/utils/imagenet_c/corruptions.py and
imagenet_s_gen.py:19-34; inventory in SURVEY.md §2.10).

Key design: every separable resample (PIL box/bilinear/hamming/bicubic/
lanczos/nearest and OpenCV nearest/linear/area/cubic/lanczos4) is expressed as
two dense matmuls with precomputed weight matrices — ``out = W_h @ img @
W_w^T`` — which the MXU executes at full tilt and which makes resize kernels
bit-faithful to each library's filter definition (the decode/resize variation
*is* the ImageNet-S benchmark signal, imagenet_s_gen.py:19-34). Weight
matrices are built once per (in_size, out_size, method) on host and cached.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Filter definitions (public formulas of PIL Resample.c / OpenCV resize)
# ---------------------------------------------------------------------------


def _box(x: np.ndarray) -> np.ndarray:
    return ((x > -0.5) & (x <= 0.5)).astype(np.float64)


def _triangle(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    return np.maximum(0.0, 1.0 - x)


def _hamming(x: np.ndarray) -> np.ndarray:
    x = np.abs(x)
    out = np.zeros_like(x)
    nz = (x > 0) & (x < 1.0)
    xp = x[nz] * np.pi
    out[nz] = np.sin(xp) / xp * (0.54 + 0.46 * np.cos(xp))
    out[x == 0] = 1.0
    return out


def _cubic(a: float) -> Callable[[np.ndarray], np.ndarray]:
    def f(x: np.ndarray) -> np.ndarray:
        x = np.abs(x)
        out = np.zeros_like(x)
        m1 = x < 1.0
        m2 = (x >= 1.0) & (x < 2.0)
        out[m1] = ((a + 2.0) * x[m1] - (a + 3.0)) * x[m1] * x[m1] + 1.0
        out[m2] = (((x[m2] - 5.0) * x[m2] + 8.0) * x[m2] - 4.0) * a
        return out

    return f


def _sinc(x: np.ndarray) -> np.ndarray:
    return np.sinc(x)  # np.sinc is sin(pi x)/(pi x)


def _lanczos(support: float) -> Callable[[np.ndarray], np.ndarray]:
    def f(x: np.ndarray) -> np.ndarray:
        out = _sinc(x) * _sinc(x / support)
        out[np.abs(x) >= support] = 0.0
        return out

    return f


# (filter fn, support) per method name
_PIL_FILTERS: dict[str, tuple[Callable, float]] = {
    "pil-box": (_box, 0.5),
    "pil-bilinear": (_triangle, 1.0),
    "pil-hamming": (_hamming, 1.0),
    "pil-cubic": (_cubic(-0.5), 2.0),
    "pil-lanczos": (_lanczos(3.0), 3.0),
}
_CV_FILTERS: dict[str, tuple[Callable, float]] = {
    "opencv-bilinear": (_triangle, 1.0),
    "opencv-cubic": (_cubic(-0.75), 2.0),
    "opencv-lanczos": (_lanczos(4.0), 4.0),
}


@functools.lru_cache(maxsize=None)
def resize_matrix(in_size: int, out_size: int, method: str) -> np.ndarray:
    """Dense (out_size, in_size) 1-D resampling matrix for ``method``.

    PIL convention (Pillow Resample.c): center=(i+0.5)*scale, taps at input
    pixel centers j+0.5, filter arg ((j+0.5)-center)/filterscale, weights
    normalized. OpenCV convention: src = (i+0.5)*scale - 0.5, taps at integer
    j, border replication for out-of-range taps.
    """
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), dtype=np.float64)

    if method == "pil-nearest":
        # Pillow ScaleAffine pretabulates xin by *accumulating* xo += a1 from
        # xo = a1/2 (Geometry.c) — repeated-addition float error decides the
        # exact-integer ties, so we replicate the accumulation bit-for-bit.
        xo = scale / 2.0
        for i in range(out_size):
            w[i, min(int(xo), in_size - 1)] = 1.0
            xo += scale
        return w.astype(np.float32)
    if method == "opencv-nearest":
        for i in range(out_size):
            j = min(int(np.floor(i * scale)), in_size - 1)
            w[i, j] = 1.0
        return w.astype(np.float32)
    if method == "opencv-area":
        if scale >= 1.0:
            # true area averaging over [i*scale, (i+1)*scale)
            for i in range(out_size):
                lo, hi = i * scale, (i + 1) * scale
                j0, j1 = int(np.floor(lo)), int(np.ceil(hi))
                for j in range(j0, min(j1, in_size)):
                    cover = min(hi, j + 1) - max(lo, j)
                    if cover > 0:
                        w[i, j] = cover
                w[i] /= max(w[i].sum(), 1e-12)
            return w.astype(np.float32)
        # upscale: OpenCV INTER_AREA degenerates to a bilinear variant with
        # sx = floor(dx*scale); fx = (dx+1) - (sx+1)/scale, clamped at 0 and
        # taken mod 1 (OpenCV resize.cpp INTER_AREA non-integer upscale path)
        inv_scale = out_size / in_size
        for i in range(out_size):
            sx = int(np.floor(i * scale))
            fx = (i + 1) - (sx + 1) * inv_scale
            fx = 0.0 if fx <= 0 else fx - np.floor(fx)
            j0 = min(max(sx, 0), in_size - 1)
            j1 = min(sx + 1, in_size - 1)
            w[i, j0] += 1.0 - fx
            w[i, j1] += fx
        return w.astype(np.float32)

    if method in _PIL_FILTERS:
        filt, support = _PIL_FILTERS[method]
        filterscale = max(scale, 1.0)
        sup = support * filterscale
        for i in range(out_size):
            center = (i + 0.5) * scale
            jmin = max(int(center - sup + 0.5), 0)
            jmax = min(int(center + sup + 0.5), in_size)
            taps = np.arange(jmin, jmax, dtype=np.float64)
            vals = filt((taps + 0.5 - center) / filterscale)
            s = vals.sum()
            if s != 0:
                vals /= s
            w[i, jmin:jmax] = vals
        return w.astype(np.float32)

    if method in _CV_FILTERS:
        filt, support = _CV_FILTERS[method]
        filterscale = max(scale, 1.0) if method == "opencv-area" else 1.0
        # OpenCV does NOT widen the kernel on downscale for linear/cubic/
        # lanczos (that's why they alias) — filterscale stays 1.
        sup = support
        for i in range(out_size):
            src = (i + 0.5) * scale - 0.5
            j0 = int(np.floor(src - sup)) + 1
            j1 = int(np.floor(src + sup)) + 1
            taps = np.arange(j0, j1, dtype=np.float64)
            vals = filt(taps - src)
            s = vals.sum()
            if s != 0:
                vals /= s
            # border replicate out-of-range taps
            for t, v in zip(taps.astype(int), vals):
                w[i, min(max(t, 0), in_size - 1)] += v
        return w.astype(np.float32)

    raise ValueError(f"unknown resize method {method!r}")


RESIZE_METHODS = tuple(
    list(_PIL_FILTERS) + ["pil-nearest"] + list(_CV_FILTERS)
    + ["opencv-nearest", "opencv-area"]
)


def resize(
    x: jax.Array, out_hw: tuple[int, int], method: str = "pil-bilinear"
) -> jax.Array:
    """Separable resize of (..., H, W, C) via two weight matmuls (MXU)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    wh = jnp.asarray(resize_matrix(h_in, h_out, method))
    ww = jnp.asarray(resize_matrix(w_in, w_out, method))
    x = jnp.einsum("oh,...hwc->...owc", wh, x)
    x = jnp.einsum("ow,...hwc->...hoc", ww, x)
    return x


# ---------------------------------------------------------------------------
# Blurs
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def gaussian_kernel_1d(sigma: float, truncate: float = 4.0) -> np.ndarray:
    """scipy.ndimage-compatible 1-D gaussian (radius = int(truncate*sigma+0.5))."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _sep_conv2d_nearest(x: jax.Array, k: np.ndarray) -> jax.Array:
    """Separable 2-D convolution with 'nearest' (edge-replicate) padding.

    Matches scipy.ndimage.gaussian_filter(mode='nearest') — the default used
    by skimage.filters.gaussian in the reference corruptions.
    """
    r = (len(k) - 1) // 2
    kj = jnp.asarray(k)
    # rows
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :1, :, :], r, axis=-3), x,
         jnp.repeat(x[..., -1:, :, :], r, axis=-3)], axis=-3,
    )
    x = sum(kj[i] * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[-3], axis=-3)
            for i in range(len(k)))
    # cols
    xp = jnp.concatenate(
        [jnp.repeat(x[..., :, :1, :], r, axis=-2), x,
         jnp.repeat(x[..., :, -1:, :], r, axis=-2)], axis=-2,
    )
    x = sum(kj[i] * jax.lax.dynamic_slice_in_dim(xp, i, x.shape[-2], axis=-2)
            for i in range(len(k)))
    return x


@functools.lru_cache(maxsize=None)
def _nearest_blur_matrix(n: int, sigma: float, truncate: float) -> np.ndarray:
    """(n, n) banded matrix G with G[i, j] = Σ_t k[t]·[clip(i+t-r, 0, n-1)=j]
    — one separable-blur axis with scipy 'nearest' boundary ABSORBED into
    the clipped edge rows, so no padded intermediate is ever materialized."""
    k = gaussian_kernel_1d(sigma, truncate).astype(np.float64)
    r = (len(k) - 1) // 2
    g = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    for t, kt in enumerate(k):
        np.add.at(g, (idx, np.clip(idx + t - r, 0, n - 1)), kt)
    return g.astype(np.float32)


def _sep_blur_matmul(x: jax.Array, sigma: float, truncate: float) -> jax.Array:
    """Separable gaussian blur as two banded MXU matmuls.

    The tap-sum form (`_sep_conv2d_nearest`) issues one HBM stream per tap
    per axis — 18 streams at sigma=1 (measured 10.6 ms per batch-512
    224² blur on chip, scripts/probe_glass_stages.py); here each axis is
    ONE (H, H)/(W, W) matmul at f32-exact precision (~0.14 TFLOP total at
    those shapes) and tap count no longer matters. max|Δ| vs the tap sum
    ~1e-7 (f32 HIGHEST accumulation, weights positive sum-1)."""
    h, w = x.shape[-3], x.shape[-2]
    gh = jnp.asarray(_nearest_blur_matrix(h, float(sigma), float(truncate)))
    gw = jnp.asarray(_nearest_blur_matrix(w, float(sigma), float(truncate)))
    y = jnp.einsum("ih,...hwc->...iwc", gh, x,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("jw,...hwc->...hjc", gw, y,
                      precision=jax.lax.Precision.HIGHEST)


def gaussian_blur(x: jax.Array, sigma: float, truncate: float = 4.0) -> jax.Array:
    """Gaussian blur of (..., H, W, C), scipy/skimage 'nearest' semantics."""
    if sigma <= 0:
        return x
    if x.shape[-3] >= 16 and x.shape[-2] >= 16:
        return _sep_blur_matmul(x, float(sigma), truncate)
    return _sep_conv2d_nearest(x, gaussian_kernel_1d(float(sigma), truncate))


@functools.lru_cache(maxsize=None)
def disk_kernel(radius: int, alias_blur: float = 0.1) -> np.ndarray:
    """Defocus disk kernel, reference formula (corruptions.py:26-37):
    binary disk normalized then gaussian-smoothed (cv2.GaussianBlur equiv)."""
    if radius <= 8:
        coords = np.arange(-8, 8 + 1)
        ksize = 3
    else:
        coords = np.arange(-radius, radius + 1)
        ksize = 5
    xg, yg = np.meshgrid(coords, coords)
    aliased = np.array((xg**2 + yg**2) <= radius**2, dtype=np.float64)
    aliased /= aliased.sum()
    # cv2.GaussianBlur(ksize, sigmaX=alias_blur): reflect-101 border
    half = (ksize - 1) // 2
    t = np.arange(-half, half + 1, dtype=np.float64)
    g = np.exp(-0.5 * (t / alias_blur) ** 2)
    g /= g.sum()
    pad = np.pad(aliased, half, mode="reflect")
    tmp = np.zeros_like(aliased)
    for i, gv in enumerate(g):
        tmp += gv * pad[i : i + aliased.shape[0], half : half + aliased.shape[1]]
    out = np.zeros_like(aliased)
    pad = np.pad(tmp, half, mode="reflect")
    for i, gv in enumerate(g):
        out += gv * pad[half : half + aliased.shape[0], i : i + aliased.shape[1]]
    return out.astype(np.float32)


def _refl101(j: np.ndarray, n: int) -> np.ndarray:
    """cv2 BORDER_REFLECT_101 index map (edge not repeated): …3 2 1 |0 1 2
    … n-1| n-2 n-3…"""
    if n == 1:
        return np.zeros_like(j)
    m = 2 * (n - 1)
    j = np.abs(j) % m
    return np.where(j >= n, m - j, j)


@functools.lru_cache(maxsize=None)
def _reflect101_matrix(n: int, taps_bytes: bytes) -> np.ndarray:
    """(n, n) matrix applying a 1-D correlation with reflect-101 border:
    out[i] = Σ_t taps[t]·x[refl101(i + t - r)]."""
    taps = np.frombuffer(taps_bytes, np.float64)
    r = (len(taps) - 1) // 2
    g = np.zeros((n, n), np.float64)
    idx = np.arange(n)
    for t, kt in enumerate(taps):
        np.add.at(g, (idx, _refl101(idx + t - r, n)), kt)
    return g.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _filter2d_svd_terms(kernel_bytes: bytes, kh: int, kw: int) -> tuple:
    """Exact separable decomposition K = Σ_k u_k v_kᵀ (f64 SVD, terms with
    σ ≤ σ₀·1e-9 dropped — the disk kernels are EXACTLY low-rank: radius 6
    is rank 5 of 17)."""
    k = np.frombuffer(kernel_bytes, np.float64).reshape(kh, kw)
    u, s, vt = np.linalg.svd(k)
    keep = np.nonzero(s > (s[0] * 1e-9 if s[0] > 0 else 0))[0]
    return tuple(((u[:, i] * s[i]).tobytes(), vt[i].tobytes()) for i in keep)


def _filter2d_svd_matmul(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """filter2d as Σ_rank (banded H-matmul · banded W-matmul) on the MXU.

    The depthwise-conv lowering streams the window from HBM at VPU rate
    (defocus severity 3 measured 53.7 ms/batch-512 of overhead on chip);
    each SVD term is two dense (H,H)/(W,W) matmuls with the reflect-101
    border absorbed into the matrices (no padded intermediate). f32-exact:
    HIGHEST-precision accumulation, recomposition error ~1e-15 (f64 SVD)."""
    h, w = x.shape[-3], x.shape[-2]
    terms = _filter2d_svd_terms(
        kernel.astype(np.float64).tobytes(), *kernel.shape
    )
    out = None
    for ub, vb in terms:
        gh = jnp.asarray(_reflect101_matrix(h, ub))
        gw = jnp.asarray(_reflect101_matrix(w, vb))
        y = jnp.einsum("ih,...hwc->...iwc", gh, x,
                       precision=jax.lax.Precision.HIGHEST)
        y = jnp.einsum("jw,...hwc->...hjc", gw, y,
                       precision=jax.lax.Precision.HIGHEST)
        out = y if out is None else out + y
    return jnp.zeros_like(x) if out is None else out.astype(x.dtype)


def filter2d_same(x: jax.Array, kernel: np.ndarray) -> jax.Array:
    """2-D correlation per channel with reflect-101 border (cv2.filter2D)."""
    if x.shape[-3] >= 16 and x.shape[-2] >= 16:
        return _filter2d_svd_matmul(x, kernel)
    kh, kw = kernel.shape
    rh, rw = (kh - 1) // 2, (kw - 1) // 2
    xp = jnp.pad(
        x,
        [(0, 0)] * (x.ndim - 3) + [(rh, rh), (rw, rw), (0, 0)],
        mode="reflect",
    )
    # express as depthwise conv: move channels to batch for lax.conv
    lead = xp.shape[:-3]
    c = xp.shape[-1]
    flat = xp.reshape((-1,) + xp.shape[-3:])
    flat = jnp.moveaxis(flat, -1, 1).reshape(-1, 1, xp.shape[-3], xp.shape[-2])
    k = jnp.asarray(kernel, flat.dtype).reshape(1, 1, kh, kw)
    out = jax.lax.conv_general_dilated(
        flat, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out.reshape((-1, c) + out.shape[-2:])
    out = jnp.moveaxis(out, 1, -1)
    return out.reshape(lead + out.shape[-3:])


@functools.lru_cache(maxsize=None)
def motion_blur_offsets(radius: float, sigma: float, angle_deg: float):
    """ImageMagick MotionBlurImage kernel: gaussian-weighted taps marching
    along a line at ``angle``. Width per GetOptimalKernelWidth1D; taps at
    integer steps (i*cos, -i*sin) trailing from the pixel
    (reference corruptions.py:42-51 drives this C call via ctypes)."""
    # GetOptimalKernelWidth1D: smallest odd width where the tail is negligible
    if sigma <= 0:
        width = int(2 * math.ceil(radius) + 1)
    else:
        alpha = 1.0 / (2.0 * sigma * sigma)
        beta = 1.0 / (math.sqrt(2 * math.pi) * sigma)
        width = 5
        while True:
            value = beta * math.exp(-alpha * ((width - 1) / 2.0) ** 2)
            if value < 1e-6:  # MagickEpsilon-scale cutoff
                break
            width += 2
            if width > 255:
                break
    n = (width + 1) // 2 if radius <= 0 else int(radius) + 1
    n = max(n, 3)
    i = np.arange(n, dtype=np.float64)
    if sigma > 0:
        w = np.exp(-0.5 * (i / sigma) ** 2)
    else:
        w = np.ones_like(i)
    w /= w.sum()
    theta = math.radians(angle_deg)
    dx = np.round(i * math.cos(theta)).astype(np.int32)
    dy = np.round(i * math.sin(theta)).astype(np.int32)
    return dx, dy, w.astype(np.float32)


def motion_blur(x: jax.Array, radius: float, sigma: float, angle_deg: float) -> jax.Array:
    """Directional blur along ``angle`` with gaussian tap weights.

    Edge handling: clamp (replicate), matching ImageMagick's edge virtual
    pixel behavior closely enough for distributional parity.
    """
    dx, dy, w = motion_blur_offsets(float(radius), float(sigma), float(angle_deg))
    h, wdt = x.shape[-3], x.shape[-2]
    # the taps have STATIC integer offsets, so each is an edge-padded
    # static SLICE — identical to the index-clip gather form (pad 'edge'
    # replicates the boundary exactly like clip), but pure slice/FMA work.
    # The gather form ran at 466 img/s on chip and its fusion with the
    # int8 conv net crashed the XLA TPU compiler (HTTP 500, round-4 sweep).
    py, px = int(np.abs(dy).max()), int(np.abs(dx).max())
    lead = x.ndim - 3
    xp = jnp.pad(
        x,
        (((0, 0),) * lead + ((py, py), (px, px), (0, 0))),
        mode="edge",
    )
    out = jnp.zeros_like(x)
    for ddx, ddy, wv in zip(dx, dy, w):
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, py + int(ddy), py + int(ddy) + h,
                                 axis=lead),
            px + int(ddx), px + int(ddx) + wdt, axis=lead + 1,
        )
        out = out + wv * shifted
    return out


# ---------------------------------------------------------------------------
# Color space (matching skimage rgb2hsv/hsv2rgb formulas)
# ---------------------------------------------------------------------------


def rgb_to_hsv(x: jax.Array) -> jax.Array:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    safe = jnp.maximum(delta, 1e-12)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        r == maxc, bc - gc, jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, (h / 6.0) % 1.0)
    return jnp.stack([h, s, v], axis=-1)


def hsv_to_rgb(x: jax.Array) -> jax.Array:
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def rgb_to_gray(x: jax.Array) -> jax.Array:
    """cv2.cvtColor RGB2GRAY weights (used by snow, corruptions.py:308)."""
    w = jnp.asarray([0.299, 0.587, 0.114], x.dtype)
    return jnp.tensordot(x, w, axes=[[-1], [0]])


# ---------------------------------------------------------------------------
# Geometric
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _motion_bank_table(radius: float, sigma: float, angles: tuple):
    """Union tap support + per-angle weight table for motion_blur_bank."""
    tap_w: dict[tuple[int, int], np.ndarray] = {}
    for a_i, ang in enumerate(angles):
        dx, dy, w = motion_blur_offsets(radius, sigma, ang)
        for ddx, ddy, wv in zip(dx, dy, w):
            key = (int(ddy), int(ddx))
            if key not in tap_w:
                tap_w[key] = np.zeros(len(angles), np.float32)
            tap_w[key][a_i] += wv  # ImageMagick taps may revisit an offset
    offsets = sorted(tap_w)
    table = np.stack([tap_w[o] for o in offsets])  # (n_offsets, n_angles)
    py = max(abs(o[0]) for o in offsets)
    px = max(abs(o[1]) for o in offsets)
    return offsets, table, py, px


def motion_blur_bank(x: jax.Array, idx: jax.Array, radius: float,
                     sigma: float, angles: tuple) -> jax.Array:
    """Motion blur at a per-image angle picked from a static bank.

    The direct form — ``lax.switch`` over one motion_blur per bank angle —
    executes EVERY branch under vmap (batched predicate ⇒ all branches +
    select): 32 full blurs per image, and the 32-subprogram graph fused
    with the int8 ResNet crashed the XLA TPU compiler (HTTP 500,
    benchmarks/corruptions.json round-4 sweep). Here the angle choice only
    selects a WEIGHT COLUMN: the union of all bank kernels' integer offsets
    is static (heavily overlapping lines through the origin), each tap is
    one edge-padded static slice shared by all angles, and ``idx`` gathers
    the (n_offsets,) weight vector from a tiny host-built table. Taps where
    this angle's kernel has no entry contribute an exact ``0.0 * tap``.
    """
    if x.ndim == 3 and _pallas_warp_ok(x.shape[0]):
        # VMEM tap-loop kernel: walks only THIS image's ~n_taps kernel
        # instead of streaming the ~300-offset union from HBM
        # (ops/pallas_motion.py; motion_blur row 1,926 img/s → see
        # benchmarks/corruptions.json round-4 re-measure)
        from robustart_tpu.ops.pallas_motion import motion_blur_bank_pallas

        return motion_blur_bank_pallas(x, idx, radius, sigma, angles)
    offsets, table, py, px = _motion_bank_table(
        float(radius), float(sigma), tuple(float(a) for a in angles)
    )
    lead = x.ndim - 3
    h, w = x.shape[-3], x.shape[-2]
    xp = jnp.pad(
        x, (((0, 0),) * lead + ((py, py), (px, px), (0, 0))), mode="edge"
    )
    wcol = jnp.take(jnp.asarray(table), idx, axis=1)  # (n_offsets,)
    out = jnp.zeros_like(x)
    for t, (ddy, ddx) in enumerate(offsets):
        shifted = jax.lax.slice_in_dim(
            jax.lax.slice_in_dim(xp, py + ddy, py + ddy + h, axis=lead),
            px + ddx, px + ddx + w, axis=lead + 1,
        )
        out = out + wcol[t] * shifted
    return out


def map_coordinates_bilinear_reflect(
    img: jax.Array, coords_y: jax.Array, coords_x: jax.Array,
    max_offset: tuple[int, int] | None = None,
) -> jax.Array:
    """Bilinear sampling at float coords with scipy 'reflect' boundary.

    Equivalent to scipy map_coordinates(order=1, mode='reflect') used by
    elastic_transform (reference corruptions.py:424). img: (H, W, C);
    coords: (H, W).

    ``max_offset=(Dy, Dx)``: static guarantee that the warp displacement is
    bounded — ``|coords_y - i| ≤ Dy`` and ``|coords_x - j| ≤ Dx`` for every
    output pixel (i, j). With it the per-element 2D GATHER (measured ~380
    img/s batch-256 on chip — XLA's TPU gather lowering fetches 12-byte
    rows, ~50× under HBM bandwidth) is replaced by one of two faster exact
    forms, picked by band size:

    - small bands ((2Dy+1)(2Dx+1) ≤ ``BANDED_UNROLL_MAX``): masked STATIC
      SLICES of a symmetric-padded image — pure fused VPU select/FMA work,
      bitwise-equal to the gather form (masks are disjoint and exhaustive;
      adding a selected value to a zero accumulator is exact in f32).
      Capped because each tap's shifted slice is its own full HBM stream
      (chip layout probe: 200 f32 taps ≈ 410 GB/s total, no stream
      sharing) AND large unrolled slice graphs crash this XLA TPU build's
      compile helper (HTTP 500 at ~700+ taps).
    - larger bounded bands on TPU: the VMEM-resident Pallas banded warp
      (ops/pallas_warp.py) — tap loops over the per-tile offset range with
      the image tile in VMEM; bitwise-equal to this (jitted) gather form
      (tests/test_pallas_warp.py).
    - larger bounded bands elsewhere fall through to the gather form.
      Every multi-element-slice ``lax.gather`` formulation ((2,2,C) corner
      patches, 1D (2C,) x-neighbor pairs — scripts/bench_warp_bounded.py)
      crashes the same compile helper, and single-row takes plateau at
      ~380-400 img/s batch-256 whatever the indexing scheme (flat,
      pre-shifted-into-pad, batch-flattened): the gather lowering itself
      is rate-bound, so the bound buys nothing in XLA.
    """
    h, w = img.shape[0], img.shape[1]
    if max_offset is not None:
        dy, dx = int(max_offset[0]), int(max_offset[1])
        if (2 * dy + 1) * (2 * dx + 1) <= BANDED_UNROLL_MAX:
            return _map_coords_banded(img, coords_y, coords_x, dy, dx)
        if (dy + 1 <= h and dx + 1 <= w and _pallas_warp_ok(h)):
            from robustart_tpu.ops.pallas_warp import warp_banded_pallas

            return warp_banded_pallas(img, coords_y, coords_x, dy, dx)

    def reflect(idx, n):
        # scipy 'reflect': (d c b a | a b c d | d c b a)
        period = 2 * n
        idx = jnp.mod(idx, period)
        return jnp.where(idx >= n, period - 1 - idx, idx)

    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    fy = (coords_y - y0)[..., None]
    fx = (coords_x - x0)[..., None]
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    # flat 1D take beats 2D fancy indexing on chip (377 vs 341 img/s —
    # scripts/bench_gather_variants.py): one linearized index per corner
    # lets XLA lower a single-axis gather of (C,)-rows.
    flat = img.reshape(h * w, img.shape[2])

    def at(yy, xx):
        idx = reflect(yy, h) * w + reflect(xx, w)
        return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (img.shape[2],))

    top = at(y0i, x0i) * (1 - fx) + at(y0i, x0i + 1) * fx
    bot = at(y0i + 1, x0i) * (1 - fx) + at(y0i + 1, x0i + 1) * fx
    return top * (1 - fy) + bot * fy


# max unrolled masked-slice taps for the banded warp. Above this the
# patch-gather form wins: each unrolled tap streams the full image from HBM
# (no slice stream sharing — chip layout probe, scripts/
# bench_layout_probe.py), and ~700+ unrolled taps crash this XLA TPU
# build's compile helper outright (HTTP 500, benchmarks/corruptions.json
# round-4 elastic rows).
BANDED_UNROLL_MAX = 256


def _pallas_warp_ok(h: int) -> bool:
    """Gate the Pallas banded warp to real TPU backends (CPU tests keep the
    gather form — the TPU-semantics interpreter is for correctness, not
    speed) and to heights the kernel tiles evenly."""
    from robustart_tpu.ops.pallas_warp import TILE_H

    if h % TILE_H:
        return False
    try:
        return jax.default_backend() not in ("cpu", "gpu")
    except Exception:  # backend init failure — stay on the gather path
        return False


def _tree_sum(parts: list[jax.Array]) -> jax.Array:
    """Pairwise sum — keeps the adder graph log-depth. The linear chain
    form crashes this XLA TPU build's compile helper at ~200 unrolled
    terms (chip layout probe: nhwc_linear HTTP 500, nhwc_tree fine)."""
    while len(parts) > 1:
        odd = [parts[-1]] if len(parts) % 2 else []
        parts = [a + b for a, b in zip(parts[0::2], parts[1::2])] + odd
    return parts[0]


def _map_coords_banded(img: jax.Array, coords_y: jax.Array,
                       coords_x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Banded-displacement bilinear warp: masked static slices, no gather.

    Requires floor(coords_y[i,j]) - i ∈ [-dy, dy] (same for x) — callers
    derive dy/dx from hard bounds on their displacement fields
    (elastic_transform: the gaussian-smoothed field is bounded by alpha
    since the blur kernel is positive and normalized; the random affine by
    a static barycentric bound). scipy-'reflect' boundary comes from a
    symmetric jnp.pad, identical to the gather path's index reflection for
    |overhang| ≤ min(h, w) (asserted).
    """
    h, w = img.shape[0], img.shape[1]
    dy, dx = int(dy), int(dx)
    if dy + 1 > h or dx + 1 > w:
        raise ValueError(f"band ({dy}, {dx}) exceeds image ({h}, {w})")
    pad = jnp.pad(img, ((dy + 1, dy + 1), (dx + 1, dx + 1), (0, 0)),
                  mode="symmetric")
    rows = jnp.arange(h, dtype=jnp.int32)[:, None]
    cols = jnp.arange(w, dtype=jnp.int32)[None, :]
    y0 = jnp.floor(coords_y)
    x0 = jnp.floor(coords_x)
    fy = (coords_y - y0)[..., None]
    fx = (coords_x - x0)[..., None]
    # integer tap offsets relative to the identity grid, in [-d, d]
    oy = y0.astype(jnp.int32) - rows
    ox = x0.astype(jnp.int32) - cols
    code = (oy + dy) * (2 * dx + 1) + (ox + dx)

    def tile(u, v):
        # padded[(i+u)+dy+1, (j+v)+dx+1] as a static slice
        return jax.lax.slice(
            pad, (u + dy + 1, v + dx + 1, 0), (u + dy + 1 + h, v + dx + 1 + w, img.shape[2]),
        )

    pa, pb, pc, pd = [], [], [], []
    for u in range(-dy, dy + 1):
        for v in range(-dx, dx + 1):
            m = (code == (u + dy) * (2 * dx + 1) + (v + dx))[..., None]
            pa.append(jnp.where(m, tile(u, v), 0.0))
            pb.append(jnp.where(m, tile(u, v + 1), 0.0))
            pc.append(jnp.where(m, tile(u + 1, v), 0.0))
            pd.append(jnp.where(m, tile(u + 1, v + 1), 0.0))
    # masks are disjoint+exhaustive, so every element sums one value with
    # zeros — exact in f32 in any association (tree == linear bitwise)
    a, b, c, d = _tree_sum(pa), _tree_sum(pb), _tree_sum(pc), _tree_sum(pd)
    top = a * (1 - fx) + b * fx
    bot = c * (1 - fx) + d * fx
    return top * (1 - fy) + bot * fy
