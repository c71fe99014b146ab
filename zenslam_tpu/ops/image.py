"""Image preprocessing ops: pyramid, remap, CLAHE, gradients (pure JAX → XLA).

Parity targets in the reference:
- BGR→gray + CLAHE (clip 4.0)   ≡ `processor.cpp:25-39`, `processor.h:38`
- undistort/rectify remap       ≡ cv::remap with precomputed maps (`calibration.cpp:33-240`)
- optical-flow pyramid          ≡ cv::buildOpticalFlowPyramid (`utils_opencv.cpp:525-530`)
- Scharr gradients              ≡ spatial-derivative stage of cv::calcOpticalFlowPyrLK

TPU-first notes: everything is expressed as convolutions and gathers that XLA
fuses; images are float32 [0,1], shape (H, W) or batched (B, H, W). Pyramids
are tuples of static-shaped arrays (one per level) so downstream `jit` sees
static shapes only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_gray(img):
    """(..., H, W, 3) uint8 or [0,1] float -> (..., H, W) float32 in [0,1]."""
    scale = 1.0 / 255.0 if img.dtype == jnp.uint8 else 1.0
    img = img.astype(jnp.float32) * scale
    w = jnp.array([0.299, 0.587, 0.114], jnp.float32)
    return jnp.einsum("...c,c->...", img, w)


def _gaussian_kernel1d(sigma: float, radius: int) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _sep_filter(img, kernel: np.ndarray):
    """Separable 2D filter as shift-and-add (reflect padding).

    XLA lowers single-channel convolutions to a scalar path on TPU (~3 ms for
    a 1x9 tap over 512x384); the same filter as 2k+1 shifted elementwise adds
    is pure VPU work and fuses with its neighbors — ~100x cheaper here.
    img: (..., H, W)."""
    r = len(kernel) // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)], mode="reflect")
    H = img.shape[-2]
    y = sum(float(kernel[i]) * x[..., i : i + H, :] for i in range(2 * r + 1))
    x = jnp.pad(y, [(0, 0)] * (img.ndim - 2) + [(0, 0), (r, r)], mode="reflect")
    W = img.shape[-1]
    return sum(float(kernel[i]) * x[..., :, i : i + W] for i in range(2 * r + 1))


@functools.partial(jax.jit, static_argnames=("sigma", "radius"))
def gaussian_blur(img, sigma: float = 1.0, radius: int = 2):
    """Separable Gaussian blur with reflect padding. img: (H, W) or (B, H, W)."""
    return _sep_filter(img, _gaussian_kernel1d(sigma, radius))


# 5-tap binomial kernel — the cv::pyrDown kernel (1 4 6 4 1)/16.
_PYR_K = np.array([1.0, 4.0, 6.0, 4.0, 1.0], np.float32) / 16.0

_DOWN_MATS: dict = {}


def _down_matrix(n: int) -> np.ndarray:
    """(ceil(n/2), n) strided-binomial downsampling operator: row i holds the
    5-tap pyrDown kernel centered at column 2i (edges renormalized, matching
    reflect-padding mass preservation)."""
    if n not in _DOWN_MATS:
        m = (n + 1) // 2
        D = np.zeros((m, n), np.float32)
        for i in range(m):
            c = 2 * i
            lo = max(c - 2, 0)
            hi = min(c + 3, n)
            w = _PYR_K[lo - (c - 2) : 5 - ((c + 3) - hi)]
            D[i, lo:hi] = w / w.sum()
        _DOWN_MATS[n] = D
    return _DOWN_MATS[n]


def _pyr_down(img):
    """Blur with the pyrDown kernel and decimate by 2. img: (..., H, W).

    Fused blur+decimate as TWO MATMULS on the MXU: down = D_h @ img @ D_wᵀ
    with D the (n/2, n) strided 5-tap operator. The shift-and-add + ::2
    formulation lowered to layout-shuffling fusions costing ~4.5 ms/frame at
    1024² (stride-2 on the lane dim is a cross-lane shuffle); the matmul
    form is ~0.25 GMAC and keeps everything in native tiles.
    """
    H, W = img.shape[-2], img.shape[-1]
    Dh = jnp.asarray(_down_matrix(H))
    Dw = jnp.asarray(_down_matrix(W))
    x = jnp.einsum("hk,...kw->...hw", Dh, img)
    return jnp.einsum("...hw,mw->...hm", x, Dw)


@functools.partial(jax.jit, static_argnames=("levels",))
def build_pyramid(img, levels: int = 4):
    """Gaussian pyramid, level 0 = input. Returns a tuple of arrays.

    ≡ cv::buildOpticalFlowPyramid usage (`utils_opencv.cpp:525-530`), minus the
    per-level gradient caching (gradients are fused into the LK kernel).
    """
    pyr = [img]
    for _ in range(levels):
        pyr.append(_pyr_down(pyr[-1]))
    return tuple(pyr)


def bilinear_sample(img, xy, pad_value: float = 0.0):
    """Bilinearly sample img (H, W) at xy (..., 2) in (x, y) pixel coordinates.

    Out-of-bounds samples return ``pad_value``. This is the gather primitive
    underlying remap, LK window sampling, and descriptor sampling.
    """
    H, W = img.shape
    x, y = xy[..., 0], xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def at(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid, v, pad_value)

    v00 = at(y0i, x0i)
    v01 = at(y0i, x0i + 1)
    v10 = at(y0i + 1, x0i)
    v11 = at(y0i + 1, x0i + 1)
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


@jax.jit
def remap(img, map_x, map_y):
    """cv::remap analogue: out[i,j] = img(map_x[i,j], map_y[i,j]) bilinear.

    Used with the precomputed rectification maps (`calibration.cpp:33-240`).
    """
    xy = jnp.stack([map_x, map_y], axis=-1)
    return bilinear_sample(img, xy)


@functools.partial(jax.jit, static_argnames=("grid", "nbins"))
def clahe(img, clip_limit: float = 4.0, grid: int = 8, nbins: int = 256):
    """Contrast-limited adaptive histogram equalization.

    ≡ cv::createCLAHE(4.0) in `processor.h:38` / `processor.cpp:25-39`.
    img: (H, W) float32 in [0,1]; H, W divisible by ``grid``.

    Implementation: per-tile histogram (one-hot reduce — TPU-friendly), clip +
    redistribute, CDF lookup, then bilinear blend of the 4 neighboring tile
    mappings exactly like the OpenCV implementation.
    """
    H, W = img.shape
    th, tw = H // grid, W // grid
    q = jnp.clip((img * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
    tiles = q.reshape(grid, th, grid, tw).transpose(0, 2, 1, 3).reshape(grid, grid, th * tw)
    # histogram per tile via one-hot matmul (MXU-friendly at (g*g, th*tw) x (nbins))
    onehot = jax.nn.one_hot(tiles, nbins, dtype=jnp.float32)
    hist = jnp.sum(onehot, axis=2)  # (grid, grid, nbins)
    # clip and redistribute excess uniformly
    limit = clip_limit * (th * tw) / nbins
    excess = jnp.sum(jnp.maximum(hist - limit, 0.0), axis=-1, keepdims=True)
    hist = jnp.minimum(hist, limit) + excess / nbins
    cdf = jnp.cumsum(hist, axis=-1)
    cdf = cdf / cdf[..., -1:]
    lut = cdf  # (grid, grid, nbins) mapping bin -> [0,1]

    # bilinear interpolation between tile LUTs
    yy = (jnp.arange(H, dtype=jnp.float32) + 0.5) / th - 0.5
    xx = (jnp.arange(W, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy), 0, grid - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xx), 0, grid - 1).astype(jnp.int32)
    y1 = jnp.clip(y0 + 1, 0, grid - 1)
    x1 = jnp.clip(x0 + 1, 0, grid - 1)
    fy = jnp.clip(yy - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xx - x0, 0.0, 1.0)[None, :]

    def lookup(ti, tj):
        return lut[ti[:, None], tj[None, :], q]

    v00 = lookup(y0, x0)
    v01 = lookup(y0, x1)
    v10 = lookup(y1, x0)
    v11 = lookup(y1, x1)
    return (
        v00 * (1 - fy) * (1 - fx)
        + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx)
        + v11 * fy * fx
    )


_SCHARR_X = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], np.float32) / 32.0
_SCHARR_Y = _SCHARR_X.T.copy()


def _sep_filter2(img, krow: np.ndarray, kcol: np.ndarray):
    """Separable filter with distinct row/col kernels (reflect padding),
    as shift-and-add (see _sep_filter)."""
    r = len(krow) // 2
    x = jnp.pad(img, [(0, 0)] * (img.ndim - 2) + [(r, r), (0, 0)], mode="reflect")
    H = img.shape[-2]
    y = sum(float(krow[i]) * x[..., i : i + H, :] for i in range(2 * r + 1))
    c = len(kcol) // 2
    x = jnp.pad(y, [(0, 0)] * (img.ndim - 2) + [(0, 0), (c, c)], mode="reflect")
    W = img.shape[-1]
    return sum(float(kcol[i]) * x[..., :, i : i + W] for i in range(2 * c + 1))


@jax.jit
def scharr_gradients(img):
    """Scharr x/y gradients with reflect padding. Returns (gx, gy), same shape.

    The 1/32 normalization matches cv::Scharr with scale 1/32 (the LK
    convention: gradient of intensity per pixel step). Scharr is separable:
    [3,10,3]ᵀ·[-1,0,1]/32.
    """
    smooth = np.array([3.0, 10.0, 3.0]) / 16.0
    diff = np.array([-1.0, 0.0, 1.0]) / 2.0
    gx = _sep_filter2(img, smooth, diff)
    gy = _sep_filter2(img, diff, smooth)
    return gx, gy
