"""Oriented-BRIEF (ORB-style) 256-bit descriptors, batched over keypoints.

Parity target: cv::ORB descriptor compute in `keypoint_detector_simple.cpp:8-36`
and `keypoint_detector_parallel.cpp:178-181` (descriptor on the device path).

Differences from OpenCV by design (this is NOT a port): the 256 sampling pairs
are a deterministic pseudo-random pattern (Gaussian, ORB paper §4.2 style)
generated at import with a fixed seed, rather than OpenCV's learned pattern.
Matching is always done against descriptors from the same pattern, so parity
is at the *capability* level (rotation-aware 256-bit binary descriptor with
Hamming matching), not bit-for-bit.

TPU-first: orientation by intensity centroid over a disk becomes two fixed
convolution-style weighted sums sampled per keypoint; BRIEF sampling is a
batched bilinear gather of 512 rotated offsets; the bit-pack keeps both a
packed uint32 (N, 8) form (storage) and is cheap to unpack for the MXU
Hamming matcher (see ops/match.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.ops.image import bilinear_sample, gaussian_blur

_PATCH_RADIUS = 15  # ORB patch 31x31


def _make_pattern(n_bits: int = 256, radius: int = _PATCH_RADIUS, seed: int = 1234) -> np.ndarray:
    """(n_bits, 4) float32: (x1, y1, x2, y2) offsets, Gaussian σ=radius/2, clipped."""
    rs = np.random.RandomState(seed)
    pat = rs.normal(0.0, radius / 2.0, size=(n_bits, 4))
    return np.clip(pat, -radius + 1, radius - 1).astype(np.float32)


ORB_PATTERN = _make_pattern()

# disk offsets for the intensity centroid (radius 15), precomputed dense grid + mask
_yy, _xx = np.mgrid[-_PATCH_RADIUS : _PATCH_RADIUS + 1, -_PATCH_RADIUS : _PATCH_RADIUS + 1]
_DISK = (_yy ** 2 + _xx ** 2 <= _PATCH_RADIUS ** 2).astype(np.float32)
_CENTROID_X = (_xx * _DISK).astype(np.float32)
_CENTROID_Y = (_yy * _DISK).astype(np.float32)


@jax.jit
def orb_orientation(img, xy):
    """Intensity-centroid orientation per keypoint: theta = atan2(m01, m10).

    img: (H, W); xy: (N, 2). Returns (N,) angle in radians.

    TPU path: the reference/OpenCV evaluate the moments with a per-keypoint
    disk scan; ~500k scattered loads per frame is the worst access pattern
    for the TPU memory system. Instead the centroid moments are computed
    DENSELY for every pixel with integral images (double cumsum + shifted
    differences — pure VPU) over the 31x31 square patch, then sampled at the
    keypoints. Square-vs-disk support changes the moments slightly but the
    centroid DIRECTION (all that matters) is stable; matching is always
    within one pattern family (see module docstring parity note).
    """
    H, W = img.shape
    r = _PATCH_RADIUS
    xg = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)
    yg = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)

    def box(F):
        # sum over [y-r, y+r] x [x-r, x+r] (zero outside the image) via an
        # integral image: P[a, b] = I(a-r-1, b-r-1), zero above/left, clamped
        # below/right.
        S = jnp.cumsum(jnp.cumsum(F, 0), 1)
        P = jnp.pad(S, ((1, 0), (1, 0)))
        P = jnp.pad(P, ((r, r), (r, r)), mode="edge")
        return (P[2 * r + 1 :, 2 * r + 1 :] - P[:H, 2 * r + 1 :]
                - P[2 * r + 1 :, :W] + P[:H, :W])

    bA = box(img)
    bAx = box(img * xg)
    bAy = box(img * yg)
    m10 = bAx - xg * bA
    m01 = bAy - yg * bA
    xi = jnp.clip(jnp.round(xy[:, 0]).astype(jnp.int32), 0, W - 1)
    yi = jnp.clip(jnp.round(xy[:, 1]).astype(jnp.int32), 0, H - 1)
    flat = yi * W + xi
    return jnp.arctan2(m01.reshape(-1)[flat], m10.reshape(-1)[flat])


@functools.partial(jax.jit, static_argnames=())
def orb_descriptors(img, xy, valid):
    """Steered-BRIEF 256-bit descriptors.

    img: (H, W) float32 (will be smoothed, as cv::ORB does); xy: (N, 2);
    valid: (N,) bool. Returns:
      packed:   (N, 8) uint32  — 256 bits packed, invalid rows all-zero
      angles:   (N,) float32

    Sampling is nearest-pixel on the smoothed image — the same cvRound
    convention as cv::ORB's GET_VALUE — one flat gather per pattern point.
    """
    H, W = img.shape
    sm = gaussian_blur(img, sigma=2.0, radius=4)
    theta = orb_orientation(sm, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    pat = jnp.asarray(ORB_PATTERN)  # (256, 4)
    sm_flat = sm.reshape(-1)

    def sample(px, py):  # (256,) pattern offsets -> (N, 256) NN samples
        qx = xy[:, 0:1] + px[None, :] * c[:, None] - py[None, :] * s[:, None]
        qy = xy[:, 1:2] + px[None, :] * s[:, None] + py[None, :] * c[:, None]
        xi = jnp.clip(jnp.round(qx).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(qy).astype(jnp.int32), 0, H - 1)
        return sm_flat[yi * W + xi]

    v1 = sample(pat[:, 0], pat[:, 1])
    v2 = sample(pat[:, 2], pat[:, 3])
    bits = (v1 < v2).astype(jnp.uint32)  # (N, 256)
    bits = bits * valid[:, None].astype(jnp.uint32)
    # pack 256 bits -> 8 uint32 words
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    packed = jnp.sum(words, axis=-1).astype(jnp.uint32)
    return packed, theta
