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
    """
    offs = jnp.stack(
        [jnp.asarray(_xx, jnp.float32).reshape(-1), jnp.asarray(_yy, jnp.float32).reshape(-1)],
        axis=-1,
    )  # (P, 2)
    pts = xy[:, None, :] + offs[None, :, :]  # (N, P, 2)
    vals = bilinear_sample(img, pts)  # (N, P)
    wx = jnp.asarray(_CENTROID_X.reshape(-1))
    wy = jnp.asarray(_CENTROID_Y.reshape(-1))
    m10 = vals @ wx
    m01 = vals @ wy
    return jnp.arctan2(m01, m10)


@functools.partial(jax.jit, static_argnames=())
def orb_descriptors(img, xy, valid):
    """Steered-BRIEF 256-bit descriptors.

    img: (H, W) float32 (will be smoothed, as cv::ORB does); xy: (N, 2);
    valid: (N,) bool. Returns:
      packed:   (N, 8) uint32  — 256 bits packed, invalid rows all-zero
      angles:   (N,) float32
    """
    sm = gaussian_blur(img, sigma=2.0, radius=4)
    theta = orb_orientation(sm, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    pat = jnp.asarray(ORB_PATTERN)  # (256, 4)
    p1 = pat[:, 0:2]
    p2 = pat[:, 2:4]

    def rot(p):  # (256,2) rotated per keypoint -> (N, 256, 2)
        x = p[None, :, 0] * c[:, None] - p[None, :, 1] * s[:, None]
        y = p[None, :, 0] * s[:, None] + p[None, :, 1] * c[:, None]
        return jnp.stack([x, y], axis=-1)

    q1 = xy[:, None, :] + rot(p1)
    q2 = xy[:, None, :] + rot(p2)
    v1 = bilinear_sample(sm, q1)  # (N, 256)
    v2 = bilinear_sample(sm, q2)
    bits = (v1 < v2).astype(jnp.uint32)  # (N, 256)
    bits = bits * valid[:, None].astype(jnp.uint32)
    # pack 256 bits -> 8 uint32 words
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    packed = jnp.sum(words, axis=-1).astype(jnp.uint32)
    return packed, theta
