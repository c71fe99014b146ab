"""SIFT-style 128-d float descriptors, batched over keypoints (pure JAX).

Parity target: the float-descriptor arm of the reference's detector factory
(`keypoint_detector_simple.cpp:8-36` — ORB/**SIFT**/FREAK descriptor
choices; SIFT and FREAK both exist to give a richer, rotation-invariant
descriptor than BRIEF). Capability-level parity, not bit-parity: a 4x4
spatial grid x 8 orientation bins of Gaussian-weighted gradient histograms
over a rotated 16x16 patch, L2-normalized, clipped at 0.2, renormalized —
the classic SIFT descriptor layout (Lowe 2004 §6).

TPU shape: per keypoint the descriptor is a (256, 8) soft-assignment matrix
product — all 256 patch samples gather bilinearly (the same primitive as LK
window sampling), orientation soft-binning is a (256, 8) cosine-window
weight matrix, and the 4x4 spatial pooling is a fixed (16, 256) indicator
matmul. vmapped over N keypoints: three small matmuls per keypoint, MXU
food. Matching uses the L2 matmul matcher (`ops/match.match_descriptors_float`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.ops.image import bilinear_sample, gaussian_blur
from zenslam_tpu.ops.orb import orb_orientation

_GRID = 4          # 4x4 spatial cells
_BINS = 8          # orientation bins
_SAMPLES = 16      # 16x16 sample lattice
_PATCH_HALF = 8.0  # patch spans [-8, 8) sample units


def _sample_offsets():
    """(256, 2) float32 lattice offsets (x, y), cell-centered."""
    c = (np.arange(_SAMPLES) - _SAMPLES / 2 + 0.5).astype(np.float32)
    xx, yy = np.meshgrid(c, c)
    return np.stack([xx.reshape(-1), yy.reshape(-1)], -1)


def _cell_indicator():
    """(16, 256) float32: which 4x4 cell each of the 256 samples belongs to."""
    idx = np.arange(_SAMPLES)
    cell = (idx // (_SAMPLES // _GRID)).astype(np.int32)
    cy, cx = np.meshgrid(cell, cell, indexing="ij")
    flat_cell = (cy * _GRID + cx).reshape(-1)       # (256,)
    ind = np.zeros((_GRID * _GRID, _SAMPLES * _SAMPLES), np.float32)
    ind[flat_cell, np.arange(_SAMPLES * _SAMPLES)] = 1.0
    return ind


def _gauss_window():
    """(256,) Gaussian spatial weight (σ = half patch width)."""
    off = _sample_offsets()
    r2 = (off ** 2).sum(-1)
    return np.exp(-r2 / (2.0 * _PATCH_HALF ** 2)).astype(np.float32)


_OFFSETS = _sample_offsets()
_CELL_IND = _cell_indicator()
_GAUSS_W = _gauss_window()


@functools.partial(jax.jit, static_argnames=())
def sift_descriptors(img, xy, valid, scale: float = 1.0):
    """(N, 128) float32 descriptors at keypoints xy (N, 2).

    Orientation comes from the intensity centroid (`orb_orientation`) — the
    same steering the ORB path uses, so the two families are rotation-aware
    in the same way. Invalid keypoints return zero descriptors.
    """
    g = gaussian_blur(img, 1.2)
    theta = orb_orientation(g, xy)
    c, s = jnp.cos(theta), jnp.sin(theta)
    # rotated sample positions: p = kp + R(theta) @ (scale * offset)
    off = jnp.asarray(_OFFSETS) * scale                 # (256, 2)
    rot_x = c[:, None] * off[None, :, 0] - s[:, None] * off[None, :, 1]
    rot_y = s[:, None] * off[None, :, 0] + c[:, None] * off[None, :, 1]
    px = xy[:, 0:1] + rot_x                             # (N, 256)
    py = xy[:, 1:2] + rot_y

    # gradients at the rotated samples (central differences of the blurred
    # image sampled bilinearly — 4 gathers)
    def samp(dx, dy):
        return bilinear_sample(g, jnp.stack([px + dx, py + dy], -1))

    gx = 0.5 * (samp(1.0, 0.0) - samp(-1.0, 0.0))       # (N, 256)
    gy = 0.5 * (samp(0.0, 1.0) - samp(0.0, -1.0))
    # rotate gradients into the keypoint frame
    rx = c[:, None] * gx + s[:, None] * gy
    ry = -s[:, None] * gx + c[:, None] * gy
    mag = jnp.sqrt(rx * rx + ry * ry + 1e-12) * jnp.asarray(_GAUSS_W)[None, :]
    ang = jnp.arctan2(ry, rx)                            # (N, 256) in (-pi, pi]

    # soft orientation binning: cosine^2 window over the 8 bin centres
    centres = jnp.arange(_BINS, dtype=jnp.float32) * (2 * jnp.pi / _BINS) - jnp.pi
    d = ang[..., None] - centres                         # (N, 256, 8)
    d = jnp.mod(d + jnp.pi, 2 * jnp.pi) - jnp.pi
    w_bin = jnp.maximum(0.0, 1.0 - jnp.abs(d) * (_BINS / (2 * jnp.pi)))
    contrib = mag[..., None] * w_bin                     # (N, 256, 8)

    # 4x4 spatial pooling: (16, 256) @ (N, 256, 8) -> (N, 16, 8)
    pooled = jnp.einsum("cs,nsb->ncb", jnp.asarray(_CELL_IND), contrib)
    desc = pooled.reshape(xy.shape[0], _GRID * _GRID * _BINS)  # (N, 128)

    # SIFT normalization: L2 -> clip 0.2 -> L2
    n1 = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(n1, 1e-9)
    desc = jnp.minimum(desc, 0.2)
    n2 = jnp.linalg.norm(desc, axis=-1, keepdims=True)
    desc = desc / jnp.maximum(n2, 1e-9)
    return jnp.where(valid[:, None], desc, 0.0)
