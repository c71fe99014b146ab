"""FREAK-style retinal binary descriptors, batched over keypoints (pure JAX).

Parity target: the FREAK arm of the reference's descriptor factory
(`keypoint_detector_simple.cpp:8-36` — ORB/SIFT/**FREAK**; cv::xfeatures2d
FREAK, Alahi et al. 2012). Capability-level parity, not bit-parity (same
stance as ops/orb.py): a retinal sampling pattern — 43 receptive fields in 7
concentric rings + fovea, field size growing with eccentricity — compared
over a coarse-to-fine pair selection into a 256-bit code, steered by the
keypoint orientation. Matching uses the SAME packed-uint32 Hamming matmul as
ORB (ops/match.py), so FREAK drops into every binary consumer (keyframe DB,
BoW, loop closure) unchanged.

TPU shape: the ring-dependent receptive-field smoothing becomes THREE
pre-blurred planes (σ 1, 2.5, 5 — fovea/mid/periphery); per keypoint the 43
fields are 43 rotated bilinear gathers from the matching plane; the 256
comparisons and bit-pack are elementwise. No per-keypoint control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.ops.image import bilinear_sample, gaussian_blur
from zenslam_tpu.ops.orb import orb_orientation


def _retina_pattern():
    """(43, 3): (x, y, plane) — 7 rings x 6 staggered points + center.

    Radii follow FREAK's exponential eccentricity layout (outermost ~20 px,
    fovea 0); `plane` indexes the blur ladder (0 = sharpest) so outer fields
    average larger support, ≡ the overlapping receptive fields of the paper.
    """
    radii = [20.0, 14.7, 10.8, 7.9, 5.8, 4.2, 3.1]
    pts = []
    for ring, r in enumerate(radii):
        # stagger alternate rings by half a step (30°) like the retina mosaic
        phase = (np.pi / 6.0) if (ring % 2) else 0.0
        plane = 2 if ring < 2 else (1 if ring < 5 else 0)
        for j in range(6):
            a = phase + j * (np.pi / 3.0)
            pts.append((r * np.cos(a), r * np.sin(a), plane))
    pts.append((0.0, 0.0, 0))  # fovea
    return np.asarray(pts, np.float32)


def _pair_selection(n_bits: int = 256):
    """(n_bits, 2) int32 field-index pairs, coarse-to-fine stratified.

    FREAK learns its pairs from data; deterministic equivalent: sort all 903
    pairs by inter-field distance (descending — coarse structure first, the
    paper's observed ordering) and take a uniform stride so every scale of
    structure is represented.
    """
    pat = _retina_pattern()
    pairs = []
    for i in range(len(pat)):
        for j in range(i + 1, len(pat)):
            d = np.hypot(pat[i, 0] - pat[j, 0], pat[i, 1] - pat[j, 1])
            pairs.append((d, i, j))
    pairs.sort(key=lambda t: -t[0])
    idx = np.linspace(0, len(pairs) - 1, n_bits).round().astype(int)
    return np.asarray([[pairs[k][1], pairs[k][2]] for k in idx], np.int32)


_PATTERN = _retina_pattern()
_PAIRS = _pair_selection()
_PLANE_SIGMAS = (1.0, 2.5, 5.0)


@functools.partial(jax.jit, static_argnames=())
def freak_descriptors(img, xy, valid):
    """(N, 8) uint32 packed 256-bit FREAK codes + (N,) orientations.

    Invalid rows are all-zero (the shared binary-descriptor contract).
    """
    planes = [gaussian_blur(img, s, radius=max(2, int(2.5 * s)))
              for s in _PLANE_SIGMAS]
    theta = orb_orientation(planes[0], xy)
    c, s = jnp.cos(theta), jnp.sin(theta)

    pat = jnp.asarray(_PATTERN[:, :2])          # (43, 2)
    rot_x = c[:, None] * pat[None, :, 0] - s[:, None] * pat[None, :, 1]
    rot_y = s[:, None] * pat[None, :, 0] + c[:, None] * pat[None, :, 1]
    px = xy[:, 0:1] + rot_x                     # (N, 43)
    py = xy[:, 1:2] + rot_y

    # sample each field from its blur plane: gather all three planes at the
    # 43 positions, pick per-field (the pick is a fixed one-hot sum)
    samples = jnp.stack(
        [bilinear_sample(p, jnp.stack([px, py], -1)) for p in planes],
        axis=-1)                                # (N, 43, 3)
    sel = jax.nn.one_hot(jnp.asarray(_PATTERN[:, 2], jnp.int32), 3,
                         dtype=samples.dtype)   # (43, 3)
    fields = jnp.einsum("nkp,kp->nk", samples, sel)  # (N, 43)

    pi = jnp.asarray(_PAIRS)                    # (256, 2)
    v1 = fields[:, pi[:, 0]]
    v2 = fields[:, pi[:, 1]]
    bits = (v1 < v2).astype(jnp.uint32) * valid[:, None].astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
    return jnp.sum(words, axis=-1).astype(jnp.uint32), theta
