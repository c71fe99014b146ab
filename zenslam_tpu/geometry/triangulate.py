"""Batched stereo triangulation + acceptance gates (pure JAX, vmappable).

Parity targets:
- DLT triangulation     ≡ cv::triangulatePoints usage (`mapping/triangulation_utils.cpp:135-160`)
- acceptance gates      ≡ cheirality z>0, depth∈[min,max], reprojection<thr,
                          parallax∈(0.25°,179.75°) (`mapping/triangulator.cpp:117-129`)
- epipolar pre-filter   ≡ `triangulator.cpp:152-188`

TPU-first design: all points triangulated unconditionally in fixed-size
batches; gates return a validity mask instead of compacting (masked tables,
SURVEY.md §7 "dynamic cardinality").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.camera import PinholeCamera, StereoRig, project
from zenslam_tpu.geometry.lie import se3_apply


def _projection_matrix(K, R, t):
    """P = K [R|t] for T_cam_world = (R, t)."""
    Rt = jnp.concatenate([R, t[..., :, None]], axis=-1)
    return K @ Rt


def _chol4_solve(A, b):
    """Explicit batched 4x4 Cholesky solve (A x = b, A SPD).

    Written elementwise so XLA fuses it into surrounding VPU work — the
    LAPACK-style Eigh/Cholesky custom calls cost ~1.6 ms/frame for the
    (512,4,4) triangulation batch; this is ~100 flops/point.
    A: (..., 4, 4); b: (..., 4)."""
    a = lambda i, j: A[..., i, j]
    eps = 1e-30
    l00 = jnp.sqrt(jnp.maximum(a(0, 0), eps))
    l10 = a(1, 0) / l00
    l20 = a(2, 0) / l00
    l30 = a(3, 0) / l00
    l11 = jnp.sqrt(jnp.maximum(a(1, 1) - l10 * l10, eps))
    l21 = (a(2, 1) - l20 * l10) / l11
    l31 = (a(3, 1) - l30 * l10) / l11
    l22 = jnp.sqrt(jnp.maximum(a(2, 2) - l20 * l20 - l21 * l21, eps))
    l32 = (a(3, 2) - l30 * l20 - l31 * l21) / l22
    l33 = jnp.sqrt(jnp.maximum(
        a(3, 3) - l30 * l30 - l31 * l31 - l32 * l32, eps))
    # forward substitution L y = b
    y0 = b[..., 0] / l00
    y1 = (b[..., 1] - l10 * y0) / l11
    y2 = (b[..., 2] - l20 * y0 - l21 * y1) / l22
    y3 = (b[..., 3] - l30 * y0 - l31 * y1 - l32 * y2) / l33
    # backward substitution L^T x = y
    x3 = y3 / l33
    x2 = (y2 - l32 * x3) / l22
    x1 = (y1 - l21 * x2 - l31 * x3) / l11
    x0 = (y0 - l10 * x1 - l20 * x2 - l30 * x3) / l00
    return jnp.stack([x0, x1, x2, x3], axis=-1)


def _smallest_eigvec_4(ATA, iters: int = 4):
    """Smallest eigenvector of a batched 4x4 PSD matrix via shifted inverse
    iteration on an explicit Cholesky (see _chol4_solve; same scheme as the
    12x12 PnP solver, `estimation/pnp.py:_smallest_eigvec_12`). The DLT null
    vector is well separated (exact-data smallest eig is 0), so a few
    iterations land on it; the 1e-5 shift keeps the f32 factorization SPD."""
    tr = jnp.einsum("...ii->...", ATA)
    scale = jnp.maximum(tr / 4.0, 1e-20)[..., None, None]
    A = ATA / scale + 1e-5 * jnp.eye(4, dtype=ATA.dtype)
    v = jnp.full(ATA.shape[:-1], 0.5, ATA.dtype)  # unit (1,1,1,1)/2

    def it(_, v):
        z = _chol4_solve(A, v)
        return z / jnp.maximum(
            jnp.linalg.norm(z, axis=-1, keepdims=True), 1e-30)

    return jax.lax.fori_loop(0, iters, it, v)


def triangulate_dlt(K0, R0, t0, K1, R1, t1, uv0, uv1):
    """Two-view DLT triangulation, batched over points.

    Builds the standard 4x4 DLT system per point and solves for the
    eigenvector of A^T A with smallest eigenvalue (shifted inverse iteration
    on an explicit 4x4 Cholesky — pure fusable VPU work; jnp.linalg.eigh's
    custom call cost ~1.6 ms/frame here).

    Args: intrinsics K (3,3), extrinsics mapping world->cam, pixels (N,2) per view.
    Returns: (N, 3) world points.
    """
    P0 = _projection_matrix(K0, R0, t0)  # (3,4)
    P1 = _projection_matrix(K1, R1, t1)
    u0, v0 = uv0[..., 0:1], uv0[..., 1:2]
    u1, v1 = uv1[..., 0:1], uv1[..., 1:2]
    rows = jnp.stack(
        [
            u0 * P0[2] - P0[0],
            v0 * P0[2] - P0[1],
            u1 * P1[2] - P1[0],
            v1 * P1[2] - P1[1],
        ],
        axis=-2,
    )  # (N, 4, 4)
    # row-normalize for conditioning in f32
    rows = rows / (jnp.linalg.norm(rows, axis=-1, keepdims=True) + 1e-12)
    ATA = jnp.swapaxes(rows, -1, -2) @ rows
    X_h = _smallest_eigvec_4(ATA)
    w = X_h[..., 3]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return X_h[..., :3] / w_safe[..., None]


def triangulate_midpoint(K0, R0, t0, K1, R1, t1, uv0, uv1):
    """Midpoint of the common perpendicular between the two viewing rays."""
    K0i = jnp.linalg.inv(K0)
    K1i = jnp.linalg.inv(K1)
    ones = jnp.ones_like(uv0[..., :1])
    d0_cam = jnp.concatenate([uv0, ones], axis=-1) @ K0i.T
    d1_cam = jnp.concatenate([uv1, ones], axis=-1) @ K1i.T
    # ray directions/origins in world frame
    R0w = jnp.swapaxes(R0, -1, -2)
    R1w = jnp.swapaxes(R1, -1, -2)
    o0 = -(R0w @ t0)
    o1 = -(R1w @ t1)
    d0 = d0_cam @ R0  # == R0^T d0_cam, batched
    d1 = d1_cam @ R1
    d0 = d0 / (jnp.linalg.norm(d0, axis=-1, keepdims=True) + 1e-12)
    d1 = d1 / (jnp.linalg.norm(d1, axis=-1, keepdims=True) + 1e-12)
    b = o1 - o0
    d0d1 = jnp.sum(d0 * d1, axis=-1)
    denom = 1.0 - d0d1 * d0d1
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    s = (jnp.sum(b * d0, axis=-1) - d0d1 * jnp.sum(b * d1, axis=-1)) / denom
    u = (d0d1 * jnp.sum(b * d0, axis=-1) - jnp.sum(b * d1, axis=-1)) / denom
    p0 = o0 + s[..., None] * d0
    p1 = o1 + u[..., None] * d1
    return 0.5 * (p0 + p1)


def triangulate_rectified(fx, baseline, cx_l, cx_r, cy, fy, uv_l, uv_r):
    """Fast path for rectified stereo: depth z = fx * b / disparity.

    Returns points in the LEFT camera frame. Works with differing principal
    points after rectification (cx_l vs cx_r).
    """
    disparity = (uv_l[..., 0] - cx_l) - (uv_r[..., 0] - cx_r)
    disp_safe = jnp.where(jnp.abs(disparity) < 1e-6, 1e-6, disparity)
    z = fx * baseline / disp_safe
    x = (uv_l[..., 0] - cx_l) / fx * z
    y = (uv_l[..., 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


class TriangulationGates(NamedTuple):
    min_depth: float = 0.1
    max_depth: float = 50.0
    reprojection_threshold: float = 2.0
    min_parallax_deg: float = 0.25
    max_parallax_deg: float = 179.75
    min_disparity: float = 1.0


def triangulation_gates(
    rig: StereoRig,
    R_lw,
    t_lw,
    X_world,
    uv_l,
    uv_r,
    gates: TriangulationGates = TriangulationGates(),
):
    """Validity mask over triangulated points (`triangulator.cpp:117-129`).

    - cheirality: z > 0 in both cameras
    - depth within [min_depth, max_depth] (left camera)
    - reprojection error below threshold in both views
    - parallax angle between the viewing rays within (min, max) degrees
    """
    # T_right_world = T_rl ∘ T_left_world
    R_rw = rig.R_rl @ R_lw
    t_rw = (rig.R_rl @ t_lw) + rig.t_rl
    x_l = se3_apply(R_lw, t_lw, X_world)
    x_r = se3_apply(R_rw, t_rw, X_world)
    z_l, z_r = x_l[..., 2], x_r[..., 2]
    cheirality = (z_l > 1e-6) & (z_r > 1e-6)
    depth_ok = (z_l >= gates.min_depth) & (z_l <= gates.max_depth)
    err_l = jnp.linalg.norm(project(rig.left, x_l) - uv_l, axis=-1)
    err_r = jnp.linalg.norm(project(rig.right, x_r) - uv_r, axis=-1)
    reproj_ok = (err_l < gates.reprojection_threshold) & (err_r < gates.reprojection_threshold)
    # parallax between rays from the two camera centers
    Rwl = jnp.swapaxes(R_lw, -1, -2)
    Rwr = jnp.swapaxes(R_rw, -1, -2)
    c_l = -(Rwl @ t_lw)
    c_r = -(Rwr @ t_rw)
    r0 = X_world - c_l
    r1 = X_world - c_r
    cos_a = jnp.sum(r0 * r1, axis=-1) / (
        jnp.linalg.norm(r0, axis=-1) * jnp.linalg.norm(r1, axis=-1) + 1e-12
    )
    ang = jnp.degrees(jnp.arccos(jnp.clip(cos_a, -1.0, 1.0)))
    parallax_ok = (ang > gates.min_parallax_deg) & (ang < gates.max_parallax_deg)
    return cheirality & depth_ok & reproj_ok & parallax_ok


def epipolar_residual(F, uv_l, uv_r):
    """Symmetric point-to-epipolar-line distance (`matching_utils.cpp:17-61`)."""
    ones = jnp.ones_like(uv_l[..., :1])
    pl = jnp.concatenate([uv_l, ones], axis=-1)
    pr = jnp.concatenate([uv_r, ones], axis=-1)
    l_r = pl @ F.T  # epipolar line in right image
    l_l = pr @ F    # epipolar line in left image
    num = jnp.abs(jnp.sum(pr * l_r, axis=-1))
    d_r = num / (jnp.linalg.norm(l_r[..., :2], axis=-1) + 1e-12)
    d_l = num / (jnp.linalg.norm(l_l[..., :2], axis=-1) + 1e-12)
    return 0.5 * (d_r + d_l)
