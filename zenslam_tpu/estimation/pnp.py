"""Perspective-n-Point: vmapped DLT hypotheses + RANSAC + Gauss-Newton polish.

Parity targets:
- cv::solvePnPRansac + solvePnPRefineLM usage ≡ `utils/estimator.cpp:329-417`
  and the shared wrapper `pose_estimation/common.h:26-103` (RANSAC threshold
  default 3 px / 1000 iters, `all_options.h` pnp_options; LM refine on inliers)
- 3D-2D correspondence semantics ≡ `point_estimator.cpp:18-296`

Design: hypotheses are 6-point DLT solves in NORMALIZED camera coordinates
(K^-1 applied once — conditions the f32 eigensolves), batched via vmap;
scoring is masked reprojection; the winner's inliers feed a fixed-iteration
damped Gauss-Newton on the se(3) tangent with Huber weights — the accelerator
equivalent of OpenCV's iterative refinement.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.lie import so3_exp, so3_hat, so3_orthonormalize
from zenslam_tpu.geometry.polar import polar_so3, inv_spd as polar_inv_spd, solve_spd
from zenslam_tpu.estimation.ransac import ransac_sample_indices


def _normalized(K, uv):
    """Pixels -> normalized image coordinates via K^-1 (batched)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def _smallest_eigvec_12(ATA):
    """Smallest eigenvector of a 12x12 PSD normal matrix via shifted inverse
    iteration (one Cholesky + a few triangular solves).

    jnp.linalg.eigh lowers to iterative Jacobi sweeps on TPU and dominates the
    vmapped RANSAC hypothesis batch; inverse iteration is ~an order of
    magnitude cheaper and the DLT null vector is well separated from the rest
    of the spectrum (exact-data smallest eig is 0). The shift 1e-6·tr/12 keeps
    the f32 Cholesky positive-definite while staying far below the next
    eigenvalue, so one solve already lands on the null space; the extra
    iterations cover noisy/near-degenerate samples (which the prior-seeded GN
    path backstops anyway). The 1e-5 shift sits ~7x above the f32 rounding
    error of forming ATA (~12·eps ≈ 1.4e-6) — a 1e-6 shift could be pushed
    indefinite by rounding, silently NaN-ing the Cholesky and wasting the
    RANSAC iteration — while staying far below typical second eigenvalues.
    """
    tr = jnp.trace(ATA)
    scale = jnp.maximum(tr / 12.0, 1e-20)
    A = ATA / scale + 1e-5 * jnp.eye(12, dtype=ATA.dtype)
    # fused blocked-Schur inverse (geometry/polar.py) — the batched
    # cho_factor/cho_solve custom calls this replaces were the cascade's
    # last LAPACK-style passes (ROOFLINE r4: 0.32 ms/frame over the vmapped
    # 2x128-hypothesis batch); the 6 inverse-power iterations stay fused
    # matmuls on the materialized A^-1
    Ainv = polar_inv_spd(A)
    v = jnp.full((12,), 1.0 / jnp.sqrt(12.0), ATA.dtype)

    def it(_, v):
        z = Ainv @ v
        return z / jnp.maximum(jnp.linalg.norm(z), 1e-30)

    return jax.lax.fori_loop(0, 6, it, v)


def pnp_dlt(X, xn, w=None):
    """DLT pose from ≥6 3D-2D correspondences in normalized coords.

    Solves A vec([R|t]) = 0 (2 rows per point), takes the smallest eigenvector
    of the 12x12 normal matrix, then projects the 3x3 block onto SO(3) by SVD
    and fixes scale/sign by cheirality. Returns (R, t).

    X: (n, 3) world points; xn: (n, 2) normalized image coords; w: optional
    per-point weights (used to mask padded rows in fixed-size batches).
    """
    n = X.shape[0]
    if w is None:
        w = jnp.ones(n, X.dtype)
    ones = jnp.ones((n, 1), X.dtype)
    Xh = jnp.concatenate([X, ones], axis=-1)  # (n, 4)
    zero = jnp.zeros_like(Xh)
    u = xn[:, 0:1]
    v = xn[:, 1:2]
    rows_u = jnp.concatenate([Xh, zero, -u * Xh], axis=-1)  # (n, 12)
    rows_v = jnp.concatenate([zero, Xh, -v * Xh], axis=-1)
    A = jnp.concatenate([rows_u * w[:, None], rows_v * w[:, None]], axis=0)  # (2n, 12)
    ATA = A.T @ A
    p = _smallest_eigvec_12(ATA)
    P = p.reshape(3, 4)
    # the homogeneous solution is defined up to sign: fix it by cheirality on
    # the raw projective depths lambda = P[2]·Xh (must be > 0 for points in front)
    lam = Xh @ P[2]
    front = jnp.sum(jnp.where(lam > 0, w, 0.0))
    behind = jnp.sum(jnp.where(lam < 0, w, 0.0))
    P = jnp.where(behind > front, -P, P)
    M = P[:, :3]
    # project M (= scale * R with scale > 0 now) onto SO(3) by Newton–Schulz
    # polar iteration — fusable, unlike the batched-SVD custom call it
    # replaces (geometry/polar.py; cheirality fixed det(M) > 0 above, so the
    # polar factor is a proper rotation; a rare reflection hypothesis simply
    # scores zero inliers). The mean singular value tr(RᵀM)/3 is the scale.
    R, scale = polar_so3(M)
    scale = jnp.maximum(scale, 1e-12)
    t = P[:, 3] / scale
    return R, t


def reprojection_errors(K, R, t, X, uv):
    """Per-point pixel reprojection error (n,). ≡ `common.h` compute_reprojection_error."""
    xc = X @ R.T + t
    z = jnp.where(jnp.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
    u = K[0, 0] * xc[:, 0] / z + K[0, 2]
    v = K[1, 1] * xc[:, 1] / z + K[1, 2]
    err = jnp.sqrt((u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2)
    # behind-camera points are never inliers
    return jnp.where(xc[:, 2] > 1e-6, err, 1e9)


@functools.partial(jax.jit, static_argnames=("iters", "refine_iters"))
def solve_pnp_ransac(
    key,
    K,
    X,
    uv,
    valid,
    threshold: float = 3.0,
    iters: int = 256,
    # 6 GN steps converge this warm-started, Huber-weighted polish: a
    # 20-trial sweep (400 pts, 30% gross outliers, 0.5 px noise, prior
    # seed) measured t_err p50 1.9/1.7/2.4 mm at 10/6/4 iterations — 6
    # matches 10 while 4 degrades the tail; the loop is latency-bound
    # sequential small-matrix work on the cascade's critical path
    refine_iters: int = 8,
    huber_delta: float = 2.0,
    R_init=None,
    t_init=None,
):
    """RANSAC PnP over masked correspondences.

    Args:
      K: (3,3); X: (N,3) world points; uv: (N,2) pixels; valid: (N,) bool.
      R_init/t_init: optional pose prior (e.g. the motion prediction). A
        Huber-GN refinement seeded from the prior competes with the RANSAC
        winner — this is what keeps PnP solid on (near-)planar scenes, where
        6-point DLT hypotheses are degenerate (the projective DLT needs
        non-coplanar samples; cv::solvePnP's ITERATIVE mode has the same
        prior-seeded structure).
    Returns dict with R, t (world->cam), inliers (N,) bool, n_inliers,
    ok (enough inliers & solve sane), mean_err over inliers.
    """
    n_sample = 6
    xn = _normalized(K, uv)
    idx = ransac_sample_indices(key, valid, iters, n_sample)  # (iters, 6)

    def hypo(sample_idx):
        Xs = X[sample_idx]
        xs = xn[sample_idx]
        R, t = pnp_dlt(Xs, xs)
        err = reprojection_errors(K, R, t, X, uv)
        inl = (err < threshold) & valid
        return jnp.sum(inl), R, t

    scores, Rs, ts = jax.vmap(hypo)(idx)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]
    err0 = reprojection_errors(K, R0, t0, X, uv)
    inliers = (err0 < threshold) & valid

    if R_init is not None:
        # BOTH polish seeds in ONE vmapped GN — the RANSAC winner on its
        # inliers and the prior on all valid points (Huber downweights the
        # outliers) — instead of two SEQUENTIAL 10-iteration loops (the
        # prior-seeded refine then the winner polish). Halves the serial
        # GN depth on the cascade's critical path (a ROOFLINE r3 lever);
        # quality is preserved because each candidate is fully polished
        # before the inlier-count vote picks one.
        seeds_R = jnp.stack([R0, R_init])
        seeds_t = jnp.stack([t0, t_init])
        masks = jnp.stack([inliers, valid])
        Rb, tb = jax.vmap(
            lambda R_, t_, m: refine_pnp_gn(K, R_, t_, X, uv, m,
                                            iters=refine_iters,
                                            huber_delta=huber_delta)
        )(seeds_R, seeds_t, masks)
        errs = jax.vmap(lambda R_, t_: reprojection_errors(K, R_, t_, X, uv))(
            Rb, tb)
        ninl = jnp.sum((errs < threshold) & valid[None, :], axis=1)
        pick = jnp.argmax(ninl)
        R, t = Rb[pick], tb[pick]
        err = errs[pick]
        new_inliers = (err < threshold) & valid
    else:
        # Gauss-Newton polish on inliers (≡ solvePnPRefineLM on inliers,
        # `common.h:70-90`), fixed iterations, Huber-weighted, masked.
        R, t = refine_pnp_gn(K, R0, t0, X, uv, inliers, iters=refine_iters,
                             huber_delta=huber_delta)
        err = reprojection_errors(K, R, t, X, uv)
        new_inliers = (err < threshold) & valid
    # keep the refined pose only if it didn't lose inliers (robustness guard)
    better = jnp.sum(new_inliers) >= jnp.sum(inliers)
    R = jnp.where(better, R, R0)
    t = jnp.where(better, t, t0)
    inliers = jnp.where(better, new_inliers, inliers)
    err = jnp.where(better, err, err0)

    n_inl = jnp.sum(inliers)
    mean_err = jnp.sum(jnp.where(inliers, err, 0.0)) / jnp.maximum(n_inl, 1)
    ok = n_inl >= 4
    return {"R": so3_orthonormalize(R), "t": t, "inliers": inliers,
            "n_inliers": n_inl, "ok": ok, "mean_err": mean_err}


def refine_pnp_gn(K, R0, t0, X, uv, weight_mask, iters: int = 10, huber_delta: float = 2.0, damping: float = 1e-4):
    """Damped Gauss-Newton on se(3) (left-multiplied increment) minimizing
    Huber-robust reprojection error over the masked points."""
    fx, fy = K[0, 0], K[1, 1]
    w_mask = weight_mask.astype(X.dtype)

    def step(_, carry):
        R, t = carry
        xc = X @ R.T + t  # (n, 3)
        z = jnp.where(jnp.abs(xc[:, 2]) < 1e-9, 1e-9, xc[:, 2])
        inv_z = 1.0 / z
        u = fx * xc[:, 0] * inv_z + K[0, 2]
        v = fy * xc[:, 1] * inv_z + K[1, 2]
        r = jnp.stack([u - uv[:, 0], v - uv[:, 1]], axis=-1)  # (n, 2)
        # Huber weights
        rn = jnp.linalg.norm(r, axis=-1)
        hub = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
        wgt = w_mask * hub
        # d(uv)/d(xc)
        x_, y_ = xc[:, 0], xc[:, 1]
        J_proj = jnp.stack(
            [
                jnp.stack([fx * inv_z, jnp.zeros_like(z), -fx * x_ * inv_z * inv_z], -1),
                jnp.stack([jnp.zeros_like(z), fy * inv_z, -fy * y_ * inv_z * inv_z], -1),
            ],
            axis=-2,
        )  # (n, 2, 3)
        # d(xc)/d(xi) with xi = [dt, dw], left increment: xc' = exp(dw) xc + dt
        # => dxc/ddt = I, dxc/ddw = -[xc]x
        J_xi = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), xc.shape[:1] + (3, 3)), -so3_hat(xc)],
            axis=-1,
        )  # (n, 3, 6)
        J = J_proj @ J_xi  # (n, 2, 6)
        JW = J * wgt[:, None, None]
        H = jnp.einsum("nij,nik->jk", JW, J) + damping * jnp.eye(6, dtype=X.dtype)
        g = jnp.einsum("nij,ni->j", JW, r)
        # fused 3+3 blocked-Schur solve — jnp.linalg.solve on a 6x6 is a
        # sequential LU custom call per GN iteration (latency-bound inside
        # this fori_loop); H is damped SPD by construction
        dx = solve_spd(H, -g)
        dt, dw = dx[:3], dx[3:]
        Rn = so3_exp(dw) @ R
        tn = so3_exp(dw) @ t + dt  # left-multiply update of T_cam_world
        return Rn, tn

    return jax.lax.fori_loop(0, iters, step, (R0, t0))
