"""Fundamental / essential matrix estimation + pose recovery (vmapped 8-point).

Parity targets:
- cv::findFundamentalMat RANSAC  ≡ epipolar filter (`keypoint_tracker.cpp:293-341`)
  and stereo match filter (`matcher.cpp:90`)
- cv::findEssentialMat + recoverPose + median-scale recovery
  ≡ 2D-2D pose with scale from prior landmarks (`point_estimator.cpp:233-296`)

Hartley-normalized 8-point solves batched via vmap; pose recovery tests the
four (R, t) decompositions by cheirality voting over masked triangulated
depths — fixed-shape, no data-dependent branches.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.estimation.ransac import ransac_sample_indices
from zenslam_tpu.geometry.polar import project_rank2, inv_spd
from zenslam_tpu.geometry.triangulate import triangulate_dlt


def _hartley_normalize(pts, w=None):
    """Similarity transform T s.t. T·pts has zero mean and sqrt(2) RMS radius."""
    n = pts.shape[0]
    if w is None:
        w = jnp.ones(n, pts.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu = jnp.sum(pts * w[:, None], axis=0) / wsum
    d = jnp.sqrt(jnp.sum((pts - mu) ** 2, axis=-1))
    mean_d = jnp.sum(d * w) / wsum
    s = jnp.sqrt(2.0) / jnp.maximum(mean_d, 1e-12)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], pts.dtype
    )
    T = T.at[0, 0].set(s).at[1, 1].set(s).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return T


def _smallest_eigvec_9(ATA, iters: int = 6):
    """Smallest eigenvector of a 9x9 PSD normal matrix via shifted inverse
    iteration — same scheme and rationale as
    `estimation/pnp.py:_smallest_eigvec_12`: the DLT null vector is well
    separated, and a batched LAPACK-style custom call (Eigh, or the Cholesky
    this formulation previously used) dominates the vmapped RANSAC hypothesis
    batch. The inverse is the fused blocked-Schur `geometry/polar.py:inv_spd`
    and the power iterations are fused matmuls."""
    tr = jnp.trace(ATA)
    scale = jnp.maximum(tr / 9.0, 1e-20)
    A = ATA / scale + 1e-5 * jnp.eye(9, dtype=ATA.dtype)
    Ainv = inv_spd(A)
    v = jnp.full((9,), 1.0 / 3.0, ATA.dtype)

    def it(_, v):
        z = Ainv @ v
        return z / jnp.maximum(jnp.linalg.norm(z), 1e-30)

    return jax.lax.fori_loop(0, iters, it, v)


def _eight_point(pa, pb, w=None):
    """8-point algorithm on (n,2)+(n,2) -> rank-2 3x3 F (unit Frobenius)."""
    n = pa.shape[0]
    if w is None:
        w = jnp.ones(n, pa.dtype)
    Ta = _hartley_normalize(pa, w)
    Tb = _hartley_normalize(pb, w)
    ones = jnp.ones((n, 1), pa.dtype)
    qa = jnp.concatenate([pa, ones], -1) @ Ta.T
    qb = jnp.concatenate([pb, ones], -1) @ Tb.T
    # rows: [xb*xa, xb*ya, xb, yb*xa, yb*ya, yb, xa, ya, 1]
    A = jnp.stack(
        [
            qb[:, 0] * qa[:, 0], qb[:, 0] * qa[:, 1], qb[:, 0],
            qb[:, 1] * qa[:, 0], qb[:, 1] * qa[:, 1], qb[:, 1],
            qa[:, 0], qa[:, 1], jnp.ones_like(qa[:, 0]),
        ],
        axis=-1,
    ) * w[:, None]
    ATA = A.T @ A
    F = _smallest_eigvec_9(ATA).reshape(3, 3)
    # rank-2 projection by smallest-triplet removal (geometry/polar.py) —
    # fusable, unlike the batched-SVD custom call it replaces. The essential
    # (1,1,0)-spectrum equalization is NOT applied per hypothesis: Sampson
    # scoring is insensitive to the σ₁/σ₂ ratio of a rank-2 matrix, and the
    # winner's recover_pose decomposition re-projects via its own SVD.
    F = project_rank2(F)
    # denormalize
    F = Tb.T @ F @ Ta
    norm = jnp.linalg.norm(F)
    return F / jnp.maximum(norm, 1e-12)


def fundamental_8pt(pa, pb, w=None):
    return _eight_point(pa, pb, w)


def essential_8pt(na, nb, w=None):
    """8-point on NORMALIZED image coordinates -> essential matrix (rank-2;
    the exact (1,1,0) spectrum is enforced by recover_pose's decomposition)."""
    return _eight_point(na, nb, w)


def _sampson_distance(F, pa, pb):
    """First-order geometric (Sampson) distance, (n,)."""
    ones = jnp.ones_like(pa[..., :1])
    qa = jnp.concatenate([pa, ones], -1)
    qb = jnp.concatenate([pb, ones], -1)
    Fqa = qa @ F.T   # (n,3): F @ qa_i
    Ftqb = qb @ F    # (n,3): F^T @ qb_i
    num = jnp.sum(qb * Fqa, axis=-1) ** 2
    den = Fqa[:, 0] ** 2 + Fqa[:, 1] ** 2 + Ftqb[:, 0] ** 2 + Ftqb[:, 1] ** 2
    return num / jnp.maximum(den, 1e-12)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_fundamental_ransac(key, pa, pb, valid, threshold: float = 2.0, iters: int = 256):
    """RANSAC F-matrix with Sampson scoring; threshold in pixels.
    Returns dict with F, inliers, n_inliers, ok."""
    idx = ransac_sample_indices(key, valid, iters, 8)

    def hypo(sample_idx):
        F = fundamental_8pt(pa[sample_idx], pb[sample_idx])
        d = _sampson_distance(F, pa, pb)
        inl = (d < threshold * threshold) & valid
        return jnp.sum(inl), F

    scores, Fs = jax.vmap(hypo)(idx)
    best = jnp.argmax(scores)
    F0 = Fs[best]
    inl0 = (_sampson_distance(F0, pa, pb) < threshold * threshold) & valid
    # refit on inliers
    F = fundamental_8pt(pa, pb, w=inl0.astype(pa.dtype))
    inl = (_sampson_distance(F, pa, pb) < threshold * threshold) & valid
    better = jnp.sum(inl) >= jnp.sum(inl0)
    F = jnp.where(better, F, F0)
    inliers = jnp.where(better, inl, inl0)
    return {"F": F, "inliers": inliers, "n_inliers": jnp.sum(inliers), "ok": jnp.sum(inliers) >= 8}


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_essential_ransac(key, K, pa, pb, valid, threshold: float = 1.0, iters: int = 256):
    """RANSAC essential matrix on pixel inputs (normalizes internally).
    Threshold in pixels, applied via Sampson distance on normalized coords
    scaled by focal length."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
    nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)
    f_mean = (fx + fy) * 0.5
    thr_n = threshold / f_mean
    idx = ransac_sample_indices(key, valid, iters, 8)

    def hypo(sample_idx):
        E = essential_8pt(na[sample_idx], nb[sample_idx])
        d = _sampson_distance(E, na, nb)
        inl = (d < thr_n * thr_n) & valid
        return jnp.sum(inl), E

    scores, Es = jax.vmap(hypo)(idx)
    best = jnp.argmax(scores)
    E0 = Es[best]
    inl0 = (_sampson_distance(E0, na, nb) < thr_n * thr_n) & valid
    E = essential_8pt(na, nb, w=inl0.astype(pa.dtype))
    inl = (_sampson_distance(E, na, nb) < thr_n * thr_n) & valid
    better = jnp.sum(inl) >= jnp.sum(inl0)
    E = jnp.where(better, E, E0)
    inliers = jnp.where(better, inl, inl0)
    return {"E": E, "inliers": inliers, "n_inliers": jnp.sum(inliers), "ok": jnp.sum(inliers) >= 8}


def _masked_median(x, mask):
    """Median over masked entries (sorted with +inf padding)."""
    n_valid = jnp.sum(mask.astype(jnp.int32))
    big = jnp.where(mask, x, jnp.inf)
    srt = jnp.sort(big)
    mid = jnp.clip((n_valid - 1) // 2, 0, x.shape[0] - 1)
    mid2 = jnp.clip(n_valid // 2, 0, x.shape[0] - 1)
    return 0.5 * (srt[mid] + srt[mid2])


@functools.partial(jax.jit, static_argnames=("iters",))
def estimate_2d2d_scaled(
    key, K,
    pa, pb, valid,          # temporal 2D-2D matches: prev / current pixels
    X_prev_cam, has3d,      # prior landmark positions in the PREV CAMERA frame
    R_prev, t_prev,         # previous world->cam pose
    threshold: float = 1.5,
    iters: int = 256,
    min_inliers: int = 12,
    min_scale_samples: int = 5,
):
    """2D-2D pose with METRIC SCALE from prior landmarks — the reference's
    third estimator family (`point_estimator.cpp:233-296`):

      essential RANSAC on the temporal matches → recoverPose (unit ||t||) →
      triangulate matches in the prev frame at unit scale → scale = median
      over points with known prior 3D of ||X_prior|| / ||X_unit|| →
      T_cur_w = (R, s·t) ∘ T_prev_w.

    Returns dict(R, t (world->cur-cam), ok, n_inliers, scale, mean_err).
    """
    res = solve_essential_ransac(key, K, pa, pb, valid,
                                 threshold=threshold, iters=iters)
    R_cp, t_unit, n_good = recover_pose_from_essential(
        res["E"], K, pa, pb, res["inliers"])

    eye3 = jnp.eye(3, dtype=pa.dtype)
    zero3 = jnp.zeros(3, dtype=pa.dtype)
    X_unit = triangulate_dlt(K, eye3, zero3, K, R_cp, t_unit, pa, pb)
    z_a = X_unit[:, 2]
    z_b = (X_unit @ R_cp.T + t_unit)[:, 2]
    cheir = (z_a > 1e-3) & (z_b > 1e-3) & (jnp.abs(z_a) < 100.0)
    scale_ok = res["inliers"] & cheir & has3d
    # median-norm scale recovery (`point_estimator.cpp:233-257`)
    nu = jnp.linalg.norm(X_unit, axis=-1)
    np_ = jnp.linalg.norm(X_prev_cam, axis=-1)
    ratio = np_ / jnp.maximum(nu, 1e-9)
    scale = _masked_median(ratio, scale_ok)
    n_scale = jnp.sum(scale_ok.astype(jnp.int32))

    t_cp = scale * t_unit
    # T_cur_w = T_cur_prev ∘ T_prev_w
    R_cw = R_cp @ R_prev
    t_cw = R_cp @ t_prev + t_cp
    ok = (res["ok"]
          & (res["n_inliers"] >= min_inliers)
          & (n_good >= min_inliers)
          & (n_scale >= min_scale_samples)
          & jnp.isfinite(scale) & (scale > 1e-3) & (scale < 1e3))
    # Sampson error of inliers in pixels as the quality metric
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    na = jnp.stack([(pa[:, 0] - cx) / fx, (pa[:, 1] - cy) / fy], -1)
    nb = jnp.stack([(pb[:, 0] - cx) / fx, (pb[:, 1] - cy) / fy], -1)
    d = jnp.sqrt(_sampson_distance(res["E"], na, nb)) * (fx + fy) * 0.5
    mean_err = (jnp.sum(jnp.where(res["inliers"], d, 0.0))
                / jnp.maximum(res["n_inliers"], 1))
    return {"R": R_cw, "t": t_cw, "ok": ok, "n_inliers": res["n_inliers"],
            "scale": scale, "mean_err": mean_err, "inliers": res["inliers"]}


@jax.jit
def recover_pose_from_essential(E, K, pa, pb, valid):
    """cv::recoverPose analogue: pick the (R, t) of the 4 decompositions with
    the most masked points passing cheirality in both views.

    Returns (R, t, n_good) with T_b_a = (R, t) (maps frame-a coords to b),
    ||t|| = 1 (scale-free — the caller recovers metric scale, see
    `point_estimator.cpp:233-257`).
    """
    U, _, Vt = jnp.linalg.svd(E)
    # ensure proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    tu = U[:, 2]
    eye3 = jnp.eye(3, dtype=E.dtype)
    zero3 = jnp.zeros(3, dtype=E.dtype)

    def count_cheirality(R, t):
        X = triangulate_dlt(K, eye3, zero3, K, R, t, pa, pb)
        z_a = X[:, 2]
        z_b = (X @ R.T + t)[:, 2]
        # reject far points (parallel-ray degenerates) like OpenCV's 50-unit gate
        good = (z_a > 0) & (z_b > 0) & (jnp.abs(z_a) < 100.0) & valid
        return jnp.sum(good)

    cands = [(R1, tu), (R1, -tu), (R2, tu), (R2, -tu)]
    counts = jnp.stack([count_cheirality(R, t) for R, t in cands])
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best]
