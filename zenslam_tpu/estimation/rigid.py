"""3D-3D rigid alignment: Umeyama closed form + fixed-iteration RANSAC.

Parity target: the reference's SVD/Umeyama rigid transform with its
1000-iteration 3-point RANSAC loop (`utils/rigid_transform.cpp:12-224`,
invoked by the pose cascade `utils/estimator.cpp:283-314`; threshold default
0.1 m, TUM-VI config 5 mm — `all_options.h` rigid_options).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.estimation.ransac import ransac_sample_indices
from zenslam_tpu.geometry.polar import rotation_from_cov


def umeyama(src, dst, w=None, with_scale: bool = False):
    """Least-squares rigid transform (R, t[, s]) with dst ≈ s·R·src + t.

    src/dst: (n, 3); w: optional weights (masking). Returns (R, t, s).
    """
    n = src.shape[0]
    if w is None:
        w = jnp.ones(n, src.dtype)
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    sc = src - mu_s
    dc = dst - mu_d
    cov = (dc * w[:, None]).T @ sc / wsum  # (3,3)
    # Horn quaternion rotation (geometry/polar.py) — always a proper
    # rotation, correct on the rank-2 covariances of 3-point minimal
    # samples, and fusable (replaces the batched-SVD custom call +
    # reflection fix-up D = diag(1,1,det)).
    R = rotation_from_cov(cov)
    if with_scale:
        var_s = jnp.sum(w[:, None] * sc * sc) / wsum
        # Umeyama scale: tr(D·S)/var = tr(Rᵀ·cov)/var for the optimal R
        s = jnp.einsum("ij,ij->", R, cov) / jnp.maximum(var_s, 1e-12)
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * (R @ mu_s)
    return R, t, s


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_rigid_ransac(
    key,
    src,
    dst,
    valid,
    threshold: float = 0.05,
    iters: int = 512,
):
    """RANSAC rigid 3D-3D over masked correspondences (3-point hypotheses,
    full-inlier Umeyama re-fit — ≡ `rigid_transform.cpp:79-166`).

    Returns dict with R, t (dst = R·src + t), inliers, n_inliers, ok, mean_err.
    """
    idx = ransac_sample_indices(key, valid, iters, 3)

    def hypo(sample_idx):
        R, t, _ = umeyama(src[sample_idx], dst[sample_idx])
        err = jnp.linalg.norm(src @ R.T + t - dst, axis=-1)
        inl = (err < threshold) & valid
        return jnp.sum(inl), R, t

    scores, Rs, ts = jax.vmap(hypo)(idx)
    best = jnp.argmax(scores)
    R0, t0 = Rs[best], ts[best]
    err0 = jnp.linalg.norm(src @ R0.T + t0 - dst, axis=-1)
    inliers = (err0 < threshold) & valid
    # re-fit on all inliers
    R, t, _ = umeyama(src, dst, w=inliers.astype(src.dtype))
    err = jnp.linalg.norm(src @ R.T + t - dst, axis=-1)
    new_inliers = (err < threshold) & valid
    better = jnp.sum(new_inliers) >= jnp.sum(inliers)
    R = jnp.where(better, R, R0)
    t = jnp.where(better, t, t0)
    inliers = jnp.where(better, new_inliers, inliers)
    n_inl = jnp.sum(inliers)
    final_err = jnp.linalg.norm(src @ R.T + t - dst, axis=-1)
    mean_err = jnp.sum(jnp.where(inliers, final_err, 0.0)) / jnp.maximum(n_inl, 1)
    return {"R": R, "t": t, "inliers": inliers, "n_inliers": n_inl,
            "ok": n_inl >= 3, "mean_err": mean_err}
