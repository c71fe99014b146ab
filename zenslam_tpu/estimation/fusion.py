"""Confidence-weighted multi-method pose fusion.

Parity target: `pose_fusion::fuse_poses` (`pose_estimation/pose_fusion.cpp`):
- per-candidate confidence = 0.4·inlier_ratio + 0.4·exp(−err/scale)·consistency
  + 0.2·inlier_boost (`pose_fusion.cpp:11-61`), line-based candidates ×0.9
- translation: confidence-weighted average; rotation: the best method's
  (weighted rotation averaging is ill-defined; the reference keeps the winner,
  `pose_fusion.cpp:111-152`)
- diagonal 6x6 covariance from confidence (`pose_fusion.cpp:63-109,255-267`)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PoseCandidate(NamedTuple):
    R: jnp.ndarray          # (M, 3, 3)
    t: jnp.ndarray          # (M, 3)
    inlier_ratio: jnp.ndarray  # (M,)
    mean_err: jnp.ndarray      # (M,) pixels (or meters for 3D-3D)
    n_inliers: jnp.ndarray     # (M,)
    is_line: jnp.ndarray       # (M,) bool — line-endpoint-based candidate
    valid: jnp.ndarray         # (M,) bool


@jax.jit
def fuse_poses(cands: PoseCandidate, err_scale=2.0, inlier_boost_at: int = 50,
               outlier_distance: float = 0.5, consistency_scale: float = 0.2):
    """Fuse M pose candidates. Returns (R, t, confidence, cov_diag(6,), best).

    Weights follow `pose_fusion.cpp:11-61`; the consistency factor compares
    each translation against the confidence-weighted consensus. ``err_scale``
    may be a scalar or an (M,) vector — the reference's `compute_weight` uses
    per-method scales (0.1 m for 3D-3D, 3.0 px for pixel-residual methods),
    so mixed-unit candidate sets must pass a vector. ``best`` is the index of
    the winning candidate (the fused rotation's source).
    """
    err_scale = jnp.asarray(err_scale, jnp.float32)
    # invalid candidates may carry NaN residuals (a failed solver); weight 0
    # is not enough — 0*NaN = NaN poisons the weighted sums. Sanitize first.
    safe_err = jnp.where(cands.valid & jnp.isfinite(cands.mean_err),
                         cands.mean_err, 1e6)
    t_anchor0 = cands.t[jnp.argmax(jnp.where(cands.valid, cands.inlier_ratio, -1.0))]
    safe_t = jnp.where(
        (cands.valid & jnp.all(jnp.isfinite(cands.t), axis=-1))[:, None],
        cands.t, t_anchor0)
    cands = cands._replace(mean_err=safe_err, t=safe_t)
    err_term = jnp.exp(-cands.mean_err / err_scale)
    boost = jnp.clip(cands.n_inliers.astype(jnp.float32) / inlier_boost_at, 0.0, 1.0)
    base = 0.4 * cands.inlier_ratio + 0.4 * err_term + 0.2 * boost
    base = jnp.where(cands.is_line, base * 0.9, base)
    w = jnp.where(cands.valid, base, 0.0)

    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    t_consensus = jnp.sum(cands.t * w[:, None], axis=0) / wsum
    # consistency: candidates far from consensus get down-weighted, then re-fuse
    dist = jnp.linalg.norm(cands.t - t_consensus, axis=-1)
    consistency = jnp.exp(-dist / jnp.maximum(consistency_scale, 1e-6))
    w2 = jnp.where(cands.valid, 0.4 * cands.inlier_ratio + 0.4 * err_term * consistency + 0.2 * boost, 0.0)
    w2 = jnp.where(cands.is_line, w2 * 0.9, w2)
    # hard outlier gate (hardening over the reference formula): a candidate
    # whose translation sits far from the best-weighted candidate — not the
    # consensus, which outliers themselves drag — contributes nothing.
    t_anchor = cands.t[jnp.argmax(w)]
    w2 = jnp.where(jnp.linalg.norm(cands.t - t_anchor, axis=-1) > outlier_distance, 0.0, w2)
    w2sum = jnp.maximum(jnp.sum(w2), 1e-9)
    t_fused = jnp.sum(cands.t * w2[:, None], axis=0) / w2sum

    best = jnp.argmax(w2)
    R_fused = cands.R[best]
    confidence = jnp.max(w2)
    # diagonal covariance: higher confidence -> tighter
    sigma_t = 0.05 / jnp.maximum(confidence, 1e-3)
    sigma_r = 0.02 / jnp.maximum(confidence, 1e-3)
    cov_diag = jnp.concatenate([jnp.full((3,), sigma_t ** 2), jnp.full((3,), sigma_r ** 2)])
    any_valid = jnp.any(cands.valid)
    return R_fused, t_fused, jnp.where(any_valid, confidence, 0.0), cov_diag, best
