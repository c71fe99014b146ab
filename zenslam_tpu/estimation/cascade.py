"""High-level pose estimation cascade — what the live loop calls.

Parity target: `estimator::estimate_pose_new` (`utils/estimator.cpp:249-318`):
  1. 3D-2D PnP-RANSAC on cam0 (landmarks vs left-image keypoints)
  2. fallback: PnP on cam1, pose transferred through the stereo extrinsics
     (`estimator.cpp:272-276`)
  3. fallback: 3D-3D rigid RANSAC between current-frame triangulations and
     map landmarks (`estimator.cpp:283-314`)
  4. fallback: 2D-2D essential + recoverPose with median-norm METRIC SCALE
     from prior landmarks (`point_estimator.cpp:233-296` — the reference's
     third estimator family; rescues feature-poor frames where both PnP and
     rigid starve but temporal 2D tracks survive)
  5. total failure: caller substitutes the predicted pose
     (`slam_thread.cpp:157-166` graceful degradation)

TPU shape: the reference's exception-driven cascade becomes three always-run
fixed-shape estimators + a priority select (`jnp.where` chain). The estimators
are cheap (hundreds of microseconds) next to tracking, so the dead branches
cost little and the graph stays static.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.estimation.pnp import solve_pnp_ransac
from zenslam_tpu.estimation.rigid import solve_rigid_ransac
from zenslam_tpu.estimation.epipolar import estimate_2d2d_scaled
from zenslam_tpu.geometry.camera import StereoRig
from zenslam_tpu.geometry.lie import se3_compose, se3_inverse, so3_orthonormalize


class PoseEstimate(NamedTuple):
    R: jnp.ndarray          # (3,3) world->left-cam
    t: jnp.ndarray          # (3,)
    ok: jnp.ndarray         # () bool
    n_inliers: jnp.ndarray  # () int32
    mean_err: jnp.ndarray   # () float32
    method: jnp.ndarray     # () int32: 0=pnp_cam0, 1=pnp_cam1, 2=rigid3d3d,
                            #           3=essential2d2d, 4=fallback
    inliers0: jnp.ndarray   # (N,) bool — inlier mask of the cam0 correspondences


@functools.partial(jax.jit, static_argnames=(
    "pnp_iters", "rigid_iters", "essential_iters", "fuse"))
def estimate_pose_cascade(
    key,
    rig: StereoRig,
    # 3D-2D correspondences, cam0 (left): world landmarks vs pixels
    X0, uv0, valid0,
    # 3D-2D correspondences, cam1 (right)
    X1, uv1, valid1,
    # 3D-3D correspondences: current-frame world-points (via predicted pose)
    # vs map landmarks
    src3d, dst3d, valid3d,
    # fallback pose (prediction) if everything fails
    R_pred, t_pred,
    # 2D-2D temporal matches (prev/current pixels of the same tracks) +
    # prior landmark positions in the PREVIOUS camera frame for scale
    # recovery; None disables the essential fallback (method 3)
    p2a=None, p2b=None, valid2=None, X2_prev_cam=None, has3d2=None,
    R_prev=None, t_prev=None,
    # 1-sigma position uncertainty (meters) of the PREDICTED pose, from the
    # preintegration's propagated 9x9 covariance (imu/preintegration.py).
    # When given (VIO branch) the prediction joins pose fusion as its own
    # candidate, weighted by exp(-sigma/0.1 m) — a well-calibrated IMU pulls
    # the fused pose toward the inertial prediction, an inflated-noise one
    # contributes ~nothing (≡ making `integral.cov` do work; the reference
    # computes the same covariance and drops it, `integrator.cpp:86-156`).
    pred_sigma_p=None,
    pnp_threshold: float = 3.0,
    rigid_threshold: float = 0.05,
    essential_threshold: float = 1.5,
    min_inliers: int = 4,
    pnp_iters: int = 256,
    rigid_iters: int = 256,
    essential_iters: int = 128,
    fuse: bool = False,
):
    """Returns the left-camera pose T_cam0_world as a PoseEstimate."""
    k0, k1, k2 = jax.random.split(key, 3)

    # cam1 prior: transfer the prediction through the stereo extrinsics
    R1p, t1p = se3_compose(rig.R_rl, rig.t_rl, R_pred, t_pred)
    # the two PnP problems run as ONE vmapped solve: the batched 12x12
    # eigensolve over 2*iters hypotheses costs the same as over iters (the
    # batch is embarrassingly parallel), halving the cascade's critical path.
    # The problems are padded to a common correspondence count (masked rows).
    n = max(X0.shape[0], X1.shape[0])

    def padn(a, m):
        return jnp.pad(a, [(0, m - a.shape[0])] + [(0, 0)] * (a.ndim - 1))

    rpair = jax.vmap(
        lambda k, K, X, uv, v, Ri, ti: solve_pnp_ransac(
            k, K, X, uv, v, threshold=pnp_threshold, iters=pnp_iters,
            R_init=Ri, t_init=ti)
    )(
        jnp.stack([k0, k1]),
        jnp.stack([rig.left.K, rig.right.K]),
        jnp.stack([padn(X0, n), padn(X1, n)]),
        jnp.stack([padn(uv0, n), padn(uv1, n)]),
        jnp.stack([padn(valid0, n), padn(valid1, n)]),
        jnp.stack([R_pred, R1p]), jnp.stack([t_pred, t1p]),
    )
    r0 = jax.tree.map(lambda x: x[0], rpair)
    r1 = jax.tree.map(lambda x: x[1], rpair)
    r0 = dict(r0, inliers=r0["inliers"][: X0.shape[0]])
    r1 = dict(r1, inliers=r1["inliers"][: X1.shape[0]])
    r2 = solve_rigid_ransac(k2, src3d, dst3d, valid3d,
                            threshold=rigid_threshold, iters=rigid_iters)

    use_2d2d = p2a is not None
    if use_2d2d:
        k3 = jax.random.fold_in(key, 3)
        r3 = estimate_2d2d_scaled(
            k3, rig.left.K, p2a, p2b, valid2, X2_prev_cam, has3d2,
            R_prev, t_prev, threshold=essential_threshold,
            iters=essential_iters)

    ok0 = r0["ok"] & (r0["n_inliers"] >= min_inliers)
    ok1 = r1["ok"] & (r1["n_inliers"] >= min_inliers)
    ok2 = r2["ok"] & (r2["n_inliers"] >= jnp.maximum(min_inliers, 3))
    ok3 = r3["ok"] if use_2d2d else jnp.asarray(False)

    # cam1 pose -> cam0 pose: T_c0_w = T_rl^-1 ∘ T_c1_w  (`estimator.cpp:272-276`)
    Rlr, tlr = se3_inverse(rig.R_rl, rig.t_rl)
    R1c0, t1c0 = se3_compose(Rlr, tlr, r1["R"], r1["t"])

    # rigid gives T that maps src (current-frame coords under predicted pose)
    # onto dst (map): here we feed world-frame pairs so (R,t) corrects the
    # predicted pose: T_w'_w. New cam pose = T_pred ∘ (T_w'_w)^-1.
    Rc, tc = se3_inverse(r2["R"], r2["t"])
    R2c0, t2c0 = se3_compose(R_pred, t_pred, Rc, tc)

    if use_2d2d:
        R3, t3 = r3["R"], r3["t"]
        n3 = r3["n_inliers"]
        e3 = r3["mean_err"]
    else:
        R3, t3 = R_pred, t_pred
        n3 = jnp.asarray(0)
        e3 = jnp.asarray(jnp.inf, jnp.float32)

    def pick(f0, f1, f2, f3, fallback):
        return jnp.where(ok0, f0, jnp.where(ok1, f1, jnp.where(
            ok2, f2, jnp.where(ok3, f3, fallback))))

    # re-orthonormalize: downstream motion-model composes use R^T as the
    # inverse, which squares any f32 orthogonality drift every frame
    R = so3_orthonormalize(pick(r0["R"], R1c0, R2c0, R3, R_pred))
    t = pick(r0["t"], t1c0, t2c0, t3, t_pred)
    if fuse:
        # first-class pose fusion across the successful methods
        # (≡ `pose_fusion::fuse_poses`, `pose_fusion.cpp:154-288`: weighted
        # translation consensus, winner rotation). The reference computes but
        # never wires this; here it replaces the pure priority pick when ≥1
        # method succeeds.
        from zenslam_tpu.estimation.fusion import PoseCandidate, fuse_poses

        f32 = jnp.float32
        def ratio(n, v):
            return (n / jnp.maximum(jnp.sum(v), 1)).astype(f32)

        n2v = valid2 if use_2d2d else jnp.zeros((1,), bool)
        use_inertial = pred_sigma_p is not None
        oks = jnp.stack([ok0, ok1, ok2, ok3])
        # sanitize: a FAILED solver may emit NaN R/t (degenerate hypotheses);
        # its weight is 0 but 0*NaN = NaN would poison the fused translation.
        t_stack = jnp.stack([r0["t"], t1c0, t2c0, t3])
        t_stack = jnp.where(oks[:, None], t_stack, t_pred[None, :])
        R_stack = jnp.stack([r0["R"], R1c0, R2c0, R3])
        R_stack = jnp.where(oks[:, None, None], R_stack, R_pred[None])
        e_stack = jnp.stack([r0["mean_err"], r1["mean_err"],
                             r2["mean_err"], e3]).astype(f32)
        n_stack = jnp.stack([r0["n_inliers"], r1["n_inliers"],
                             r2["n_inliers"], n3])
        ratios = jnp.stack([
            ratio(r0["n_inliers"], valid0), ratio(r1["n_inliers"], valid1),
            ratio(r2["n_inliers"], valid3d), ratio(n3, n2v)])
        # per-method error scales ≡ the reference's compute_weight
        # (`pose_fusion.cpp:11-61`): 0.1 m for the 3D-3D rigid candidate
        # (meters), 3.0 px for the pixel-residual methods.
        err_scales = jnp.array([3.0, 3.0, 0.1, 3.0], jnp.float32)
        if use_inertial:
            # inertial candidate: mean_err = sigma_p (meters) on the 0.1 m
            # scale; no inliers/ratio (it measured nothing visual)
            t_stack = jnp.concatenate([t_stack, t_pred[None]], 0)
            R_stack = jnp.concatenate([R_stack, R_pred[None]], 0)
            e_stack = jnp.concatenate(
                [e_stack, jnp.asarray(pred_sigma_p, f32)[None]], 0)
            n_stack = jnp.concatenate(
                [n_stack, jnp.zeros((1,), n_stack.dtype)], 0)
            ratios = jnp.concatenate([ratios, jnp.zeros((1,), f32)], 0)
            oks = jnp.concatenate(
                [oks, jnp.isfinite(jnp.asarray(pred_sigma_p))[None]], 0)
            err_scales = jnp.concatenate(
                [err_scales, jnp.asarray([0.1], jnp.float32)], 0)
        M = e_stack.shape[0]
        cands = PoseCandidate(
            R=R_stack,
            t=t_stack,
            inlier_ratio=ratios,
            mean_err=e_stack,
            n_inliers=n_stack,
            is_line=jnp.zeros((M,), bool),
            valid=oks,
        )
        R_f, t_f, conf, _cov, best = fuse_poses(cands, err_scale=err_scales)
        any_ok = ok0 | ok1 | ok2 | ok3
        R = jnp.where(any_ok, so3_orthonormalize(R_f), R)
        t = jnp.where(any_ok, t_f, t)
        # note: with the inertial candidate, best == 4 reports as method 4
        # (the "predicted pose" bucket) in telemetry — honest labeling
    method = jnp.where(ok0, 0, jnp.where(ok1, 1, jnp.where(
        ok2, 2, jnp.where(ok3, 3, 4)))).astype(jnp.int32)
    ok = ok0 | ok1 | ok2 | ok3
    n_inl = pick(r0["n_inliers"], r1["n_inliers"], r2["n_inliers"], n3,
                 jnp.asarray(0))
    mean_err = pick(r0["mean_err"], r1["mean_err"], r2["mean_err"], e3,
                    jnp.asarray(jnp.inf, jnp.float32))
    if fuse:
        # telemetry follows the fusion winner (the rotation's source), not
        # the priority pick — otherwise method=0 stats could describe a pose
        # dominated by another candidate.
        method = jnp.where(any_ok, best.astype(jnp.int32), method)
        n_inl = jnp.where(any_ok, n_stack[best], n_inl)
        mean_err = jnp.where(any_ok, e_stack[best], mean_err)
    return PoseEstimate(R=R, t=t, ok=ok, n_inliers=n_inl, mean_err=mean_err,
                        method=method, inliers0=r0["inliers"])
