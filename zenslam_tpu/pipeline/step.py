"""The per-frame SLAM step — one jitted function, scan-compatible.

This is the TPU re-design of the reference's live loop
(`slam_thread::loop`, `slam_thread.cpp:63-245`):

  WAIT/POP → PREPROCESS → PREDICT → TRACK → ESTIMATE → KEYFRAME →
  MAP UPDATE → MOTION UPDATE → emit

Design differences (SURVEY.md §7, deliberate):
- the three preprocessing jthreads (`processor.cpp:25-63`) become fused device
  ops inside one jit;
- the reference tracks left and right keypoint sets independently and joins by
  global index; here the LEFT table is canonical and the right view holds
  stereo-transferred positions (the reference's own L→R KLT transfer path,
  `keypoint_tracker.cpp:41-105`), which removes all cross-table joins;
- dynamic sets become fixed-capacity masked tables (see pipeline/state.py);
- RANSAC/PnP/rigid run as fixed-iteration vmapped estimators.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.camera import StereoRig, project
from zenslam_tpu.geometry.lie import (
    se3_apply,
    se3_compose,
    se3_inverse,
    rotation_angle,
)
from zenslam_tpu.geometry.triangulate import triangulate_dlt, epipolar_residual
from zenslam_tpu.ops.image import build_pyramid
from zenslam_tpu.ops.fast import detect_grid_keypoints
from zenslam_tpu.ops.orb import orb_descriptors
from zenslam_tpu.ops.lines import keyline_descriptors
from zenslam_tpu.ops.match import (
    match_descriptors, match_descriptors_float, radius_gate)
from zenslam_tpu.ops.lk import (
    lk_forward_backward,
    build_ragged_pyramid_pair,
    ragged_to_stacked,
)
from zenslam_tpu.ops.lk_pallas import lk_ragged_pallas, ragged_level_sizes
from zenslam_tpu.estimation.cascade import estimate_pose_cascade
from zenslam_tpu.frontend.tables import insert_into_free_slots, allocate_landmark_slots
from zenslam_tpu.imu.preintegration import preintegrate
from zenslam_tpu.imu.predictors import inertial_predict_pose, propagate_velocity
from zenslam_tpu.imu.gravity import GravityEstimator, gravity_add_sample, gravity_estimate
from zenslam_tpu.pipeline.state import (
    SlamConfig,
    SlamState,
    FeatureTable,
    FrameTelemetry,
    VioState,
    MotionModel,
    resolve_use_pallas,
    pyramid_dtype,
)


def _predict_pose(state: SlamState):
    """Constant-acceleration prediction ≡ `motion_predictor.cpp:5-14`:
    Δt = vel + ½·acc, ΔR = exp(vel_ang + ½·acc_ang) (per-frame dt)."""
    from zenslam_tpu.geometry.lie import so3_exp

    mm = state.motion
    # acceleration engages only once TWO pose transitions exist
    use_acc = (mm.n_updates >= 2).astype(jnp.float32)
    t_rel = mm.vel + 0.5 * use_acc * mm.acc
    R_rel = so3_exp(mm.vel_ang + 0.5 * use_acc * mm.acc_ang)
    R_pred, t_pred = se3_compose(R_rel, t_rel, state.R_cw, state.t_cw)
    ok = mm.n_updates >= 1
    R_pred = jnp.where(ok, R_pred, state.R_cw)
    t_pred = jnp.where(ok, t_pred, state.t_cw)
    return R_pred, t_pred


def _lk_fb(cfg: SlamConfig, prev_pyr, next_pyr, tsizes, pts, valid, init_pts=None):
    """fwd-bwd KLT on the implementation matching the platform: the fused
    Pallas kernel on TPU, the scanned-XLA fallback elsewhere (gathers are
    fine on CPU; Mosaic kernel needs real hardware or interpret mode).

    prev_pyr/next_pyr: ragged level tuples; tsizes: static true level sizes.
    """
    if resolve_use_pallas(cfg):
        # per-level Newton schedule + shallow backward pass (see
        # ops/lk_pallas.py docstring) — halves the kernel's sample steps
        iters = (cfg.klt_iters,) + (cfg.klt_coarse_iters,) * (len(tsizes) - 1)
        return lk_ragged_pallas(
            prev_pyr, next_pyr, pts, valid, init_pts=init_pts,
            radius=cfg.klt_radius, iters=iters,
            bwd_levels=cfg.klt_bwd_levels,
            compute_err=False,  # no pipeline consumer; fb check gates quality
            fb_threshold=cfg.fb_threshold, block=8, sizes=tsizes, unroll=True,
        )
    prev_stack, sizes = ragged_to_stacked(prev_pyr, tsizes)
    next_stack, _ = ragged_to_stacked(next_pyr, tsizes)
    return lk_forward_backward(
        (prev_stack, sizes), (next_stack, sizes), pts, valid,
        init_pts=init_pts, radius=cfg.klt_radius, iters=cfg.klt_iters,
        fb_threshold=cfg.fb_threshold,
    )


def _temporal_track(cfg: SlamConfig, rig: StereoRig, state: SlamState, pyr_l, tsizes,
                    R_pred, t_pred):
    """KLT prev-L → cur-L with landmark-projected initial flow + fb check
    (≡ `keypoint_tracker.cpp:343-434`)."""
    feats = state.features
    has_lm = (feats.lm_idx >= 0) & feats.valid
    lm_xyz = state.lmap.xyz[jnp.clip(feats.lm_idx, 0, None)]
    xc = se3_apply(R_pred, t_pred, lm_xyz)
    proj = project(rig.left, xc)
    H, W = tsizes[0]
    proj_ok = has_lm & (xc[..., 2] > 0.1) & (proj[:, 0] >= 0) & (proj[:, 0] < W) & (proj[:, 1] >= 0) & (proj[:, 1] < H)
    init_pts = jnp.where(proj_ok[:, None], proj, feats.xy)
    tracked, ok, err = _lk_fb(
        cfg, state.prev_pyr_l, pyr_l, tsizes, feats.xy, feats.valid, init_pts=init_pts,
    )
    feats = feats._replace(
        xy=jnp.where(ok[:, None], tracked, feats.xy),
        valid=ok,
        age=jnp.where(ok, feats.age + 1, 0),
    )
    return feats, jnp.sum(ok)


def _match_desc(cfg: SlamConfig, da, db, va, vb, gate_mask):
    """Descriptor-family dispatch: Hamming for the binary path, L2 matmul
    for the float (SIFT) path (≡ `utils::create_matcher` picking NORM_HAMMING
    vs NORM_L2, `matching_utils.cpp:63-95`)."""
    if cfg.descriptor == "sift":
        return match_descriptors_float(
            da, db, va, vb, max_distance=cfg.float_match_distance,
            cross_check=True, gate_mask=gate_mask)
    return match_descriptors(
        da, db, va, vb, max_distance=cfg.landmark_match_distance,
        cross_check=True, gate_mask=gate_mask)


def _compute_descriptors(cfg: SlamConfig, img_l, feats: FeatureTable,
                         needs=None):
    """Descriptor-family dispatch for DESCRIBE (≡ the descriptor switch of
    `keypoint_detector_simple.cpp:8-36`). The ORB path uses the Pallas
    tile-sampler kernel on TPU (ops/orb_pallas.py — replaces ~2.6 ms/frame
    of XLA gathers + dense moment maps) and the XLA gather path elsewhere.

    needs: optional (N,) bool — only these rows are guaranteed computed
    (describe-at-detection mode; the Pallas kernel compacts + block-skips
    the rest, the XLA families just compute everything). Rows outside
    ``needs`` are UNDEFINED — the caller merges via the same mask."""
    if cfg.descriptor == "sift":
        from zenslam_tpu.ops.sift import sift_descriptors

        return sift_descriptors(img_l, feats.xy, feats.valid)
    if cfg.descriptor == "freak":
        from zenslam_tpu.ops.freak import freak_descriptors

        desc, _ = freak_descriptors(img_l, feats.xy, feats.valid)
        return desc
    if cfg.orb_backend != "xla" and resolve_use_pallas(cfg):
        from zenslam_tpu.ops.orb_pallas import orb_descriptors_pallas

        desc, _ = orb_descriptors_pallas(img_l, feats.xy, feats.valid,
                                         needs=needs)
        return desc
    desc, _ = orb_descriptors(img_l, feats.xy, feats.valid)
    return desc


def _detect_topup(cfg: SlamConfig, img_l, feats: FeatureTable, next_track_id):
    """Grid detection into free slots (≡ detector top-up,
    `keypoint_tracker.cpp:53-72` + `keypoint_detector_grid.cpp`).
    cfg.detector selects the dense score family (FAST vs multi-scale
    Harris ≡ the detector switch of `keypoint_detector_simple.cpp:8-36`)."""
    if cfg.detector in ("harris", "dog"):
        from zenslam_tpu.ops.fast import select_grid_keypoints

        if cfg.detector == "dog":
            # true DoG scale-space extrema (≡ the cv::SIFT detector arm)
            from zenslam_tpu.ops.dog import dog_score

            score = dog_score(img_l, threshold=cfg.dog_threshold)
        else:
            from zenslam_tpu.ops.harris import harris_score_multiscale

            score = harris_score_multiscale(img_l,
                                            threshold=cfg.harris_threshold)
        det_xy, det_score, det_valid = select_grid_keypoints(
            score, feats.xy, feats.valid, cell_size=cfg.cell_size,
            max_keypoints=cfg.max_keypoints, border=cfg.detect_border,
            subpixel=cfg.subpixel_detect,
        )
    else:
        det_xy, det_score, det_valid = detect_grid_keypoints(
            img_l, feats.xy, feats.valid,
            threshold=cfg.fast_threshold, cell_size=cfg.cell_size,
            max_keypoints=cfg.max_keypoints, border=cfg.detect_border,
            subpixel=cfg.subpixel_detect,
        )
    slot, placed = insert_into_free_slots(~feats.valid, det_score, det_valid)
    sl = jnp.where(placed, slot, cfg.max_keypoints)  # drop-mode scatter target
    n_placed = jnp.sum(placed.astype(jnp.int32))
    # new track ids: next_track_id + rank among placed
    rank = jnp.cumsum(placed.astype(jnp.int32)) - 1
    new_ids = next_track_id + rank
    feats = feats._replace(
        xy=feats.xy.at[sl].set(det_xy, mode="drop"),
        valid=feats.valid.at[sl].set(placed, mode="drop"),
        lm_idx=feats.lm_idx.at[sl].set(-1, mode="drop"),
        track_id=feats.track_id.at[sl].set(new_ids, mode="drop"),
        age=feats.age.at[sl].set(0, mode="drop"),
        stereo_ok=feats.stereo_ok.at[sl].set(False, mode="drop"),
    )
    return feats, n_placed, next_track_id + n_placed


def _stereo_and_triangulate(cfg: SlamConfig, rig: StereoRig, pyr_l, pyr_r, tsizes,
                            feats: FeatureTable, F_rig):
    """L→R KLT stereo transfer + epipolar gate + triangulation in the left
    camera frame (≡ stereo transfer `keypoint_tracker.cpp:41-105` +
    `triangulator.cpp:39-132` gates)."""
    uv_r, st_ok, _ = _lk_fb(cfg, pyr_l, pyr_r, tsizes, feats.xy, feats.valid)
    res = epipolar_residual(F_rig, feats.xy, uv_r)
    st_ok = st_ok & (res < cfg.epipolar_threshold)

    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    X_cam = triangulate_dlt(rig.left.K, eye, zero, rig.right.K, rig.R_rl, rig.t_rl,
                            feats.xy, uv_r)
    # gates (cheirality/depth/reprojection/disparity) in the camera frame
    z = X_cam[:, 2]
    x_r = se3_apply(rig.R_rl, rig.t_rl, X_cam)
    err_l = jnp.linalg.norm(project(rig.left, X_cam) - feats.xy, axis=-1)
    err_r = jnp.linalg.norm(project(rig.right, x_r) - uv_r, axis=-1)
    disparity = jnp.abs((feats.xy[:, 0] - rig.left.cx) - (uv_r[:, 0] - rig.right.cx))
    tri_ok = (
        st_ok
        & (z > cfg.min_depth) & (z < cfg.max_depth) & (x_r[:, 2] > 0)
        & (err_l < cfg.reprojection_threshold) & (err_r < cfg.reprojection_threshold)
        & (disparity >= cfg.min_disparity)
    )
    feats = feats._replace(uv_r=uv_r, stereo_ok=st_ok)
    return feats, X_cam, tri_ok


def _associate_landmarks(cfg: SlamConfig, rig: StereoRig, feats: FeatureTable, lmap,
                         R_pred, t_pred):
    """Re-associate landmark-less keypoints to map landmarks by descriptor
    match within a projected radius (≡ `assign_landmark_indices`,
    `keypoint_tracker.cpp:199-291`: KD radius search + BF Hamming + gate)."""
    # project all landmarks with the predicted pose
    xc = se3_apply(R_pred, t_pred, lmap.xyz)
    proj = project(rig.left, xc)
    # full frustum cull ≡ `is_in_frustum` (`matching_utils.cpp:106-130`):
    # cheirality, projection inside the image (with margin), and the map
    # search-radius cap (`tracking_options.h:14`, 50 m)
    in_frustum = (xc[:, 2] > 0.1) & (
        jnp.linalg.norm(xc, axis=-1) < cfg.landmark_search_radius)
    # rig.left.width/height are pytree leaves (traced under jit) — the bounds
    # check must stay in array-land. Rigs with unknown size (0) skip the gate.
    m = jnp.float32(cfg.frustum_margin)
    w = jnp.asarray(rig.left.width, jnp.float32)
    h = jnp.asarray(rig.left.height, jnp.float32)
    in_bounds = (
        (proj[:, 0] >= -m) & (proj[:, 0] < w + m)
        & (proj[:, 1] >= -m) & (proj[:, 1] < h + m))
    in_frustum = in_frustum & jnp.where((w > 0) & (h > 0), in_bounds, True)
    # landmarks already attached to a live track are not re-assignable
    attached = jnp.zeros(lmap.valid.shape[0], bool).at[
        jnp.where(feats.valid & (feats.lm_idx >= 0), feats.lm_idx, lmap.valid.shape[0])
    ].set(True, mode="drop")
    assignable = lmap.valid & in_frustum & (~attached)
    free_kp = feats.valid & (feats.lm_idx < 0)
    gate = radius_gate(feats.xy, proj, 20.0)
    idx, dist, ok = _match_desc(cfg, feats.desc, lmap.desc, free_kp,
                                assignable, gate)
    new_lm_idx = jnp.where(ok & free_kp, idx, feats.lm_idx)
    return feats._replace(lm_idx=new_lm_idx), jnp.sum(ok & free_kp)


def _temporal_rematch(cfg: SlamConfig, rig: StereoRig, feats: FeatureTable,
                      prev_desc, prev_xy, prev_lm_idx, prev_valid, track2d_ok,
                      R_prev, t_prev, R_pred, t_pred, lmap):
    """Descriptor-based temporal re-acquisition ≡ `match_temporal`
    (`matching_utils.cpp:441-563`): previous-frame keypoints whose KLT track
    DIED but which carried a landmark are matched by descriptor against the
    current landmark-less keypoints, gated by the epipolar constraint of the
    predicted relative motion. A hit transfers the landmark index — the
    track re-acquires without waiting for the map-radius association."""
    from zenslam_tpu.geometry.lie import so3_hat
    from zenslam_tpu.ops.match import epipolar_gate

    N = feats.xy.shape[0]
    lost = prev_valid & (prev_lm_idx >= 0) & (~track2d_ok)
    # landmarks already re-attached (e.g. by map association) are off-limits
    attached = jnp.zeros(lmap.valid.shape[0], bool).at[
        jnp.where(feats.valid & (feats.lm_idx >= 0), feats.lm_idx,
                  lmap.valid.shape[0])
    ].set(True, mode="drop")
    lost = lost & (~attached[jnp.clip(prev_lm_idx, 0, None)])
    free = feats.valid & (feats.lm_idx < 0)
    # essential of the predicted relative motion T_cur_prev = T_pred ∘ T_prev⁻¹
    Rpi, tpi = se3_inverse(R_prev, t_prev)
    R_rel, t_rel = se3_compose(R_pred, t_pred, Rpi, tpi)
    E = so3_hat(t_rel) @ R_rel
    Kinv = jnp.linalg.inv(rig.left.K)
    F = Kinv.T @ E @ Kinv
    gate = epipolar_gate(F, prev_xy, feats.xy, cfg.temporal_match_epipolar)
    idx, dist, ok = _match_desc(cfg, prev_desc, feats.desc, lost, free, gate)
    tgt = jnp.where(ok, idx, N)
    new_lm = feats.lm_idx.at[tgt].set(
        jnp.where(ok, prev_lm_idx, -1), mode="drop")
    return feats._replace(lm_idx=new_lm), jnp.sum(ok)


def _body_pose_world(rig: StereoRig, R_cw, t_cw):
    """Body (IMU) rotation R_wb and position p_w from the camera pose
    (T_iw = T_ci^-1 ∘ T_cw, ≡ `inertial_predictor.h:16-74` conventions)."""
    Ric, tic = se3_inverse(rig.R_ci, rig.t_ci)
    R_iw, t_iw = se3_compose(Ric, tic, R_cw, t_cw)
    R_wi, p_wi = se3_inverse(R_iw, t_iw)
    return R_wi, p_wi


def _vio_predict(rig: StereoRig, state: SlamState, integral, R_pred_cv, t_pred_cv):
    """Inertial pose prediction when gravity+velocity are observable; falls
    back to the constant-velocity prediction (≡ `slam_thread.cpp:126-132`:
    motion.predict + inertial.predict, inertial wins when gravity is set)."""
    vio = state.vio
    R_i, t_i = inertial_predict_pose(
        state.R_cw, state.t_cw, vio.v_world, vio.gravity_w, integral,
        rig.R_ci, rig.t_ci)
    use = vio.gravity_ok & (vio.hist_n >= 1) & (integral.dt > 0)
    R_pred = jnp.where(use, R_i, R_pred_cv)
    t_pred = jnp.where(use, t_i, t_pred_cv)
    return R_pred, t_pred


def _vio_update(rig: StereoRig, vio: VioState, integral, accel, mask,
                R_cw_prev, t_cw_prev, R_cw, t_cw, pose_ok):
    """Post-estimation VIO bookkeeping: velocity from VO pose differences
    (IMU-propagated fallback), gravity-estimator sample + re-estimate
    (≡ `slam_thread.cpp:221-235`: gravity_estimator.add, motion/inertial
    update)."""
    R_wb_now, p_now = _body_pose_world(rig, R_cw, t_cw)
    R_wb_prev, _ = _body_pose_world(rig, R_cw_prev, t_cw_prev)
    dt = integral.dt

    # velocity: VO finite difference when a previous pose exists, else
    # IMU propagation (`inertial_predictor.h` update path)
    prev_p = vio.hist_p[2]
    have_prev = vio.hist_n >= 1
    v_vo = (p_now - prev_p) / jnp.maximum(dt, 1e-6)
    v_imu = propagate_velocity(vio.v_world, vio.gravity_w, R_wb_prev, integral)
    v_new = jnp.where(pose_ok & have_prev & (dt > 0), v_vo,
                      jnp.where(vio.gravity_ok & (dt > 0), v_imu, vio.v_world))

    # mean specific force over this interval (bias-corrected)
    n_s = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    f_mean = jnp.sum(jnp.where(mask[:, None], accel, 0.0), axis=0) / n_s - vio.bias_accel

    # shift-append the 3-pose history (oldest-first, latest at index 2)
    hist_p = jnp.concatenate([vio.hist_p[1:], p_now[None]])
    hist_R = jnp.concatenate([vio.hist_R_wb[1:], R_wb_now[None]])
    hist_dt = jnp.concatenate([vio.hist_dt[1:], dt[None]])
    hist_f = jnp.concatenate([vio.hist_f[1:], f_mean[None]])
    hist_n = jnp.minimum(vio.hist_n + 1, 3)

    # gravity sample from central-difference VO acceleration vs measured
    # specific force at the middle pose (`gravity_estimator.cpp:6-84`)
    est = GravityEstimator(samples=vio.grav_samples, valid=vio.grav_valid,
                           next_slot=vio.grav_next)
    f_mid = 0.5 * (hist_f[0] + hist_f[1])
    est_new = gravity_add_sample(est, hist_p[0], hist_p[1], hist_p[2],
                                 hist_dt[0], hist_dt[1], hist_R[1], f_mid)
    can_sample = (vio.hist_n >= 2) & pose_ok & (hist_dt > 0).all()
    est = jax.tree.map(lambda n, o: jnp.where(can_sample, n, o), est_new, est)
    g, g_ok = gravity_estimate(est)
    return vio._replace(
        v_world=v_new,
        gravity_w=jnp.where(g_ok, g, vio.gravity_w),
        gravity_ok=g_ok | vio.gravity_ok,
        grav_samples=est.samples, grav_valid=est.valid, grav_next=est.next_slot,
        hist_p=hist_p, hist_R_wb=hist_R, hist_dt=hist_dt, hist_f=hist_f,
        hist_n=hist_n,
    )


def _keyframe_decision(cfg: SlamConfig, state: SlamState, R_cw, t_cw, n_inliers, tracked_ratio):
    """≡ `keyframe_selector::decide` (`keyframe_selector.cpp:14-55`)."""
    first = state.frame_idx == 0
    # relative motion since last keyframe
    Ri, ti = se3_inverse(state.last_kf_R, state.last_kf_t)
    R_rel, t_rel = se3_compose(R_cw, t_cw, Ri, ti)
    trans = jnp.linalg.norm(t_rel)
    rot_deg = jnp.degrees(rotation_angle(R_rel))
    n_since = state.frames_since_kf
    motion_trigger = (trans >= cfg.kf_min_translation) | (rot_deg >= cfg.kf_min_rotation_deg)
    quality_trigger = (tracked_ratio <= cfg.kf_min_tracked_ratio) | (n_inliers < cfg.kf_min_inliers)
    gap_ok = n_since >= cfg.kf_min_frames
    forced = n_since >= cfg.kf_max_frames
    return first | forced | (gap_ok & (motion_trigger | quality_trigger))


@functools.partial(jax.jit, static_argnames=("cfg",), donate_argnames=("state",))
def slam_step(cfg: SlamConfig, rig: StereoRig, state: SlamState, img_l, img_r,
              imu=None):
    """Process one stereo frame. Returns (new_state, telemetry).

    imu: optional (gyro (S,3), accel (S,3), dts (S,), mask (S,)) — the IMU
    samples of the interval ending at this frame (≡ `processor.cpp:57-63`
    preintegration thread + the predict/update IMU path of
    `slam_thread.cpp:126-132, 221-235`). The VIO branch is compiled only
    when provided.
    """
    if cfg.use_clahe:
        # ≡ processor.cpp:25-39 (CLAHE before pyramid/detection/description)
        from zenslam_tpu.ops.image import clahe

        img_l = clahe(img_l, clip_limit=cfg.clahe_clip)
        img_r = clahe(img_r, clip_limit=cfg.clahe_clip)
    pyr_l, pyr_r = build_ragged_pyramid_pair(
        img_l, img_r, cfg.pyramid_levels, dtype=pyramid_dtype(cfg))
    tsizes = ragged_level_sizes(
        img_l.shape[0], img_l.shape[1], cfg.pyramid_levels + 1)
    key, k_est = jax.random.split(state.rng_key)

    from zenslam_tpu.geometry.camera import fundamental_from_rig
    F_rig = fundamental_from_rig(rig)

    # ---- PREPROCESS (IMU preintegration) + PREDICT ---------------------------
    R_pred, t_pred = _predict_pose(state)
    integral = None
    if imu is not None:
        gyro, accel, imu_dts, imu_mask = imu
        # Allan noise densities from calibration (`imu_calibration.h:21-67`)
        # drive the 9x9 covariance propagation
        from zenslam_tpu.imu.preintegration import ImuNoise

        imu_noise = ImuNoise(
            gyro_noise=cfg.imu_gyro_noise, accel_noise=cfg.imu_accel_noise,
            gyro_bias_walk=cfg.imu_gyro_bias_walk,
            accel_bias_walk=cfg.imu_accel_bias_walk)
        if cfg.imu_method == "basalt":
            integral = preintegrate(gyro, accel, imu_dts, imu_mask,
                                    noise=imu_noise,
                                    bias_gyro=state.vio.bias_gyro,
                                    bias_accel=state.vio.bias_accel)
        else:
            # continuous-time backend (lpm/ugpm ≡ `integrator.cpp:184-215`):
            # midpoint timestamps reconstructed from the interval's dts
            from zenslam_tpu.imu.continuous import preintegrate_continuous

            d = jnp.where(imu_mask, imu_dts, 0.0)
            tmid = jnp.cumsum(d) - 0.5 * d
            t1 = jnp.sum(d)
            integral = preintegrate_continuous(
                tmid, gyro, accel, imu_mask, 0.0, t1,
                n_grid=int(gyro.shape[0]), method=cfg.imu_method,
                noise=imu_noise,
                bias_gyro=state.vio.bias_gyro,
                bias_accel=state.vio.bias_accel)
        R_pred, t_pred = _vio_predict(rig, state, integral, R_pred, t_pred)

    # propagated 1-sigma position uncertainty of the inertial prediction —
    # the 9x9 covariance's dp block doing work (fed to pose fusion as the
    # inertial candidate's weight; ≡ the covariance the reference computes
    # and drops, `integrator.cpp:86-156`)
    pred_sigma_p = None
    if integral is not None:
        pred_sigma_p = jnp.sqrt(jnp.maximum(
            jnp.trace(integral.cov[6:9, 6:9]) / 3.0, 1e-18))

    # ---- TRACK (temporal) ---------------------------------------------------
    prev_xy = state.features.xy          # 2D-2D pairs for the essential
    prev_lm_idx = state.features.lm_idx  # fallback + temporal rematch
    prev_desc = state.features.desc
    prev_feat_valid = state.features.valid
    feats, n_tracked = _temporal_track(cfg, rig, state, pyr_l, tsizes, R_pred, t_pred)
    track2d_ok = feats.valid  # tracked-through slots, before detection top-up
    n_prev_valid = jnp.sum(state.features.valid)
    tracked_ratio = n_tracked / jnp.maximum(n_prev_valid, 1)

    # ---- DETECT top-up ------------------------------------------------------
    feats, n_detected, next_track_id = _detect_topup(cfg, img_l, feats, state.next_track_id)

    # ---- DESCRIBE -----------------------------------------------------------
    if cfg.describe_refresh > 1:
        # periodic refresh: new detections (age 0) always computed; a
        # tracked feature recomputes every `describe_refresh` frames of age.
        # Tracks' ages are uniformly staggered, so ~1/refresh of the table
        # computes per frame and the Pallas ORB kernel block-skips the rest
        # (compaction + pl.when — see ops/orb_pallas.py). Full freeze (the
        # reference's describe-at-detection) was measured to TRIPLE drift
        # on a rotation-heavy orbit; refresh=4 matches every-frame quality.
        needs = feats.valid & (feats.age % cfg.describe_refresh == 0)
        computed = _compute_descriptors(cfg, img_l, feats, needs=needs)
        # INVALID rows must hold the zero descriptor, exactly as the
        # every-frame path emits (kernels gate bits by validity): a dead
        # track's leftover descriptor is a *real* code that downstream
        # matchers can spuriously hit; zero rows behave like the r1-r4
        # baseline (measured: garbage rows tripled drift on the 240p orbit
        # regardless of refresh rate)
        kept = jnp.where(feats.valid[:, None], feats.desc,
                         jnp.zeros_like(feats.desc))
        feats = feats._replace(
            desc=jnp.where(needs[:, None], computed, kept))
    else:
        feats = feats._replace(desc=_compute_descriptors(cfg, img_l, feats))

    # ---- ASSOCIATE lost landmarks ------------------------------------------
    feats, n_assoc = _associate_landmarks(cfg, rig, feats, state.lmap, R_pred, t_pred)

    # ---- TEMPORAL REMATCH (KLT-loss recovery via descriptors) ---------------
    if cfg.use_temporal_rematch:
        feats, n_rematch = _temporal_rematch(
            cfg, rig, feats, prev_desc, prev_xy, prev_lm_idx, prev_feat_valid,
            track2d_ok, state.R_cw, state.t_cw, R_pred, t_pred, state.lmap)

    # ---- STEREO + TRIANGULATE ----------------------------------------------
    feats, X_cam, tri_ok = _stereo_and_triangulate(cfg, rig, pyr_l, pyr_r, tsizes, feats, F_rig)

    # ---- KEYLINES (track / detect / describe / associate / stereo) ----------
    # ≡ keyline_tracker + keyline_detector + line triangulation; the whole
    # subsystem is compiled out when cfg.use_keylines is False (static flag)
    lines = state.lines
    line_map = state.line_map
    next_line_id = state.next_line_id
    n_lines = jnp.asarray(0, jnp.int32)
    n_line_tri = jnp.asarray(0, jnp.int32)
    if cfg.use_keylines:
        from zenslam_tpu.pipeline import lines_step as LS

        H, W = tsizes[0]
        lk_temporal = lambda pts, v, init_pts=None: _lk_fb(
            cfg, state.prev_pyr_l, pyr_l, tsizes, pts, v, init_pts=init_pts)
        lk_stereo = lambda pts, v, init_pts=None: _lk_fb(
            cfg, pyr_l, pyr_r, tsizes, pts, v, init_pts=init_pts)
        lines, n_lines_trk = LS.line_temporal_track(
            cfg, rig, lines, line_map, lk_temporal, R_pred, t_pred, (H, W))
        lines, n_line_det, next_line_id = LS.line_detect_topup(
            cfg, img_l, lines, next_line_id)
        lines = lines._replace(
            desc=keyline_descriptors(img_l, lines.ep, lines.valid))
        lines, _ = LS.line_associate(cfg, rig, lines, line_map, R_pred, t_pred)
        lines, X_line_ep, line_tri_ok = LS.line_stereo_triangulate(
            cfg, rig, lines, lk_stereo, F_rig)
        n_lines = jnp.sum(lines.valid)
        n_line_tri = jnp.sum(line_tri_ok)

    # ---- ESTIMATE (cascade PnP cam0 -> cam1 -> rigid) -----------------------
    has_lm = feats.valid & (feats.lm_idx >= 0)
    X_w_lm = state.lmap.xyz[jnp.clip(feats.lm_idx, 0, None)]
    corr0 = has_lm & (feats.age > 0)  # tracked (not fresh) observations
    corr1 = corr0 & feats.stereo_ok
    # 3D-3D: world points of current triangulations under the PREDICTED pose
    Rwp, twp = se3_inverse(R_pred, t_pred)
    X_w_cur = se3_apply(Rwp, twp, X_cam)
    corr3d = has_lm & tri_ok
    # fold line-endpoint 3D-2D correspondences into the cam0 problem
    # (≡ combined_estimator / `estimator.cpp:186-219`)
    X0_est, uv0_est, v0_est = X_w_lm, feats.xy, corr0
    if cfg.use_keylines:
        from zenslam_tpu.pipeline import lines_step as LS

        Xl, uvl, vl = LS.line_pose_correspondences(lines, line_map)
        X0_est = jnp.concatenate([X0_est, Xl])
        uv0_est = jnp.concatenate([uv0_est, uvl])
        v0_est = jnp.concatenate([v0_est, vl])
    # 2D-2D essential fallback inputs: temporal track pairs + prior landmark
    # positions in the PREVIOUS camera frame (≡ point_estimator 2D-2D family)
    ess_kwargs = {}
    if cfg.use_essential_fallback:
        prev_lm_xyz = state.lmap.xyz[jnp.clip(prev_lm_idx, 0, None)]
        X2_prev_cam = se3_apply(state.R_cw, state.t_cw, prev_lm_xyz)
        has3d2 = track2d_ok & (prev_lm_idx >= 0)
        ess_kwargs = dict(
            p2a=prev_xy, p2b=feats.xy, valid2=track2d_ok,
            X2_prev_cam=X2_prev_cam, has3d2=has3d2,
            R_prev=state.R_cw, t_prev=state.t_cw,
            essential_threshold=cfg.essential_threshold,
            essential_iters=cfg.essential_iters,
        )
    est = estimate_pose_cascade(
        k_est, rig,
        X0_est, uv0_est, v0_est,
        X_w_lm, feats.uv_r, corr1,
        X_w_cur, X_w_lm, corr3d,
        R_pred, t_pred,
        pnp_threshold=cfg.pnp_threshold,
        rigid_threshold=cfg.rigid_threshold,
        min_inliers=cfg.min_inliers,
        pnp_iters=cfg.pnp_iters,
        rigid_iters=cfg.rigid_iters,
        fuse=cfg.use_pose_fusion,
        pred_sigma_p=pred_sigma_p,
        **ess_kwargs,
    )
    R_cw, t_cw = est.R, est.t

    # ---- MAP UPDATE ---------------------------------------------------------
    # world coordinates of fresh triangulations under the ESTIMATED pose
    Rwc, twc = se3_inverse(R_cw, t_cw)
    X_w_new = se3_apply(Rwc, twc, X_cam)
    new_lm_cand = feats.valid & (feats.lm_idx < 0) & tri_ok
    # protect: landmarks referenced by any live keypoint
    lmap = state.lmap
    protect = jnp.zeros(lmap.valid.shape[0], bool).at[
        jnp.where(feats.valid & (feats.lm_idx >= 0), feats.lm_idx, lmap.valid.shape[0])
    ].set(True, mode="drop")
    cand_score = jnp.where(new_lm_cand, 1.0 / jnp.maximum(X_cam[:, 2], 0.1), -jnp.inf)
    slot, placed = allocate_landmark_slots(lmap.valid, lmap.last_seen, protect,
                                           cand_score, new_lm_cand)
    sl = jnp.where(placed, slot, lmap.valid.shape[0])
    # per-landmark intensity at the keypoint (≡ triangulator.cpp:74-103
    # color sampling; gray sensor -> scalar intensity)
    xi = jnp.clip(feats.xy[:, 0], 0.0, img_l.shape[1] - 1.001)
    yi = jnp.clip(feats.xy[:, 1], 0.0, img_l.shape[0] - 1.001)
    x0 = jnp.floor(xi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    fxs, fys = xi - x0, yi - y0
    imf = img_l.astype(jnp.float32)
    inten = (imf[y0, x0] * (1 - fxs) * (1 - fys)
             + imf[y0, x0 + 1] * fxs * (1 - fys)
             + imf[y0 + 1, x0] * (1 - fxs) * fys
             + imf[y0 + 1, x0 + 1] * fxs * fys)
    lmap = lmap._replace(
        xyz=lmap.xyz.at[sl].set(X_w_new, mode="drop"),
        desc=lmap.desc.at[sl].set(feats.desc, mode="drop"),
        valid=lmap.valid.at[sl].set(placed, mode="drop"),
        last_seen=lmap.last_seen.at[sl].set(state.frame_idx, mode="drop"),
        n_obs=lmap.n_obs.at[sl].set(1, mode="drop"),
        generation=lmap.generation.at[sl].add(1, mode="drop"),
        color=lmap.color.at[sl].set(inten, mode="drop"),
    )
    feats = feats._replace(lm_idx=jnp.where(placed, slot, feats.lm_idx))
    # observed landmarks: bump last_seen/n_obs. The reference keeps the
    # first-triangulated position forever (`types/map.h` operator+= insert-only
    # semantics) — that is a known weakness: far landmarks carry meters of
    # stereo depth noise and never improve, so drift feeds back. With
    # landmark_ema > 0, each observed landmark's position is averaged with its
    # fresh triangulation (zero-mean stereo noise integrates out).
    obs_slots = jnp.where(feats.valid & (feats.lm_idx >= 0), feats.lm_idx, lmap.valid.shape[0])
    lmap = lmap._replace(
        last_seen=lmap.last_seen.at[obs_slots].set(state.frame_idx, mode="drop"),
        n_obs=lmap.n_obs.at[obs_slots].add(1, mode="drop"),
    )
    if cfg.landmark_ema > 0.0:
        a = cfg.landmark_ema
        refine = feats.valid & (feats.lm_idx >= 0) & tri_ok & (~placed)
        ref_slots = jnp.where(refine, feats.lm_idx, lmap.valid.shape[0])
        old_xyz = lmap.xyz[jnp.clip(feats.lm_idx, 0, None)]
        blended = (1.0 - a) * old_xyz + a * X_w_new
        lmap = lmap._replace(xyz=lmap.xyz.at[ref_slots].set(blended, mode="drop"))
    n_new_lm = jnp.sum(placed)

    # ---- LINE MAP UPDATE ----------------------------------------------------
    if cfg.use_keylines:
        lines, line_map, _ = LS.line_map_update(
            cfg, lines, line_map, X_line_ep, line_tri_ok, R_cw, t_cw,
            state.frame_idx)
        line_map_size = jnp.sum(line_map.valid)
    else:
        line_map_size = jnp.asarray(0, jnp.int32)

    # ---- KEYFRAME -----------------------------------------------------------
    is_kf = _keyframe_decision(cfg, state, R_cw, t_cw, est.n_inliers, tracked_ratio)
    last_kf_R = jnp.where(is_kf, R_cw, state.last_kf_R)
    last_kf_t = jnp.where(is_kf, t_cw, state.last_kf_t)
    frames_since_kf = jnp.where(is_kf, 0, state.frames_since_kf + 1)

    # ---- MOTION UPDATE (≡ motion_predictor::update, EMA (new+old)/2) --------
    from zenslam_tpu.geometry.lie import so3_log

    Rpi, tpi = se3_inverse(state.R_cw, state.t_cw)
    R_rel, t_rel = se3_compose(R_cw, t_cw, Rpi, tpi)
    mm = state.motion
    vel_obs = t_rel
    ang_obs = so3_log(R_rel)
    acc_obs = vel_obs - mm.vel
    acc_ang_obs = ang_obs - mm.vel_ang
    first = mm.n_updates == 0
    motion = MotionModel(
        vel=jnp.where(first, vel_obs, 0.5 * (vel_obs + mm.vel)),
        vel_ang=jnp.where(first, ang_obs, 0.5 * (ang_obs + mm.vel_ang)),
        acc=jnp.where(first, mm.acc, 0.5 * (acc_obs + mm.acc)),
        acc_ang=jnp.where(first, mm.acc_ang, 0.5 * (acc_ang_obs + mm.acc_ang)),
        n_updates=mm.n_updates + 1,
    )
    vio = state.vio
    if imu is not None:
        vio = _vio_update(rig, vio, integral, accel, imu_mask,
                          state.R_cw, state.t_cw, R_cw, t_cw, est.ok)

    new_state = SlamState(
        features=feats,
        lmap=lmap,
        lines=lines,
        line_map=line_map,
        R_cw=R_cw,
        t_cw=t_cw,
        motion=motion,
        last_kf_R=last_kf_R,
        last_kf_t=last_kf_t,
        frames_since_kf=frames_since_kf,
        frame_idx=state.frame_idx + 1,
        next_track_id=next_track_id,
        next_line_id=next_line_id,
        prev_pyr_l=pyr_l,
        rng_key=key,
        vio=vio,
    )
    telem = FrameTelemetry(
        n_tracked=n_tracked,
        n_detected=n_detected,
        n_stereo=jnp.sum(feats.stereo_ok & feats.valid),
        n_triangulated=jnp.sum(tri_ok),
        n_pose_inliers=est.n_inliers,
        pose_method=est.method,
        pose_ok=est.ok,
        tracked_ratio=tracked_ratio,
        is_keyframe=is_kf,
        map_size=jnp.sum(lmap.valid),
        n_lines=n_lines,
        n_line_triangulated=n_line_tri,
        line_map_size=line_map_size,
        R_cw=R_cw,
        t_cw=t_cw,
    )
    return new_state, telem


def make_slam_step(cfg: SlamConfig, rig: StereoRig):
    """Close over config/rig; returns step(state, img_l, img_r)."""
    def step(state, img_l, img_r):
        return slam_step(cfg, rig, state, img_l, img_r)
    return step
