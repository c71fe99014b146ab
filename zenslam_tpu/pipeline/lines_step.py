"""Per-frame keyline stages — the line analogue of the keypoint path.

Parity targets:
- keyline temporal tracking (endpoint KLT fwd/bwd ×4 LK calls, recompute
  length/angle)                ≡ `tracking/tracking_utils.cpp:14-144`,
                                 `keyline_tracker.cpp:33-71`
- LSD top-up with masking      ≡ `keyline_detector.cpp:21-87` (ops/lines.py)
- landmark re-association by descriptor within a radius
                               ≡ `keyline_tracker::assign_landmark_indices`
                                 (`keyline_tracker.cpp:78-163`)
- stereo endpoint transfer + triangulation with the line-direction vs
  epipolar-direction gate 45°-135°
                               ≡ `triangulation_utils.cpp:92-129`
- line endpoints folded into the pose estimate
                               ≡ `combined_estimator.cpp:18-125` /
                                 `estimator.cpp:186-219`

TPU shape: endpoints are tracked as a flat (2L, 2) point batch through the
same Pallas LK kernel as the keypoints; every table is fixed-capacity masked
(pipeline/state.py LineTable / Line3dMap).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.camera import StereoRig, project
from zenslam_tpu.geometry.lie import se3_apply, se3_inverse
from zenslam_tpu.geometry.triangulate import triangulate_dlt, epipolar_residual
from zenslam_tpu.ops.lines import detect_keylines, keyline_descriptors, canonicalize_endpoints
from zenslam_tpu.ops.match import match_descriptors, radius_gate
from zenslam_tpu.frontend.tables import insert_into_free_slots, allocate_landmark_slots
from zenslam_tpu.pipeline.state import SlamConfig, LineTable, Line3dMap


def _flat(ep):
    """(L, 2, 2) endpoint table -> (2L, 2) point batch."""
    return ep.reshape(-1, 2)


def _unflat(pts, L):
    return pts.reshape(L, 2, 2)


def line_temporal_track(cfg: SlamConfig, rig: StereoRig, lines: LineTable,
                        line_map: Line3dMap, lk_fb, R_pred, t_pred, img_shape):
    """Endpoint KLT prev->cur with projected-landmark initial flow + fb
    check; both endpoints must survive (≡ `track_keylines`)."""
    L = lines.ep.shape[0]
    H, W = img_shape
    has_lm = (lines.lm_idx >= 0) & lines.valid
    lm_ep = line_map.xyz[jnp.clip(lines.lm_idx, 0, None)]   # (L, 2, 3)
    xc = se3_apply(R_pred, t_pred, lm_ep.reshape(-1, 3))
    proj = project(rig.left, xc)
    in_view = ((xc[:, 2] > 0.1) & (proj[:, 0] >= 0) & (proj[:, 0] < W)
               & (proj[:, 1] >= 0) & (proj[:, 1] < H)).reshape(L, 2)
    proj = proj.reshape(L, 2, 2)
    proj_ok = has_lm & in_view[:, 0] & in_view[:, 1]
    init = jnp.where(proj_ok[:, None, None], proj, lines.ep)

    ep_valid = jnp.repeat(lines.valid, 2)
    tracked, ok, _ = lk_fb(_flat(lines.ep), ep_valid, init_pts=_flat(init))
    ok2 = ok.reshape(L, 2)
    new_ep = _unflat(tracked, L)
    both = ok2[:, 0] & ok2[:, 1] & lines.valid
    # length/degenerate gate after tracking (≡ recompute length/angle,
    # `tracking_utils.cpp:120-144`)
    length = jnp.linalg.norm(new_ep[:, 1] - new_ep[:, 0], axis=-1)
    both = both & (length >= 0.5 * cfg.line_min_length) & (length <= 1.5 * cfg.line_max_length)
    lines = lines._replace(
        ep=jnp.where(both[:, None, None], canonicalize_endpoints(new_ep), lines.ep),
        valid=both,
        age=jnp.where(both, lines.age + 1, 0),
    )
    return lines, jnp.sum(both)


def line_detect_topup(cfg: SlamConfig, img_l, lines: LineTable, next_line_id):
    """Detect into free slots with masking over live keylines."""
    det_ep, det_score, det_valid = detect_keylines(
        img_l, lines.ep, lines.valid,
        mag_threshold=cfg.line_mag_threshold,
        max_keylines=cfg.max_keylines,
        min_length=cfg.line_min_length,
        max_length=cfg.line_max_length,
    )
    slot, placed = insert_into_free_slots(~lines.valid, det_score, det_valid)
    sl = jnp.where(placed, slot, cfg.max_keylines)
    rank = jnp.cumsum(placed.astype(jnp.int32)) - 1
    new_ids = next_line_id + rank
    n_placed = jnp.sum(placed.astype(jnp.int32))
    lines = lines._replace(
        ep=lines.ep.at[sl].set(det_ep, mode="drop"),
        valid=lines.valid.at[sl].set(placed, mode="drop"),
        lm_idx=lines.lm_idx.at[sl].set(-1, mode="drop"),
        track_id=lines.track_id.at[sl].set(new_ids, mode="drop"),
        age=lines.age.at[sl].set(0, mode="drop"),
        stereo_ok=lines.stereo_ok.at[sl].set(False, mode="drop"),
    )
    return lines, n_placed, next_line_id + n_placed


def line_associate(cfg: SlamConfig, rig: StereoRig, lines: LineTable,
                   line_map: Line3dMap, R_pred, t_pred):
    """Re-associate landmark-less keylines to 3D lines by descriptor match
    within a projected-midpoint radius (≡ assign_landmark_indices)."""
    M = line_map.valid.shape[0]
    mid3d = 0.5 * (line_map.xyz[:, 0] + line_map.xyz[:, 1])
    xc = se3_apply(R_pred, t_pred, mid3d)
    proj = project(rig.left, xc)
    in_front = xc[:, 2] > 0.1
    attached = jnp.zeros(M, bool).at[
        jnp.where(lines.valid & (lines.lm_idx >= 0), lines.lm_idx, M)
    ].set(True, mode="drop")
    assignable = line_map.valid & in_front & (~attached)
    free = lines.valid & (lines.lm_idx < 0)
    mid2d = 0.5 * (lines.ep[:, 0] + lines.ep[:, 1])
    gate = radius_gate(mid2d, proj, 30.0)
    idx, dist, ok = match_descriptors(
        lines.desc, line_map.desc, free, assignable,
        max_distance=cfg.line_match_distance, cross_check=True,
        gate_mask=gate,
    )
    new_lm = jnp.where(ok & free, idx, lines.lm_idx)
    return lines._replace(lm_idx=new_lm), jnp.sum(ok & free)


def line_stereo_triangulate(cfg: SlamConfig, rig: StereoRig, lines: LineTable,
                            lk_fb_stereo, F_rig):
    """L->R endpoint transfer, epipolar gate, endpoint DLT triangulation with
    depth/reprojection gates + the 45°-135° line-vs-epipolar direction gate
    (≡ `triangulation_utils.cpp:92-129`: lines parallel to the epipolar
    direction triangulate degenerately)."""
    L = lines.ep.shape[0]
    ep_valid = jnp.repeat(lines.valid, 2)
    flat = _flat(lines.ep)
    uv_r, ok, _ = lk_fb_stereo(flat, ep_valid)
    res = epipolar_residual(F_rig, flat, uv_r)
    ok = ok & (res < cfg.epipolar_threshold)

    eye = jnp.eye(3, dtype=jnp.float32)
    zero = jnp.zeros(3, jnp.float32)
    X_cam = triangulate_dlt(rig.left.K, eye, zero, rig.right.K, rig.R_rl, rig.t_rl,
                            flat, uv_r)
    z = X_cam[:, 2]
    x_r = se3_apply(rig.R_rl, rig.t_rl, X_cam)
    err_l = jnp.linalg.norm(project(rig.left, X_cam) - flat, axis=-1)
    err_r = jnp.linalg.norm(project(rig.right, x_r) - uv_r, axis=-1)
    pt_ok = (ok & (z > cfg.min_depth) & (z < cfg.max_depth) & (x_r[:, 2] > 0)
             & (err_l < cfg.reprojection_threshold)
             & (err_r < cfg.reprojection_threshold))
    ok2 = pt_ok.reshape(L, 2)
    st_ok = ok2[:, 0] & ok2[:, 1] & lines.valid

    # direction-vs-epipolar gate at the midpoint
    d = lines.ep[:, 1] - lines.ep[:, 0]
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-6)
    mid = 0.5 * (lines.ep[:, 0] + lines.ep[:, 1])
    mid_h = jnp.concatenate([mid, jnp.ones_like(mid[:, :1])], axis=-1)
    l_ep = mid_h @ F_rig.T  # epipolar line in the right image ~ direction in left
    e_dir = jnp.stack([-l_ep[:, 1], l_ep[:, 0]], axis=-1)
    e_dir = e_dir / jnp.maximum(jnp.linalg.norm(e_dir, axis=-1, keepdims=True), 1e-9)
    cos_a = jnp.abs(jnp.sum(d * e_dir, axis=-1))
    angle_ok = cos_a <= jnp.cos(jnp.radians(cfg.line_epipolar_min_deg))
    tri_ok = st_ok & angle_ok

    lines = lines._replace(ep_r=_unflat(uv_r, L), stereo_ok=st_ok)
    return lines, X_cam.reshape(L, 2, 3), tri_ok


def line_map_update(cfg: SlamConfig, lines: LineTable, line_map: Line3dMap,
                    X_cam_ep, tri_ok, R_cw, t_cw, frame_idx):
    """Insert fresh 3D lines (LRU eviction) and bump observation stats."""
    M = line_map.valid.shape[0]
    Rwc, twc = se3_inverse(R_cw, t_cw)
    X_w = se3_apply(Rwc, twc, X_cam_ep.reshape(-1, 3)).reshape(-1, 2, 3)
    new_cand = lines.valid & (lines.lm_idx < 0) & tri_ok
    protect = jnp.zeros(M, bool).at[
        jnp.where(lines.valid & (lines.lm_idx >= 0), lines.lm_idx, M)
    ].set(True, mode="drop")
    depth = 0.5 * (X_cam_ep[:, 0, 2] + X_cam_ep[:, 1, 2])
    score = jnp.where(new_cand, 1.0 / jnp.maximum(depth, 0.1), -jnp.inf)
    slot, placed = allocate_landmark_slots(line_map.valid, line_map.last_seen,
                                           protect, score, new_cand)
    sl = jnp.where(placed, slot, M)
    line_map = line_map._replace(
        xyz=line_map.xyz.at[sl].set(X_w, mode="drop"),
        desc=line_map.desc.at[sl].set(lines.desc, mode="drop"),
        valid=line_map.valid.at[sl].set(placed, mode="drop"),
        last_seen=line_map.last_seen.at[sl].set(frame_idx, mode="drop"),
        n_obs=line_map.n_obs.at[sl].set(1, mode="drop"),
    )
    lines = lines._replace(lm_idx=jnp.where(placed, slot, lines.lm_idx))
    obs = jnp.where(lines.valid & (lines.lm_idx >= 0), lines.lm_idx, M)
    line_map = line_map._replace(
        last_seen=line_map.last_seen.at[obs].set(frame_idx, mode="drop"),
        n_obs=line_map.n_obs.at[obs].add(1, mode="drop"),
    )
    return lines, line_map, jnp.sum(placed)


def line_pose_correspondences(lines: LineTable, line_map: Line3dMap):
    """Flatten line-endpoint 3D-2D correspondences for the pose cascade
    (≡ the endpoint arrays in `combined_estimator.cpp:18-125`)."""
    L = lines.ep.shape[0]
    has_lm = lines.valid & (lines.lm_idx >= 0) & (lines.age > 0)
    X = line_map.xyz[jnp.clip(lines.lm_idx, 0, None)].reshape(-1, 3)   # (2L, 3)
    uv = _flat(lines.ep)
    valid = jnp.repeat(has_lm, 2)
    return X, uv, valid
