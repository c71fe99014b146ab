"""Keyframe database with covisibility — fixed-capacity ring store.

Parity target: `mapping/keyframe_database.{h,cpp}`:
- add/update_pose/recent(n)                  ≡ `keyframe_database.cpp:73-107`
- covisibility edge when shared landmark
  observations ≥ threshold (default 15)      ≡ `keyframe_database.h:14`,
  `compute_shared` `:128-133`
- covisible(id) sorted by shared count       ≡ `:109-126`

TPU shape: each keyframe snapshot stores its feature table's (lm_idx, xy,
valid) rows; pairwise shared-landmark counts for ALL keyframes come from one
indicator matmul  shared = Ind @ Ind^T  with Ind (K, M) — no per-pair set
intersections. The same snapshots are the observation source for BA
(backend/ba.py) — the wiring the reference leaves to tests only (SURVEY.md
global observation) is live here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.backend.ba import BAProblem


class KeyframeDB(NamedTuple):
    R: jnp.ndarray         # (K, 3, 3) world->cam
    t: jnp.ndarray         # (K, 3)
    kp_xy: jnp.ndarray     # (K, N, 2) keypoint pixels at keyframe time
    kp_lm: jnp.ndarray     # (K, N) int32 landmark slot (-1 none)
    kp_lm_gen: jnp.ndarray # (K, N) int32 landmark GENERATION at observation —
                           # a slot reference is live iff the current map's
                           # generation still matches (slots are LRU-recycled)
    kp_xyz: jnp.ndarray    # (K, N, 3) landmark world position at keyframe
                           # time — loop-closure PnP anchors against the OLD
                           # keyframe's own geometry, immune to recycling
    kp_valid: jnp.ndarray  # (K, N) bool
    kp_uvr: jnp.ndarray    # (K, N, 2) right-image pixels (stereo transfer)
    kp_stereo: jnp.ndarray # (K, N) bool — stereo observation valid
    kp_desc: jnp.ndarray   # (K, N, 8) uint32 ORB descriptors (loop closure)
    frame_idx: jnp.ndarray # (K,) int32 source frame (-1 = empty slot)
    valid: jnp.ndarray     # (K,) bool
    next_slot: jnp.ndarray # () int32 ring pointer


def kf_db_init(max_keyframes: int, max_keypoints: int) -> KeyframeDB:
    K, N = max_keyframes, max_keypoints
    return KeyframeDB(
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1)),
        t=jnp.zeros((K, 3), jnp.float32),
        kp_xy=jnp.zeros((K, N, 2), jnp.float32),
        kp_lm=jnp.full((K, N), -1, jnp.int32),
        kp_lm_gen=jnp.full((K, N), -1, jnp.int32),
        kp_xyz=jnp.zeros((K, N, 3), jnp.float32),
        kp_valid=jnp.zeros((K, N), bool),
        kp_uvr=jnp.zeros((K, N, 2), jnp.float32),
        kp_stereo=jnp.zeros((K, N), bool),
        kp_desc=jnp.zeros((K, N, 8), jnp.uint32),
        frame_idx=jnp.full(K, -1, jnp.int32),
        valid=jnp.zeros(K, bool),
        next_slot=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def kf_db_add(db: KeyframeDB, R, t, kp_xy, kp_lm, kp_valid, kp_desc, frame_idx,
              kp_uvr=None, kp_stereo=None, kp_lm_gen=None, kp_xyz=None):
    """Insert a keyframe at the ring pointer (oldest evicted when full)."""
    s = db.next_slot
    if kp_uvr is None:
        kp_uvr = jnp.zeros_like(kp_xy)
    if kp_stereo is None:
        kp_stereo = jnp.zeros(kp_xy.shape[0], bool)
    if kp_lm_gen is None:
        kp_lm_gen = jnp.where(kp_lm >= 0, 0, -1)
    if kp_xyz is None:
        kp_xyz = jnp.zeros((kp_xy.shape[0], 3), jnp.float32)
    return db._replace(
        R=db.R.at[s].set(R),
        t=db.t.at[s].set(t),
        kp_xy=db.kp_xy.at[s].set(kp_xy),
        kp_lm=db.kp_lm.at[s].set(kp_lm),
        kp_lm_gen=db.kp_lm_gen.at[s].set(kp_lm_gen),
        kp_xyz=db.kp_xyz.at[s].set(kp_xyz),
        kp_valid=db.kp_valid.at[s].set(kp_valid),
        kp_uvr=db.kp_uvr.at[s].set(kp_uvr),
        kp_stereo=db.kp_stereo.at[s].set(kp_stereo),
        kp_desc=db.kp_desc.at[s].set(kp_desc),
        frame_idx=db.frame_idx.at[s].set(frame_idx),
        valid=db.valid.at[s].set(True),
        next_slot=(s + 1) % db.R.shape[0],
    )


@jax.jit
def kf_db_update_poses(db: KeyframeDB, R, t):
    """Write back BA-optimized poses (≡ `update_pose`, `:98-107`)."""
    return db._replace(R=R, t=t)


def covisibility(db: KeyframeDB, max_landmarks: int, threshold: int = 15):
    """(K, K) shared-landmark counts + boolean edges (diag excluded).

    ≡ `compute_shared`/`covisible` — all pairs at once via indicator matmul.
    """
    K, N = db.kp_lm.shape
    obs = db.kp_valid & (db.kp_lm >= 0)
    lm = jnp.where(obs, db.kp_lm, max_landmarks)  # drop-mode index
    ind = jnp.zeros((K, max_landmarks), jnp.float32)
    ind = ind.at[jnp.arange(K)[:, None], lm].set(1.0, mode="drop")
    shared = (ind @ ind.T).astype(jnp.int32)
    shared = shared * (1 - jnp.eye(K, dtype=jnp.int32))
    shared = shared * (db.valid[:, None] & db.valid[None, :])
    edges = shared >= threshold
    return shared, edges


def recent_mask(db: KeyframeDB, n: int):
    """Mask of the n most recently added keyframes (by frame_idx)."""
    order = jnp.argsort(-db.frame_idx)  # newest first; empty slots (-1) last
    mask = jnp.zeros(db.valid.shape[0], bool).at[order[:n]].set(True)
    return mask & db.valid


def ba_problem_from_db(db: KeyframeDB, lmap_xyz, lmap_valid, rig,
                       window_mask=None, fix_mask=None,
                       lmap_generation=None) -> BAProblem:
    """Flatten keyframe snapshots into a masked STEREO BA problem.

    ≡ the observation harvest in `local_bundle_adjustment.cpp:241-281`
    (every keyframe keypoint carrying a landmark index becomes one residual),
    EXTENDED with right-camera observations through the rig extrinsics —
    stereo residuals pin metric scale, which the reference's mono-only
    harvest leaves to the gauge.
    window_mask selects the keyframes to optimize; fix_mask the gauge
    (default: the oldest keyframe in the window).
    """
    K, N = db.kp_lm.shape
    kf_sel = db.valid if window_mask is None else (db.valid & window_mask)
    has_lm = db.kp_valid & (db.kp_lm >= 0) & kf_sel[:, None]
    if lmap_generation is not None:
        # drop observations whose landmark slot has been LRU-recycled since
        # the keyframe was taken (generation mismatch = different landmark)
        cur_gen = lmap_generation[jnp.clip(db.kp_lm, 0, None)]
        has_lm = has_lm & (cur_gen == db.kp_lm_gen)
    obs_valid_l = has_lm.reshape(-1)
    obs_valid_r = (has_lm & db.kp_stereo).reshape(-1)
    obs_kf1 = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
    obs_lm1 = jnp.clip(db.kp_lm.reshape(-1), 0, None)
    obs_kf = jnp.concatenate([obs_kf1, obs_kf1])
    obs_lm = jnp.concatenate([obs_lm1, obs_lm1])
    obs_uv = jnp.concatenate([db.kp_xy.reshape(-1, 2), db.kp_uvr.reshape(-1, 2)])
    obs_cam = jnp.concatenate([jnp.zeros(K * N, jnp.int32), jnp.ones(K * N, jnp.int32)])
    obs_valid = jnp.concatenate([obs_valid_l, obs_valid_r])
    # only landmarks actually observed in the window are optimized
    lm_obs = jnp.zeros(lmap_valid.shape[0], bool).at[
        jnp.where(obs_valid_l, obs_lm1, lmap_valid.shape[0])
    ].set(True, mode="drop")
    if fix_mask is None:
        # fix the oldest selected keyframe (`:344-347` first-KF default gauge)
        oldest = jnp.argmin(jnp.where(kf_sel, db.frame_idx, jnp.int32(2**30)))
        fix_mask = jnp.zeros(K, bool).at[oldest].set(True)
    cam_l, cam_r = rig.left, rig.right
    return BAProblem(
        R=db.R, t=db.t,
        kf_valid=kf_sel, kf_fixed=fix_mask,
        xyz=lmap_xyz, lm_valid=lmap_valid & lm_obs,
        obs_kf=obs_kf, obs_lm=obs_lm,
        obs_uv=obs_uv, obs_cam=obs_cam, obs_valid=obs_valid,
        fx=cam_l.fx, fy=cam_l.fy, cx=cam_l.cx, cy=cam_l.cy,
        fx_r=cam_r.fx, fy_r=cam_r.fy, cx_r=cam_r.cx, cy_r=cam_r.cy,
        R_rl=rig.R_rl, t_rl=rig.t_rl,
    )
