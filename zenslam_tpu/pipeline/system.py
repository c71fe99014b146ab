"""The full keyframe SLAM system: front-end step + live back-end.

This wires together what the reference compiles but never connects
(SURVEY.md global observation: LBA/keyframe-DB/BoW are test-only there):

  per frame   : jitted slam_step (pipeline/step.py)
  per keyframe: snapshot into KeyframeDB → windowed Schur BA over the recent
                window (`BASELINE.json` config[1]/[2]) → pose + landmark
                write-back (map refinement) → BoW loop-closure query →
                on a loop hit: PnP against the old keyframe's landmarks,
                pose-graph optimization over all keyframes (config[3]),
                correction propagated to the live state.

Host-side control flow decides WHEN (keyframe flags from telemetry); every
piece of math is a jitted fixed-shape function, so each path compiles once.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.camera import StereoRig, project
from zenslam_tpu.geometry.lie import se3_apply, se3_compose, se3_inverse
from zenslam_tpu.pipeline.state import SlamConfig, SlamState, init_state
from zenslam_tpu.pipeline.step import slam_step
from zenslam_tpu.backend.keyframes import (
    KeyframeDB, kf_db_init, kf_db_add, ba_problem_from_db, recent_mask,
)
from zenslam_tpu.backend.ba import bundle_adjust, bundle_adjust_cg
from zenslam_tpu.backend.pose_graph import PoseGraph, optimize_pose_graph
from zenslam_tpu.backend.bow import (
    BowDatabase,
    build_vocabulary, descriptors_to_bow, bow_db_init, bow_db_add, bow_db_query,
)
from zenslam_tpu.estimation.pnp import solve_pnp_ransac
from zenslam_tpu.ops.match import match_descriptors


@dataclass
class BackendConfig:
    max_keyframes: int = 64         # long-gap loops need their anchor KF alive
    ba_window: int = 8              # config[1]: 8-keyframe sliding window
    ba_iterations: int = 10
    ba_every_kf: bool = True
    # reduced-camera-system solver: "dense" (Cholesky, small windows),
    # "cg" (matrix-free, full-map scale), "auto" = cg when the BA window
    # itself exceeds 16 keyframes (the problem is compacted to the window,
    # so the dense path's (M, K, 6, 3) blocks scale with ba_window, not
    # with the keyframe-db capacity)
    ba_solver: str = "auto"
    # loop closure
    enable_loop_closure: bool = True
    bow_words: int = 128
    bow_min_score: float = 0.35
    bow_min_frame_gap: int = 40
    bow_top_k: int = 3              # geometric verification tries each candidate
    loop_min_inliers: int = 15
    # loop anchors are the OLD keyframe's triangulations — they carry the
    # stereo depth noise of their day, so the PnP gate is looser than the
    # per-frame tracker's (measured: true loops validate at ~8 px, not 4)
    loop_pnp_threshold: float = 8.0
    pose_graph_iterations: int = 15
    # the vocabulary is retrained over ALL accumulated keyframe descriptors
    # once this many keyframes exist (a codebook from one view is a poor
    # quantizer; ≡ the reference training its vocab on a descriptor corpus,
    # `bow_vocabulary.cpp:54-142`)
    vocab_retrain_kfs: int = 8
    # pose-graph edge capacity
    max_edges: int = 256
    # host-spill landmark archive (SURVEY §5 map-scaling axis): landmarks
    # recycled out of the fixed-capacity live table are archived on host and
    # frustum-reloaded on revisit (backend/map_archive.py). Default on —
    # costs one ~350 KB device->host read per KEYFRAME, restores the
    # reference's never-forgets std::map semantics at fixed device memory.
    enable_map_spill: bool = True
    spill_reload_max: int = 128
    spill_radius: float = 50.0     # ≡ `tracking_options.h:14` map radius cap


@dataclass
class SlamSystem:
    """Host-side system state around the jitted math."""

    cfg: SlamConfig
    bcfg: BackendConfig
    rig: StereoRig
    state: SlamState
    kf_db: KeyframeDB
    bow_db: object
    archive: object = None      # LandmarkArchive (host spill store)
    vocab: Optional[jnp.ndarray] = None
    # pose-graph edges (host lists; converted to arrays on demand)
    edge_i: list = field(default_factory=list)
    edge_j: list = field(default_factory=list)
    edge_R: list = field(default_factory=list)
    edge_t: list = field(default_factory=list)
    edge_w: list = field(default_factory=list)
    last_kf_slot: int = -1
    n_loop_closures: int = 0
    n_ba_runs: int = 0
    vocab_retrained: bool = False
    loop_debug: list = field(default_factory=list)


def create_system(cfg: SlamConfig, bcfg: BackendConfig, rig: StereoRig,
                  image_shape, seed: int = 0) -> SlamSystem:
    from zenslam_tpu.backend.map_archive import LandmarkArchive

    desc_shape, desc_dtype = (((128,), np.float32)
                              if cfg.descriptor == "sift"
                              else ((8,), np.uint32))
    return SlamSystem(
        cfg=cfg, bcfg=bcfg, rig=rig,
        state=init_state(cfg, image_shape, seed=seed),
        kf_db=kf_db_init(bcfg.max_keyframes, cfg.max_keypoints),
        bow_db=bow_db_init(bcfg.max_keyframes, bcfg.bow_words),
        archive=LandmarkArchive(desc_shape, desc_dtype),
    )


def _apply_pose_correction(state: SlamState, R_old, t_old, R_new, t_new) -> SlamState:
    """Propagate a keyframe correction to the live pose:
    T_cur' = (T_kf_new ∘ T_kf_old^-1) ∘ T_cur."""
    Ri, ti = se3_inverse(R_old, t_old)
    Rd, td = se3_compose(R_new, t_new, Ri, ti)
    R_cur, t_cur = se3_compose(Rd, td, state.R_cw, state.t_cw)
    return state._replace(R_cw=R_cur, t_cw=t_cur)


def _run_windowed_ba(sys: SlamSystem):
    """Windowed Schur BA over the most recent keyframes; write back.

    The problem is COMPACTED to the window: the W most recent keyframe rows
    are gathered into a (W, …) sub-database, so the jitted solver compiles
    for K=ba_window — the dense path's (M, K, 6, 3) block tensor and the
    (6K, 6K) reduced system scale with the window, not the db capacity."""
    db = sys.kf_db
    W = sys.bcfg.ba_window
    order = jnp.argsort(-db.frame_idx)       # newest first; empty slots last
    slots = order[:W]                        # (W,) ring slots in the window
    sub = db._replace(
        R=db.R[slots], t=db.t[slots],
        kp_xy=db.kp_xy[slots], kp_lm=db.kp_lm[slots],
        kp_lm_gen=db.kp_lm_gen[slots], kp_xyz=db.kp_xyz[slots],
        kp_valid=db.kp_valid[slots], kp_uvr=db.kp_uvr[slots],
        kp_stereo=db.kp_stereo[slots], kp_desc=db.kp_desc[slots],
        frame_idx=db.frame_idx[slots], valid=db.valid[slots],
    )
    p = ba_problem_from_db(
        sub, sys.state.lmap.xyz, sys.state.lmap.valid,
        sys.rig, lmap_generation=sys.state.lmap.generation,
    )
    use_cg = (sys.bcfg.ba_solver == "cg"
              or (sys.bcfg.ba_solver == "auto" and W > 16))
    if use_cg:
        res = bundle_adjust_cg(p, iterations=sys.bcfg.ba_iterations)
    else:
        res = bundle_adjust(p, iterations=sys.bcfg.ba_iterations)
    # newest keyframe sits at compact index 0 (argsort order)
    R_old = sub.R[0]
    t_old = sub.t[0]
    # write back poses & refined landmarks (only those optimized)
    sys.kf_db = db._replace(R=db.R.at[slots].set(res["R"]),
                            t=db.t.at[slots].set(res["t"]))
    new_xyz = jnp.where(p.lm_valid[:, None], res["xyz"], sys.state.lmap.xyz)
    sys.state = sys.state._replace(lmap=sys.state.lmap._replace(xyz=new_xyz))
    sys.state = _apply_pose_correction(sys.state, R_old, t_old,
                                       res["R"][0], res["t"][0])
    sys.n_ba_runs += 1
    return float(res["rmse_before"]), float(res["rmse_after"])


def _retrain_vocab(sys: SlamSystem):
    """Retrain the BoW vocabulary over ALL accumulated keyframe descriptors
    and re-quantize every stored keyframe under the new codebook (bow slots
    stay aligned with keyframe slots)."""
    db = sys.kf_db
    K, N = db.kp_lm.shape
    desc = db.kp_desc.reshape(K * N, 8)
    valid = (db.kp_valid & db.valid[:, None]).reshape(K * N)
    sys.vocab = build_vocabulary(jax.random.PRNGKey(13), desc, valid,
                                 n_words=sys.bcfg.bow_words, iters=6)
    hists = jax.vmap(lambda d, v: descriptors_to_bow(sys.vocab, d, v))(
        db.kp_desc, db.kp_valid)
    hists = hists * db.valid[:, None]
    doc_freq = jnp.sum((hists > 0).astype(jnp.float32), axis=0)
    sys.bow_db = BowDatabase(
        hist=hists,
        frame_idx=db.frame_idx,
        valid=db.valid,
        next_slot=db.next_slot,
        doc_freq=doc_freq,
    )
    sys.vocab_retrained = True


def _try_loop_closure(sys: SlamSystem, kf_slot: int, frame_idx: int):
    """BoW query → descriptor match → PnP vs old keyframe landmarks →
    pose-graph edge + optimization (config[3])."""
    bcfg = sys.bcfg
    db = sys.kf_db
    hist = descriptors_to_bow(sys.vocab, db.kp_desc[kf_slot], db.kp_valid[kf_slot])
    scores, frames, slots = bow_db_query(
        sys.bow_db, hist, frame_idx, min_frame_gap=bcfg.bow_min_frame_gap,
        top_k=bcfg.bow_top_k)
    sys.bow_db = bow_db_add(sys.bow_db, hist, frame_idx)
    dbg = {"frame": frame_idx, "score": float(scores[0]),
           "cand_frame": int(frames[0]), "n_corr": 0, "n_inliers": 0,
           "fired": False}
    sys.loop_debug.append(dbg)
    # geometric verification over ALL scoring candidates (≡ the reference's
    # sorted top-k query, `bow_database.cpp:51-130` — the similarity ranking
    # of a small codebook is noisy; PnP is the arbiter)
    res = None
    old_slot = -1
    for c in range(bcfg.bow_top_k):
        if float(scores[c]) < bcfg.bow_min_score:
            continue
        cand_slot = int(slots[c])
        # descriptor match: current keyframe keypoints vs old keyframe's
        idx, dist, ok = match_descriptors(
            db.kp_desc[kf_slot], db.kp_desc[cand_slot],
            db.kp_valid[kf_slot], db.kp_valid[cand_slot],
            max_distance=64, cross_check=True,
        )
        # 3D-2D: the OLD keyframe's own landmark-position snapshot vs current
        # pixels. Using kp_xyz (not the live map) makes the loop anchor
        # immune to LRU slot recycling.
        old_lm = db.kp_lm[cand_slot][jnp.clip(idx, 0, None)]
        corr_ok = ok & (old_lm >= 0)
        X = db.kp_xyz[cand_slot][jnp.clip(idx, 0, None)]
        uv = db.kp_xy[kf_slot]
        dbg["n_corr"] = max(dbg["n_corr"], int(corr_ok.sum()))
        r = solve_pnp_ransac(jax.random.PRNGKey(frame_idx * 16 + c),
                             sys.rig.left.K, X, uv, corr_ok,
                             threshold=bcfg.loop_pnp_threshold, iters=128)
        dbg["n_inliers"] = max(dbg["n_inliers"], int(r["n_inliers"]))
        if int(r["n_inliers"]) >= bcfg.loop_min_inliers:
            res = r
            old_slot = cand_slot
            break
    if res is None:
        return False
    dbg["fired"] = True
    dbg["matched_frame"] = int(db.frame_idx[old_slot])
    # edge: T_new_old measured = T_new_corrected ∘ T_old^-1
    Ri, ti = se3_inverse(db.R[old_slot], db.t[old_slot])
    Rm, tm = se3_compose(res["R"], res["t"], Ri, ti)
    sys.edge_i.append(kf_slot)
    sys.edge_j.append(old_slot)
    sys.edge_R.append(np.asarray(Rm))
    sys.edge_t.append(np.asarray(tm))
    sys.edge_w.append(5.0)
    sys.n_loop_closures += 1
    _run_pose_graph(sys)
    return True


def _run_pose_graph(sys: SlamSystem):
    """Optimize all keyframe poses over odometry + loop edges; write back."""
    K = sys.bcfg.max_keyframes
    E = sys.bcfg.max_edges
    n_e = min(len(sys.edge_i), E)
    edge_i = np.zeros(E, np.int32)
    edge_j = np.zeros(E, np.int32)
    edge_R = np.tile(np.eye(3, dtype=np.float32), (E, 1, 1))
    edge_t = np.zeros((E, 3), np.float32)
    edge_w = np.zeros(E, np.float32)
    edge_valid = np.zeros(E, bool)
    for e in range(n_e):
        edge_i[e] = sys.edge_i[e]
        edge_j[e] = sys.edge_j[e]
        edge_R[e] = sys.edge_R[e]
        edge_t[e] = sys.edge_t[e]
        edge_w[e] = sys.edge_w[e]
        edge_valid[e] = True
    db = sys.kf_db
    slot = sys.last_kf_slot
    R_old, t_old = db.R[slot], db.t[slot]
    # gauge: oldest valid keyframe
    fi = np.asarray(db.frame_idx)
    fixed = np.zeros(K, bool)
    valid = np.asarray(db.valid)
    if valid.any():
        fixed[np.asarray(jnp.argmin(jnp.where(db.valid, db.frame_idx, jnp.int32(2**30))))] = True
    g = PoseGraph(
        R=db.R, t=db.t,
        node_valid=db.valid, node_fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(edge_i), edge_j=jnp.asarray(edge_j),
        edge_R=jnp.asarray(edge_R), edge_t=jnp.asarray(edge_t),
        edge_valid=jnp.asarray(edge_valid), edge_weight=jnp.asarray(edge_w),
    )
    res = optimize_pose_graph(g, iterations=sys.bcfg.pose_graph_iterations)
    sys.kf_db = sys.kf_db._replace(R=res["R"], t=res["t"])
    sys.state = _apply_pose_correction(sys.state, R_old, t_old,
                                       res["R"][slot], res["t"][slot])


def process_frame(sys: SlamSystem, img_l, img_r, imu=None):
    """One frame through the full system. Returns telemetry (+ backend info).

    imu: optional (gyro (S,3), accel (S,3), dts (S,), mask (S,)) — the IMU
    interval ending at this frame; enables the VIO branch of the front-end
    (preintegrated prediction + gravity/velocity estimation,
    ≡ `slam_thread.cpp:126-132, 221-235`)."""
    import time as _time

    t0 = _time.time()
    sys.state, tel = slam_step(sys.cfg, sys.rig, sys.state, img_l, img_r,
                               imu=imu)
    # ONE device→host transfer for everything the host reads this frame
    # (each separate jax-scalar read is a ~25 ms tunnel round trip — see
    # pack_telemetry); this fetch is also the step sync point.
    from zenslam_tpu.pipeline.state import pack_telemetry, unpack_telemetry

    tel = unpack_telemetry(pack_telemetry(tel))
    t1 = _time.time()
    backend_info = {"ba": None, "loop": False,
                    "step_ms": (t1 - t0) * 1000, "backend_ms": 0.0}
    if bool(tel.is_keyframe):
        feats = sys.state.features
        prev_slot = sys.last_kf_slot
        slot = int(sys.kf_db.next_slot)
        lm_clip = jnp.clip(feats.lm_idx, 0, None)
        # back-end consumers (keyframe DB, BoW, loop PnP matching) are
        # binary-code machinery; the float family crosses this boundary as
        # LSH sign codes (ops/match.lsh_binarize — SimHash of the L2 space)
        kf_desc = feats.desc
        if sys.cfg.descriptor == "sift":
            from zenslam_tpu.ops.match import lsh_binarize

            kf_desc = lsh_binarize(feats.desc)
        sys.kf_db = kf_db_add(
            sys.kf_db, sys.state.R_cw, sys.state.t_cw,
            feats.xy, feats.lm_idx, feats.valid & (feats.lm_idx >= 0),
            kf_desc, int(sys.state.frame_idx) - 1,
            kp_uvr=feats.uv_r, kp_stereo=feats.stereo_ok,
            kp_lm_gen=jnp.where(feats.lm_idx >= 0,
                                sys.state.lmap.generation[lm_clip], -1),
            kp_xyz=sys.state.lmap.xyz[lm_clip],
        )
        sys.last_kf_slot = slot
        # odometry edge between consecutive keyframes
        if prev_slot >= 0:
            Ri, ti = se3_inverse(sys.kf_db.R[prev_slot], sys.kf_db.t[prev_slot])
            Rm, tm = se3_compose(sys.state.R_cw, sys.state.t_cw, Ri, ti)
            sys.edge_i.append(slot)
            sys.edge_j.append(prev_slot)
            sys.edge_R.append(np.asarray(Rm))
            sys.edge_t.append(np.asarray(tm))
            sys.edge_w.append(1.0)
        # windowed BA (config[1]/[2])
        if sys.bcfg.ba_every_kf and prev_slot >= 0:
            backend_info["ba"] = _run_windowed_ba(sys)
        # landmark spill/reload (map-scaling axis): archive the (BA-refined)
        # live map, then pull archived landmarks back into the table when
        # the camera revisits their region
        if sys.bcfg.enable_map_spill and sys.archive is not None:
            sys.archive.sync(sys.state.lmap)
            new_lmap = sys.archive.reload(
                sys.state.lmap, sys.state.R_cw, sys.state.t_cw,
                sys.rig.left, int(sys.state.frame_idx),
                reload_max=sys.bcfg.spill_reload_max,
                radius=sys.bcfg.spill_radius)
            if new_lmap is not sys.state.lmap:
                sys.state = sys.state._replace(lmap=new_lmap)
            backend_info["spill"] = {"archived": len(sys.archive),
                                     "reloads": sys.archive.n_reloads}
        # loop closure (config[3])
        if sys.bcfg.enable_loop_closure:
            if sys.vocab is None:
                # bootstrap vocabulary from the first keyframe's descriptors…
                sys.vocab = build_vocabulary(
                    jax.random.PRNGKey(7), kf_desc, feats.valid,
                    n_words=sys.bcfg.bow_words, iters=6,
                )
            elif (not sys.vocab_retrained
                  and int(sys.kf_db.valid.sum()) >= sys.bcfg.vocab_retrain_kfs):
                # …then retrain over the accumulated keyframe corpus once
                # enough views exist (one view is a poor quantizer)
                _retrain_vocab(sys)
            frame_idx = int(sys.state.frame_idx) - 1
            backend_info["loop"] = _try_loop_closure(sys, slot, frame_idx)
        jax.block_until_ready(sys.state.t_cw)
        backend_info["backend_ms"] = (_time.time() - t1) * 1000
    return tel, backend_info


def run_system(sys: SlamSystem, left, right, imu=None):
    """Run a (T, H, W) stereo sequence through the full system.

    imu: optional (gyro (T,S,3), accel (T,S,3), dts (T,S), mask (T,S))."""
    tels, infos = [], []
    for t in range(left.shape[0]):
        fi = None if imu is None else tuple(jnp.asarray(x[t]) for x in imu)
        tel, info = process_frame(sys, jnp.asarray(left[t]),
                                  jnp.asarray(right[t]), imu=fi)
        tels.append(tel)
        infos.append(info)
    telem = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]), *tels)
    return telem, infos
