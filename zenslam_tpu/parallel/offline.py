"""Host-batch data-parallel OFFLINE throughput mode.

SURVEY.md §2.5 distributed requirement: "host-batch data parallelism over
frames for offline throughput" — the sequence is split into overlapping
chunks, each chunk runs the full front-end independently (one chunk per
host/chip in a pod deployment; `worker_fn` is the injection point), and the
per-chunk trajectories — each in its own gauge — are stitched through the
shared overlap frames into one global trajectory, with the per-chunk maps
re-expressed in the global frame and merged.

This is the SLAM analogue of data-parallel batch processing: chunks are
independent (embarrassingly parallel) except for the O(overlap) stitching,
so throughput scales ~linearly with hosts while accuracy matches a serial
run up to the per-chunk gauge alignment error (asserted in
tests/test_offline.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp

from zenslam_tpu.pipeline.runner import run_sequence


def split_chunks(n_frames: int, n_chunks: int, overlap: int):
    """Chunk boundaries [(start, end)) with ``overlap`` shared frames between
    consecutive chunks (chunk k re-processes the last ``overlap`` frames of
    chunk k-1 to observe the same poses for stitching)."""
    assert n_chunks >= 1 and overlap >= 1
    base = int(np.ceil((n_frames + (n_chunks - 1) * overlap) / n_chunks))
    bounds = []
    start = 0
    for c in range(n_chunks):
        end = min(start + base, n_frames)
        bounds.append((start, end))
        if end >= n_frames:
            break
        start = end - overlap
    return bounds


def _se3_chain(R_a, t_a, R_b, t_b):
    """Gauge transform worldB->worldA from two poses of the SAME frame:
    x_wA = R_a^T(x_cam - t_a) with x_cam = R_b x_wB + t_b."""
    R = R_a.T @ R_b
    t = R_a.T @ (t_b - t_a)
    # x_wA = R^... solve: x_cam = R_a x_wA + t_a = R_b x_wB + t_b →
    # x_wA = R_a^T R_b x_wB + R_a^T (t_b - t_a)
    return R, t


def run_offline_chunks(
    cfg,
    rig,
    left: np.ndarray,
    right: np.ndarray,
    n_chunks: int,
    overlap: int = 3,
    imu=None,
    worker_fn: Optional[Callable] = None,
):
    """Run a (T, H, W) stereo sequence as ``n_chunks`` independent chunk jobs
    and stitch. Returns dict with per-frame (R_cw, t_cw) in the GLOBAL
    (chunk-0) frame, the merged landmark cloud, and the chunk bounds.

    worker_fn(chunk_idx, left, right, imu) -> (telemetry, final_state): hook
    for dispatching chunks to remote hosts; default runs locally (sequential
    here, one-per-host in a pod deployment).
    """
    T = left.shape[0]
    bounds = split_chunks(T, n_chunks, overlap)

    def default_worker(c, l, r, im):
        st, tel = run_sequence(cfg, rig, l, r, imu=im)
        return tel, st

    worker = worker_fn or default_worker
    results = []
    for c, (s, e) in enumerate(bounds):
        im = None if imu is None else tuple(x[s:e] for x in imu)
        results.append(worker(c, left[s:e], right[s:e], im))

    # stitch chunk k into the global (chunk-0) frame through the FIRST
    # overlap frame: both chunks estimated a pose for it; their composition
    # gives the worldGlobal -> worldChunk gauge.
    R_all = np.zeros((T, 3, 3), np.float32)
    t_all = np.zeros((T, 3), np.float32)
    G_R = np.eye(3, dtype=np.float32)   # world_global -> world_chunk
    G_t = np.zeros(3, np.float32)
    maps = []
    for c, ((s, e), (tel, st)) in enumerate(zip(bounds, results)):
        Rs = np.asarray(tel.R_cw)
        ts = np.asarray(tel.t_cw)
        if c > 0:
            s_prev, e_prev = bounds[c - 1]
            # stitch at the LAST overlap frame: chunk c has tracked
            # overlap-1 frames by then (its local frame 0 is its gauge
            # anchor with an identity pose — useless for alignment)
            f = e_prev - 1                # global index of the shared frame
            # pose of frame f in the GLOBAL frame (chunk c-1 already stitched)
            R_g, t_g = R_all[f], t_all[f]
            # the same frame in chunk c's local gauge
            R_l, t_l = Rs[overlap - 1], ts[overlap - 1]
            # x_cam = R_l x_wC + t_l and x_cam = R_g x_wG + t_g
            # → x_wC = R_l^T R_g x_wG + R_l^T (t_g - t_l)
            G_R = R_l.T @ R_g
            G_t = R_l.T @ (t_g - t_l)
        # chunk pose composed with the gauge: x_cam = R x_wC + t,
        # x_wC = G_R x_wG + G_t → R' = R G_R, t' = R G_t + t
        Rg = np.einsum("kij,jl->kil", Rs, G_R)
        tg = np.einsum("kij,j->ki", Rs, G_t) + ts
        lo = s + (overlap if c > 0 else 0)
        off = overlap if c > 0 else 0
        R_all[lo:e] = Rg[off:]
        t_all[lo:e] = tg[off:]
        # landmarks: x_wG = G_R^T (x_wC - G_t)
        lm = st.lmap
        xyz = np.asarray(lm.xyz)
        xyz_g = (xyz - G_t) @ G_R
        maps.append((xyz_g, np.asarray(lm.valid), np.asarray(lm.desc)))
    # overlap frames at a chunk seam keep the PREVIOUS chunk's pose (it had
    # more history); handled above by writing only [lo:e).

    merged_xyz = np.concatenate([m[0][m[1]] for m in maps], axis=0)
    merged_desc = np.concatenate([m[2][m[1]] for m in maps], axis=0)
    return {
        "R_cw": R_all,
        "t_cw": t_all,
        "map_xyz": merged_xyz,
        "map_desc": merged_desc,
        "bounds": bounds,
    }
