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

import os
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
        tel, st = worker(c, left[s:e], right[s:e], im)
        lm = st.lmap
        results.append((np.asarray(tel.R_cw), np.asarray(tel.t_cw),
                        np.asarray(lm.xyz), np.asarray(lm.valid),
                        np.asarray(lm.desc)))
    return stitch_chunks(T, bounds, results, overlap)


def stitch_chunks(T: int, bounds, results, overlap: int):
    """Stitch per-chunk results (each in its own gauge) into the global
    (chunk-0) frame. ``results[c]`` = (R_cw (t,3,3), t_cw (t,3),
    map_xyz (M,3), map_valid (M,), map_desc (M,D)) as numpy arrays —
    shared by the in-process and multi-process paths."""
    # stitch chunk k into the global (chunk-0) frame through the FIRST
    # overlap frame: both chunks estimated a pose for it; their composition
    # gives the worldGlobal -> worldChunk gauge.
    R_all = np.zeros((T, 3, 3), np.float32)
    t_all = np.zeros((T, 3), np.float32)
    G_R = np.eye(3, dtype=np.float32)   # world_global -> world_chunk
    G_t = np.zeros(3, np.float32)
    maps = []
    for c, ((s, e), (Rs, ts, m_xyz, m_valid, m_desc)) in enumerate(
            zip(bounds, results)):
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
        xyz_g = (m_xyz - G_t) @ G_R
        maps.append((xyz_g, m_valid, m_desc))
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


def run_offline_multiprocess(
    cfg,
    rig,
    left: np.ndarray,
    right: np.ndarray,
    n_workers: int,
    overlap: int = 3,
    imu=None,
    workdir: Optional[str] = None,
    platform: str = "cpu",
    pin_cpus: bool = True,
    cpus_per_worker: Optional[int] = None,
    timeout: float = 1200.0,
):
    """Multi-PROCESS offline throughput mode (VERDICT r2 item 4): one OS
    process per chunk, launched concurrently — the single-machine stand-in
    for one-chunk-per-host dispatch over a pod. Same stitching (and, up to
    float determinism, same numbers) as `run_offline_chunks`.

    pin_cpus: partition the machine's cores across workers via
    sched_setaffinity so the measurement reflects separate-host scaling
    rather than N processes thrashing one core pool.

    Workers share a persistent XLA compilation cache (JAX_COMPILATION_CACHE_DIR
    under ``workdir``'s parent by default): every worker runs the same jitted
    step, so only the first process per program shape actually compiles —
    without this, per-process compile time swamps the chunk compute and
    multi-process scaling measures the compiler, not the pipeline.
    """
    import json
    import subprocess
    import sys
    import tempfile

    T = left.shape[0]
    bounds = split_chunks(T, n_workers, overlap)
    workdir = workdir or tempfile.mkdtemp(prefix="zs_offline_")
    os.makedirs(workdir, exist_ok=True)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(workdir)),
                             "jax_cache")
    os.makedirs(cache_dir, exist_ok=True)

    all_cpus = sorted(os.sched_getaffinity(0))
    # cpus_per_worker pins EVERY worker (including a 1-worker baseline) to
    # the same core budget — the single-machine simulation of per-host
    # scaling, where each host brings its own cores
    per = cpus_per_worker or max(1, len(all_cpus) // max(len(bounds), 1))

    procs = []
    for c, (s, e) in enumerate(bounds):
        cpus = (all_cpus[c * per:(c + 1) * per] or all_cpus) if pin_cpus else None
        meta = {"cfg": dict(cfg._asdict()), "platform": platform,
                "cpus": cpus}
        arrays = {
            "meta": np.asarray(json.dumps(meta)),
            "left": left[s:e], "right": right[s:e],
            "R_rl": np.asarray(rig.R_rl), "t_rl": np.asarray(rig.t_rl),
            "R_ci": np.asarray(rig.R_ci), "t_ci": np.asarray(rig.t_ci),
        }
        for p, cam in (("l_", rig.left), ("r_", rig.right)):
            arrays.update({p + "fx": np.asarray(cam.fx), p + "fy": np.asarray(cam.fy),
                           p + "cx": np.asarray(cam.cx), p + "cy": np.asarray(cam.cy),
                           p + "dist": np.asarray(cam.dist),
                           p + "w": np.asarray(cam.width), p + "h": np.asarray(cam.height)})
        if imu is not None:
            gyro, accel, imu_dts, imu_mask = (np.asarray(x[s:e]) for x in imu)
            arrays.update(gyro=gyro, accel=accel, imu_dts=imu_dts,
                          imu_mask=imu_mask)
        in_path = os.path.join(workdir, f"chunk{c}_in.npz")
        out_path = os.path.join(workdir, f"chunk{c}_out.npz")
        np.savez(in_path, **arrays)
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)       # worker picks its own platform
        env["JAX_COMPILATION_CACHE_DIR"] = cache_dir
        env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
        repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
        procs.append((c, out_path, subprocess.Popen(
            [sys.executable, "-m", "zenslam_tpu.parallel.offline_worker",
             in_path, out_path],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)))

    results = [None] * len(bounds)
    for c, out_path, p in procs:
        out, _ = p.communicate(timeout=timeout)
        if p.returncode != 0:
            raise RuntimeError(
                f"offline worker {c} failed (rc={p.returncode}):\n{out[-4000:]}")
        blob = np.load(out_path)
        results[c] = (blob["R_cw"], blob["t_cw"], blob["map_xyz"],
                      blob["map_valid"], blob["map_desc"])
    return stitch_chunks(T, bounds, results, overlap)
