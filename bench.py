"""Headline benchmark: stereo SLAM frames/s on one TPU chip vs the reference's
published CPU number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's mean total processing time of 0.063 s/frame
(≈15.9 fps) on TUM-VI corridor1 (BASELINE.md; `tracking-statistics.md:17`,
author's Apple-Silicon CPU). That dataset is 1024x1024 stereo
(`zenslam_options/options/tumvi.yaml:6`), so this benchmark runs the full
per-frame pipeline (pyramid, fused fwd-bwd KLT temporal + stereo, FAST+ORB
top-up, MXU Hamming landmark association, triangulation, PnP/rigid RANSAC
cascade, map update) on 1024x1024 stereo frames — the reference's exact
operating point — over 200 timed frames, and reports steady-state frames/s.

A secondary 512x384 line (round-1 conditions) goes to stderr for continuity.
"""

import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))

import json
import sys
import time

import jax
import numpy as np


def run_fps(width, height, n_frames, n_warmup=8, seed=11):
    from zenslam_tpu.io.synthetic import make_sequence
    from zenslam_tpu.pipeline import SlamConfig, init_state
    from zenslam_tpu.pipeline.step import slam_step

    seq = make_sequence(np.random.default_rng(seed), n_frames=n_frames,
                        width=width, height=height, motion="arc", speed=0.5,
                        device_render=True)
    cfg = SlamConfig()
    left = [jax.device_put(f) for f in seq.left]
    right = [jax.device_put(f) for f in seq.right]

    state = init_state(cfg, seq.left[0].shape)
    for t in range(n_warmup):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)

    t0 = time.perf_counter()
    for t in range(n_warmup, n_frames):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)
    dt = time.perf_counter() - t0
    fps = (n_frames - n_warmup) / dt
    return fps, tel


def main():
    baseline_fps = 1.0 / 0.063  # reference: 0.063 s/frame (BASELINE.md)

    fps_small, _ = run_fps(512, 384, 60)
    print(f"secondary 512x384: {fps_small:.2f} fps "
          f"(vs_baseline {fps_small / baseline_fps:.3f})", file=sys.stderr)

    fps, tel = run_fps(1024, 1024, 208)
    print(f"primary 1024x1024 (200 timed frames): {fps:.2f} fps, "
          f"tracked {int(tel.n_tracked)}, map {int(tel.map_size)}, "
          f"inliers {int(tel.n_pose_inliers)}", file=sys.stderr)

    print(json.dumps({
        "metric": "stereo_slam_frames_per_second_single_chip_1024x1024",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
