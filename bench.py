"""Headline benchmark: stereo SLAM frames/s on one TPU chip vs the reference's
published CPU number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's mean total processing time of 0.063 s/frame
(≈15.9 fps) on TUM-VI corridor1 (BASELINE.md; `tracking-statistics.md:17`,
author's Apple-Silicon CPU). We run the full per-frame pipeline (pyramid,
KLT fwd+bwd temporal + stereo, FAST+ORB top-up, MXU Hamming landmark
association, triangulation, PnP/rigid RANSAC cascade, map update) on
same-order image sizes and report steady-state frames/s.
"""

import json
import sys
import time

import jax
import numpy as np


def main():
    from zenslam_tpu.io.synthetic import make_sequence
    from zenslam_tpu.pipeline import SlamConfig, init_state
    from zenslam_tpu.pipeline.step import slam_step
    from zenslam_tpu.eval.metrics import ate_rmse, camera_positions

    n_frames = 40
    seq = make_sequence(np.random.default_rng(11), n_frames=n_frames,
                        width=512, height=384, motion="arc", speed=0.5)
    cfg = SlamConfig()

    left = [jax.device_put(f) for f in seq.left]
    right = [jax.device_put(f) for f in seq.right]

    # compile + map warmup on the first few frames
    state = init_state(cfg, seq.left[0].shape)
    for t in range(3):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)

    t0 = time.perf_counter()
    tels = []
    for t in range(3, n_frames):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
        tels.append(tel)
    jax.block_until_ready(state.t_cw)
    dt = time.perf_counter() - t0
    fps = (n_frames - 3) / dt

    baseline_fps = 1.0 / 0.063  # reference: 0.063 s/frame (BASELINE.md)
    print(json.dumps({
        "metric": "stereo_slam_frames_per_second_single_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
    }))


if __name__ == "__main__":
    main()
