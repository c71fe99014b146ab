"""Executable EuRoC parity checker (r3 verdict task 5).

Consumes a zenslam_tpu.app OUTPUT DIRECTORY plus an expected-metrics JSON
(options/euroc_mh_expected.json) and exits 0 (pass) / 1 (fail), replacing the
commented-out heredoc recipe that used to live in options/euroc_mh.yaml.

Checks:
  - ATE / RPE of trajectory.csv against the groundtruth CSV (EuRoC
    state_groundtruth layout, SLERP-free nearest/interp positions via
    io.dataset.Groundtruth) vs `ate_bound_mm` / `rpe_bound_mm`
  - mean tracked features vs `min_tracked_mean`
  - problem-frame fraction (telemetry.analyze_frame_stats thresholds
    ≡ `zenslam_py/scripts/analyze_frame_stats.py`) vs
    `max_problem_frame_fraction`
  - steady-state throughput vs `min_fps_tpu` — only when the run actually
    executed on a TPU (recorded by the app in effective_options; a CPU CI
    run skips the hardware-specific floor)

Usage:
    python scripts/check_euroc_run.py OUTPUT_DIR \
        [--expected options/euroc_mh_expected.json] \
        [--groundtruth PATH] [--require-fps]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)


def load_trajectory(path: str):
    ts, pos = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            parts = [float(x) for x in line.split(",")]
            ts.append(parts[0])
            pos.append(parts[1:4])
    return np.asarray(ts), np.asarray(pos)


def main(argv=None):
    ap = argparse.ArgumentParser("check_euroc_run")
    ap.add_argument("output_dir")
    ap.add_argument("--expected",
                    default=os.path.join(_ROOT, "options/euroc_mh_expected.json"))
    ap.add_argument("--groundtruth", default="",
                    help="groundtruth CSV (default: folder.groundtruth_file "
                         "from the run's effective_options.yaml)")
    ap.add_argument("--require-fps", action="store_true",
                    help="enforce min_fps_tpu even off-TPU")
    args = ap.parse_args(argv)

    from zenslam_tpu.eval.metrics import ate_rmse, rpe_rmse
    from zenslam_tpu.io.dataset import Groundtruth
    from zenslam_tpu.io.telemetry import analyze_frame_stats

    exp = json.load(open(args.expected))
    out = args.output_dir
    failures = []

    gt_path = args.groundtruth
    if not gt_path:
        eff = os.path.join(out, "effective_options.yaml")
        if os.path.exists(eff):
            import yaml

            d = yaml.safe_load(open(eff)) or {}
            gt_path = (d.get("folder") or {}).get("groundtruth_file", "")

    # --- accuracy ---------------------------------------------------------
    traj_path = os.path.join(out, "trajectory.csv")
    if not os.path.exists(traj_path):
        print(f"FAIL: no trajectory.csv in {out}")
        return 1
    ts, est = load_trajectory(traj_path)
    if gt_path and os.path.exists(gt_path):
        gt = Groundtruth(gt_path)
        gt_pos = np.stack([gt.pose_at(t)[1] for t in ts])
        ate = ate_rmse(est, gt_pos) * 1000.0
        rpe = rpe_rmse(est, gt_pos) * 1000.0
        print(f"ATE {ate:.1f} mm (bound {exp['ate_bound_mm']}) ; "
              f"RPE {rpe:.1f} mm (bound {exp['rpe_bound_mm']})")
        if ate > exp["ate_bound_mm"]:
            failures.append(f"ATE {ate:.1f} mm > {exp['ate_bound_mm']} mm")
        if rpe > exp["rpe_bound_mm"]:
            failures.append(f"RPE {rpe:.1f} mm > {exp['rpe_bound_mm']} mm")
    else:
        failures.append(f"no groundtruth available (looked for {gt_path!r})")

    # --- telemetry health -------------------------------------------------
    csv_path = os.path.join(out, "frame_data.csv")
    on_tpu = False
    try:
        import jax

        on_tpu = any(d.platform == "tpu" for d in jax.devices())
    except Exception:
        pass
    if os.path.exists(csv_path):
        # the "slow frame" flag is a TPU-throughput criterion; on a CPU CI
        # run every frame is "slow" and the flag would drown the quality
        # flags (low-KLT / low-triangulation / low-inlier), so it only
        # participates when the hardware target is actually present
        slow_ms = 100.0 if (on_tpu or args.require_fps) else 1e12
        stats = analyze_frame_stats(csv_path, slow_ms=slow_ms)
        print(f"frames {stats['n_frames']}, mean tracked "
              f"{stats['mean_tracked']:.0f} (min {exp['min_tracked_mean']}), "
              f"problem fraction {stats['problem_fraction']:.2f} "
              f"(max {exp['max_problem_frame_fraction']})")
        if stats["mean_tracked"] < exp["min_tracked_mean"]:
            failures.append(
                f"mean tracked {stats['mean_tracked']:.0f} < "
                f"{exp['min_tracked_mean']}")
        if stats["problem_fraction"] > exp["max_problem_frame_fraction"]:
            failures.append(
                f"problem fraction {stats['problem_fraction']:.2f} > "
                f"{exp['max_problem_frame_fraction']}")
        # throughput: steady-state median of the total per-frame duration
        rows = list(csv.DictReader(open(csv_path)))
        steady = [float(r["duration_total_ms"]) for r in rows[10:]]
        if steady:
            fps = 1000.0 / max(float(np.median(steady)), 1e-9)
            tag = "" if (on_tpu or args.require_fps) else " [informational off-TPU]"
            print(f"steady fps {fps:.1f} (min {exp['min_fps_tpu']}){tag}")
            if (on_tpu or args.require_fps) and fps < exp["min_fps_tpu"]:
                failures.append(f"fps {fps:.1f} < {exp['min_fps_tpu']}")
    else:
        failures.append("no frame_data.csv")

    if failures:
        print("FAIL:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
