"""Per-frame CSV telemetry writer + analysis helpers.

Parity targets:
- `frame::writer` 50-column per-frame CSV (`frame/writer.cpp:16-110`)
- problem-frame analysis thresholds (`zenslam_py/scripts/
  analyze_frame_stats.py:30-114`): low-KLT / slow / low-triangulation /
  low-inlier flags
"""

from __future__ import annotations

import csv
from typing import Optional

import numpy as np

COLUMNS = [
    "frame", "timestamp",
    "n_tracked", "n_detected", "n_stereo", "n_triangulated",
    "n_pose_inliers", "pose_method", "pose_ok", "tracked_ratio",
    "is_keyframe", "map_size",
    "n_lines", "n_line_triangulated", "line_map_size",
    "tx", "ty", "tz", "r00", "r01", "r02", "r10", "r11", "r12",
    "r20", "r21", "r22",
    # per-phase durations (≡ the duration columns of `frame/writer.cpp:34-110`
    # / `time_this.h`). The in-step stages (pyramid/track/detect/…) are ONE
    # fused XLA program here by design, so the phases a frame can vary in are:
    # wait (frame fetch/decode, ≡ durations.wait), step (the fused device
    # program), backend (BA + loop closure on keyframes). Per-KERNEL device
    # timings live in ROOFLINE.md / profile_step.py (trace-based).
    "duration_wait_ms", "duration_step_ms", "duration_backend_ms",
    "duration_total_ms",
]


class TelemetryWriter:
    """Streaming CSV writer, one row per frame (≡ frame::writer::write)."""

    def __init__(self, path: str):
        self._f = open(path, "w", newline="")
        self._w = csv.writer(self._f)
        self._w.writerow(COLUMNS)
        self._n = 0

    def write(self, tel, timestamp: float = 0.0, duration_ms: float = 0.0,
              wait_ms: float = 0.0, step_ms: float = 0.0,
              backend_ms: float = 0.0):
        R = np.asarray(tel.R_cw).reshape(-1)
        t = np.asarray(tel.t_cw)
        row = [
            self._n, timestamp,
            int(tel.n_tracked), int(tel.n_detected), int(tel.n_stereo),
            int(tel.n_triangulated), int(tel.n_pose_inliers),
            int(tel.pose_method), bool(tel.pose_ok), float(tel.tracked_ratio),
            bool(tel.is_keyframe), int(tel.map_size),
            int(getattr(tel, "n_lines", 0)),
            int(getattr(tel, "n_line_triangulated", 0)),
            int(getattr(tel, "line_map_size", 0)),
            *[float(x) for x in t], *[float(x) for x in R],
            wait_ms, step_ms, backend_ms,
            duration_ms,
        ]
        self._w.writerow(row)
        self._n += 1

    def close(self):
        self._f.close()


def analyze_frame_stats(csv_path: str, klt_ratio_threshold: float = 0.5,
                        slow_ms: float = 100.0, min_triangulated: int = 10,
                        min_inliers: int = 15) -> dict:
    """Problem-frame detection ≡ analyze_frame_stats.py: flags frames with
    low KLT success, slow processing, few triangulations, or few inliers."""
    rows = list(csv.DictReader(open(csv_path)))
    problems = {"low_klt": [], "slow": [], "low_tri": [], "low_inlier": []}
    for r in rows:
        i = int(r["frame"])
        if float(r["tracked_ratio"]) < klt_ratio_threshold:
            problems["low_klt"].append(i)
        if float(r["duration_total_ms"]) > slow_ms:
            problems["slow"].append(i)
        if int(r["n_triangulated"]) < min_triangulated:
            problems["low_tri"].append(i)
        if int(r["n_pose_inliers"]) < min_inliers:
            problems["low_inlier"].append(i)
    n = max(len(rows), 1)
    problem_frames = set().union(*problems.values())
    return {
        "n_frames": len(rows),
        "problems": problems,
        "problem_fraction": len(problem_frames) / n,
        "mean_tracked": float(np.mean([int(r["n_tracked"]) for r in rows])) if rows else 0.0,
        "mean_triangulated": float(np.mean([int(r["n_triangulated"]) for r in rows])) if rows else 0.0,
    }
