"""Human-readable log formatters for poses and vectors.

Parity target: the reference's fmt/spdlog formatters (`utils/formatters.h:10-61`),
which render a `cv::Affine3d` as translation + intrinsic Euler angles in
degrees and a `Vec3d` as a fixed-precision triple. Host-side only (numpy) —
these format *results*, never traced values.
"""

from __future__ import annotations

import math

import numpy as np


def euler_zyx_deg(R) -> tuple[float, float, float]:
    """Intrinsic Z-Y-X (yaw, pitch, roll) Euler angles of a rotation matrix,
    in degrees (≡ the Euler-angle rendering of `formatters.h:10-26`)."""
    R = np.asarray(R, dtype=np.float64)
    pitch = math.asin(max(-1.0, min(1.0, -R[2, 0])))
    if abs(R[2, 0]) < 1.0 - 1e-9:
        yaw = math.atan2(R[1, 0], R[0, 0])
        roll = math.atan2(R[2, 1], R[2, 2])
    else:  # gimbal lock: put everything in yaw
        yaw = math.atan2(-R[0, 1], R[1, 1])
        roll = 0.0
    d = 180.0 / math.pi
    return yaw * d, pitch * d, roll * d


def format_vec3(v, precision: int = 3) -> str:
    """`[x, y, z]` with fixed precision ≡ the Vec3d formatter
    (`formatters.h:28-43`)."""
    v = np.asarray(v, dtype=np.float64).reshape(3)
    return "[" + ", ".join(f"{x:.{precision}f}" for x in v) + "]"


def format_pose(R, t, precision: int = 3) -> str:
    """Pose as translation (m) + ZYX Euler (deg)
    ≡ the Affine3d formatter (`formatters.h:10-26`)."""
    yaw, pitch, roll = euler_zyx_deg(R)
    return (f"t={format_vec3(t, precision)} m "
            f"ypr=[{yaw:.1f}, {pitch:.1f}, {roll:.1f}]°")
