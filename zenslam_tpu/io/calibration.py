"""Kalibr camchain YAML parsing + stereo rectification precompute.

Parity targets:
- `camera_calibration::parse` (`calibration/camera_calibration.cpp:14-106`):
  resolution / intrinsics / distortion_coeffs / T_cn_cnm1 / T_cam_imu
- derived K, F = K2^-T [t]x R K1^-1, P = K[R|t] (`:135-162`)
- stereo rectification + undistort-map precompute (`calibration.cpp:33-240`)
  for both 'radtan' (full) and 'equidistant' (fisheye) models
- IMU noise parameters (`imu_calibration.h:21-67`, `imu_config.yaml`)

The rectification maps are computed ONCE on host (numpy) and applied per
frame on device with ops.image.remap — same split as the reference
(precompute in calibration, cv::remap in the processor).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax.numpy as jnp

from zenslam_tpu.geometry.camera import PinholeCamera, StereoRig
from zenslam_tpu.imu.preintegration import ImuNoise


class RectifyMaps(NamedTuple):
    left_x: np.ndarray   # (H, W) float32 — source x for each rectified pixel
    left_y: np.ndarray
    right_x: np.ndarray
    right_y: np.ndarray
    rig_rectified: StereoRig  # the rig the rectified images obey


def parse_kalibr_camchain(d: dict) -> StereoRig:
    """Parse a loaded Kalibr camchain dict (cam0/cam1 entries).

    Accepts the TUM-VI/EuRoC convention: cam1 carries T_cn_cnm1 (left->right)
    and each camera may carry T_cam_imu.
    """
    def cam_of(e):
        fx, fy, cx, cy = e["intrinsics"]
        dist = list(e.get("distortion_coeffs", [0, 0, 0, 0]))
        dist = (dist + [0.0] * 4)[:4]
        w, h = e["resolution"]
        return PinholeCamera(
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            dist=jnp.asarray(dist, jnp.float32), width=int(w), height=int(h),
        ), e.get("distortion_model", "radtan")

    cam0, model0 = cam_of(d["cam0"])
    cam1, model1 = cam_of(d["cam1"])
    T_rl = np.asarray(d["cam1"].get("T_cn_cnm1", np.eye(4)), np.float64)
    T_ci = np.asarray(d["cam0"].get("T_cam_imu", np.eye(4)), np.float64)
    rig = StereoRig(
        left=cam0, right=cam1,
        R_rl=jnp.asarray(T_rl[:3, :3], jnp.float32),
        t_rl=jnp.asarray(T_rl[:3, 3], jnp.float32),
        R_ci=jnp.asarray(T_ci[:3, :3], jnp.float32),
        t_ci=jnp.asarray(T_ci[:3, 3], jnp.float32),
    )
    return rig, (model0, model1)


def load_kalibr_yaml(path: str):
    import yaml

    with open(path) as f:
        d = yaml.safe_load(f)
    return parse_kalibr_camchain(d)


def parse_imu_config(d: dict) -> ImuNoise:
    """≡ `imu_calibration.h` fields from Kalibr imu_config.yaml."""
    return ImuNoise(
        gyro_noise=float(d.get("gyroscope_noise_density", 1.6e-4)),
        accel_noise=float(d.get("accelerometer_noise_density", 2.8e-3)),
        gyro_bias_walk=float(d.get("gyroscope_random_walk", 1.9e-5)),
        accel_bias_walk=float(d.get("accelerometer_random_walk", 8.6e-4)),
    )


def _undistort_normalized(model: str, dist: np.ndarray, xy: np.ndarray) -> np.ndarray:
    """Host-side distortion application (for map building)."""
    from zenslam_tpu.geometry.camera import distort_radtan, distort_equidistant

    x = jnp.asarray(xy, jnp.float32)
    if model in ("equidistant", "fisheye"):
        return np.asarray(distort_equidistant(jnp.asarray(dist), x))
    return np.asarray(distort_radtan(jnp.asarray(dist), x))


def compute_rectify_maps(rig: StereoRig, models=("radtan", "radtan")) -> RectifyMaps:
    """Fusiello-style stereo rectification: build rotations that align both
    cameras' x-axes with the baseline, a shared K_new, and inverse maps.

    ≡ cv::stereoRectify + initUndistortRectifyMap precompute
    (`calibration.cpp:33-143`), including post-rectification K/P/F re-derive —
    the returned ``rig_rectified`` carries the new intrinsics/extrinsics
    (pure horizontal baseline) that downstream triangulation uses.
    """
    K0 = np.asarray(rig.left.K, np.float64)
    K1 = np.asarray(rig.right.K, np.float64)
    R_rl = np.asarray(rig.R_rl, np.float64)
    t_rl = np.asarray(rig.t_rl, np.float64)
    H, W = rig.left.height, rig.left.width

    # camera 1 center in camera-0 frame: c1 = -R_rl^T t_rl
    c1 = -R_rl.T @ t_rl
    baseline = np.linalg.norm(c1)
    # new x-axis along the baseline; y orthogonal to x and old z; z = x×y
    ex = c1 / baseline
    ez0 = np.array([0.0, 0.0, 1.0])
    ey = np.cross(ez0, ex)
    ey /= np.linalg.norm(ey)
    ez = np.cross(ex, ey)
    R_rect0 = np.stack([ex, ey, ez])         # world(cam0) -> rectified
    R_rect1 = R_rect0 @ R_rl.T               # cam1 -> rectified

    f_new = float((K0[0, 0] + K0[1, 1] + K1[0, 0] + K1[1, 1]) / 4.0)
    cx_new, cy_new = W / 2.0, H / 2.0
    K_new = np.array([[f_new, 0, cx_new], [0, f_new, cy_new], [0, 0, 1.0]])

    def build_map(K_src, dist, model, R_rect):
        # rectified pixel -> normalized rectified ray -> source camera ray ->
        # distorted normalized -> source pixel
        u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
        rays = np.stack([(u - cx_new) / f_new, (v - cy_new) / f_new, np.ones_like(u)], -1)
        rays_src = rays @ R_rect  # R_rect^T applied: (H,W,3) @ (3,3)
        xyn = rays_src[..., :2] / np.maximum(rays_src[..., 2:3], 1e-9)
        xyd = _undistort_normalized(model, np.asarray(dist), xyn.reshape(-1, 2)).reshape(H, W, 2)
        mx = K_src[0, 0] * xyd[..., 0] + K_src[0, 2]
        my = K_src[1, 1] * xyd[..., 1] + K_src[1, 2]
        return mx.astype(np.float32), my.astype(np.float32)

    lx, ly = build_map(K0, rig.left.dist, models[0], R_rect0)
    rx, ry = build_map(K1, rig.right.dist, models[1], R_rect1)

    cam_new = PinholeCamera(
        fx=jnp.float32(f_new), fy=jnp.float32(f_new),
        cx=jnp.float32(cx_new), cy=jnp.float32(cy_new),
        dist=jnp.zeros(4, jnp.float32), width=W, height=H,
    )
    rig_rect = StereoRig(
        left=cam_new, right=cam_new,
        R_rl=jnp.eye(3, dtype=jnp.float32),
        t_rl=jnp.asarray([-baseline, 0.0, 0.0], jnp.float32),
        R_ci=rig.R_ci, t_ci=rig.t_ci,
    )
    return RectifyMaps(left_x=lx, left_y=ly, right_x=rx, right_y=ry,
                       rig_rectified=rig_rect)
