"""Camera models and stereo rig geometry (pure JAX).

Parity targets (SURVEY.md citations into the reference):
- K/P/F derivation            ≡ `zenslam_core/source/calibration/camera_calibration.cpp:135-162`
- F = K2^-T [t]x R K1^-1      ≡ `camera_calibration.cpp:135-148`
- radtan / equidistant models ≡ Kalibr conventions parsed in `camera_calibration.cpp:14-106`

Cameras are pytrees of arrays so they flow through jit/vmap/scan.
Convention: ``T_cam_world = (R, t)`` maps world points into the camera frame.
A pose ``T_world_cam`` (the robot pose) is its inverse.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from zenslam_tpu.geometry.lie import so3_hat, se3_apply, se3_inverse, se3_compose


class PinholeCamera(NamedTuple):
    """Intrinsics. ``dist`` is 4 coefficients; meaning depends on ``model``
    (0 = radtan [k1 k2 p1 p2], 1 = equidistant [k1 k2 k3 k4]) — kept as data,
    the distortion functions are explicit so everything stays jittable."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (4,)
    # NB: NamedTuple fields are pytree LEAVES — under jit these become
    # tracers like everything else. Never branch on them in Python inside a
    # jitted function; compare in array-land (jnp.where) instead.
    width: int = 0
    height: int = 0

    @property
    def K(self):
        one = jnp.ones_like(self.fx)
        zero = jnp.zeros_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, zero, self.cx], axis=-1),
                jnp.stack([zero, self.fy, self.cy], axis=-1),
                jnp.stack([zero, zero, one], axis=-1),
            ],
            axis=-2,
        )


class StereoRig(NamedTuple):
    """Stereo pair: left/right intrinsics + extrinsics.

    ``R_rl, t_rl`` map left-camera coordinates into the right camera
    (Kalibr's ``T_cn_cnm1``). ``R_ci, t_ci`` maps IMU frame into left cam
    (Kalibr ``T_cam_imu``). ``baseline`` is |t_rl| for the rectified fast path.
    """

    left: PinholeCamera
    right: PinholeCamera
    R_rl: jnp.ndarray  # (3,3)
    t_rl: jnp.ndarray  # (3,)
    R_ci: jnp.ndarray
    t_ci: jnp.ndarray

    @property
    def baseline(self):
        return jnp.linalg.norm(self.t_rl)


def project(cam: PinholeCamera, x_cam):
    """Camera-frame 3D points (..., 3) -> pixel coords (..., 2) (no distortion).

    Reference analogue: P*X projection inside `triangulator.cpp:74-129` gates.
    """
    z = x_cam[..., 2]
    z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * x_cam[..., 0] / z_safe + cam.cx
    v = cam.fy * x_cam[..., 1] / z_safe + cam.cy
    return jnp.stack([u, v], axis=-1)


def project_se3(cam: PinholeCamera, R, t, x_world):
    """Project world points through T_cam_world = (R, t)."""
    return project(cam, se3_apply(R, t, x_world))


def backproject(cam: PinholeCamera, uv, depth):
    """Pixels (..., 2) + depth (...,) -> camera-frame 3D points."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x * depth, y * depth, depth], axis=-1)


def distort_radtan(dist, xy):
    """Normalized coords -> distorted normalized coords, radial-tangential (k1 k2 p1 p2)."""
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points_radtan(dist, xy_dist, iters: int = 8):
    """Inverse of distort_radtan via fixed-point iteration (jittable, fixed iters)."""
    xy = xy_dist
    for _ in range(iters):
        delta = distort_radtan(dist, xy) - xy
        xy = xy_dist - delta
    return xy


def distort_equidistant(dist, xy):
    """Kannala-Brandt / Kalibr 'equidistant' fisheye (k1..k4)."""
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy[..., 0], xy[..., 1]
    r = jnp.sqrt(x * x + y * y + 1e-18)
    theta = jnp.arctan(r)
    t2 = theta * theta
    theta_d = theta * (1.0 + k1 * t2 + k2 * t2 * t2 + k3 * t2 ** 3 + k4 * t2 ** 4)
    scale = theta_d / r
    return jnp.stack([x * scale, y * scale], axis=-1)


def undistort_points_equidistant(dist, xy_dist, iters: int = 10):
    k1, k2, k3, k4 = dist[0], dist[1], dist[2], dist[3]
    x, y = xy_dist[..., 0], xy_dist[..., 1]
    theta_d = jnp.sqrt(x * x + y * y + 1e-18)
    theta = theta_d
    for _ in range(iters):
        t2 = theta * theta
        f = theta * (1.0 + k1 * t2 + k2 * t2 * t2 + k3 * t2 ** 3 + k4 * t2 ** 4) - theta_d
        df = 1.0 + 3 * k1 * t2 + 5 * k2 * t2 * t2 + 7 * k3 * t2 ** 3 + 9 * k4 * t2 ** 4
        theta = theta - f / df
    scale = jnp.tan(theta) / theta_d
    return jnp.stack([x * scale, y * scale], axis=-1)


def essential_from_pose(R, t):
    """E = [t]x R for T_b_a = (R, t) mapping frame a -> frame b."""
    return so3_hat(t) @ R


def fundamental_from_rig(rig: StereoRig):
    """F = K_r^-T [t]x R K_l^-1  (`camera_calibration.cpp:135-148`)."""
    E = essential_from_pose(rig.R_rl, rig.t_rl)
    Kl_inv = jnp.linalg.inv(rig.left.K)
    Kr_inv_T = jnp.linalg.inv(rig.right.K).T
    F = Kr_inv_T @ E @ Kl_inv
    return F / (F[2, 2] + jnp.where(jnp.abs(F[2, 2]) < 1e-12, 1e-12, 0.0))


def camera_pose_to_world(R_cw, t_cw):
    """Invert T_cam_world to get the camera pose in the world."""
    return se3_inverse(R_cw, t_cw)


def right_from_left_extrinsics(rig: StereoRig, R_lw, t_lw):
    """T_right_world = T_rl ∘ T_left_world (pose transfer used by the reference's
    cam1 PnP fallback, `utils/estimator.cpp:272-276`)."""
    return se3_compose(rig.R_rl, rig.t_rl, R_lw, t_lw)
