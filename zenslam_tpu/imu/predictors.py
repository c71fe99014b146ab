"""Pose prediction from IMU preintegration.

Parity target: `motion/inertial_predictor.h:16-74`: rotate gravity and world
velocity into the IMU frame, Δpose = (v·dt + Δp + g·dt²/2), conjugate by
cam↔IMU extrinsics. (The constant-velocity visual predictor ≡
`motion_predictor.cpp` lives in pipeline/step.py::_predict_pose.)

Conventions: T_cw = (R_cw, t_cw) maps world→camera; T_ci maps IMU→camera
(Kalibr T_cam_imu); the IMU body pose is T_iw = T_ci^-1 ∘ T_cw.
"""

from __future__ import annotations

import jax.numpy as jnp

from zenslam_tpu.geometry.lie import se3_compose, se3_inverse
from zenslam_tpu.imu.preintegration import ImuIntegral


def inertial_predict_pose(R_cw, t_cw, v_world, gravity_world, integral: ImuIntegral,
                          R_ci, t_ci):
    """Predict the camera pose after the integral's interval.

    Args:
      R_cw, t_cw: current camera pose (world->cam).
      v_world: (3,) current body velocity in world frame.
      gravity_world: (3,) gravity in world frame (≈ [0, 0, -9.81] or estimated).
      integral: preintegrated IMU deltas over [t0, t1] in the body frame.
      R_ci, t_ci: IMU->camera extrinsics.
    Returns (R_cw', t_cw') predicted pose.
    """
    # body (IMU) pose: T_iw = T_ci^-1 ∘ T_cw
    Ric, tic = se3_inverse(R_ci, t_ci)
    R_iw, t_iw = se3_compose(Ric, tic, R_cw, t_cw)
    # world-frame body rotation/position
    R_wi, p_wi = se3_inverse(R_iw, t_iw)
    dt = integral.dt
    # kinematics on the manifold (Forster):
    R_wi_new = R_wi @ integral.dR
    p_new = p_wi + v_world * dt + 0.5 * gravity_world * dt * dt + R_wi @ integral.dp
    # back to world->body, then conjugate to camera
    R_iw_new, t_iw_new = se3_inverse(R_wi_new, p_new)
    return se3_compose(R_ci, t_ci, R_iw_new, t_iw_new)


def propagate_velocity(v_world, gravity_world, R_wi, integral: ImuIntegral):
    """v' = v + g dt + R_wi Δv (world frame)."""
    return v_world + gravity_world * integral.dt + R_wi @ integral.dv
