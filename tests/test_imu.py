"""IMU subsystem tests: preintegration round trips against analytic motions,
prediction, gravity estimation (SURVEY.md §7 phase 6 gate)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.geometry import so3_exp, rotation_angle, se3_inverse
from zenslam_tpu.imu import (
    preintegrate,
    ImuNoise,
    inertial_predict_pose,
    propagate_velocity,
    gravity_init,
    gravity_add_sample,
    gravity_estimate,
)

G = np.array([0.0, 0.0, -9.81], np.float32)


def make_samples(T, w_body, a_body, dt=0.005):
    gyro = np.tile(np.asarray(w_body, np.float32), (T, 1))
    accel = np.tile(np.asarray(a_body, np.float32), (T, 1))
    dts = np.full(T, dt, np.float32)
    mask = np.ones(T, bool)
    return jnp.asarray(gyro), jnp.asarray(accel), jnp.asarray(dts), jnp.asarray(mask)


class TestPreintegration:
    def test_static_zero(self):
        g, a, d, m = make_samples(100, [0, 0, 0], [0, 0, 0])
        it = preintegrate(g, a, d, m)
        np.testing.assert_allclose(np.asarray(it.dR), np.eye(3), atol=1e-6)
        np.testing.assert_allclose(np.asarray(it.dv), 0.0, atol=1e-6)
        assert abs(float(it.dt) - 0.5) < 1e-5

    def test_constant_rotation(self):
        w = [0.0, 0.0, 1.0]  # 1 rad/s yaw
        g, a, d, m = make_samples(200, w, [0, 0, 0])
        it = preintegrate(g, a, d, m)
        from zenslam_tpu.geometry import so3_log
        # so3_log (vee-based), not rotation_angle: arccos of a trace has an
        # f32 noise floor around 1e-3 rad for near-identity rotations
        err = so3_log(it.dR @ so3_exp(jnp.asarray([0.0, 0.0, 1.0])).T)
        assert float(jnp.linalg.norm(err)) < 1e-4

    def test_constant_acceleration(self):
        a = [1.0, 0.0, 0.0]
        g, acc, d, m = make_samples(200, [0, 0, 0], a)
        it = preintegrate(g, acc, d, m)
        # v = a t; p = a t²/2 with t = 1s
        np.testing.assert_allclose(np.asarray(it.dv), [1.0, 0, 0], atol=1e-3)
        np.testing.assert_allclose(np.asarray(it.dp), [0.5, 0, 0], atol=1e-3)

    def test_mask_excludes_padding(self):
        g, a, d, m = make_samples(100, [0, 0, 1.0], [1, 0, 0])
        # second half is padding with garbage values
        g = g.at[50:].set(999.0)
        a = a.at[50:].set(999.0)
        m = m.at[50:].set(False)
        it = preintegrate(g, a, d, m)
        it_ref = preintegrate(*make_samples(50, [0, 0, 1.0], [1, 0, 0]))
        np.testing.assert_allclose(np.asarray(it.dR), np.asarray(it_ref.dR), atol=1e-6)
        np.testing.assert_allclose(np.asarray(it.dv), np.asarray(it_ref.dv), atol=1e-6)
        assert abs(float(it.dt) - 0.25) < 1e-5

    def test_bias_correction(self):
        bias = jnp.asarray([0.05, -0.02, 0.01])
        g, a, d, m = make_samples(100, [0, 0, 0], [0, 0, 0])
        it = preintegrate(g + bias, a, d, m, bias_gyro=bias)
        np.testing.assert_allclose(np.asarray(it.dR), np.eye(3), atol=1e-5)

    def test_covariance_grows(self):
        g, a, d, m = make_samples(200, [0.1, 0.2, 0.3], [1, 2, 9.8])
        it_short = preintegrate(g[:50], a[:50], d[:50], m[:50])
        it_long = preintegrate(g, a, d, m)
        tr_s = float(jnp.trace(it_short.cov))
        tr_l = float(jnp.trace(it_long.cov))
        assert 0 < tr_s < tr_l

    def test_gyro_rotation_then_accel(self):
        """Rotate 90° about z while accelerating along body-x: the velocity
        should curve — checks the dR coupling inside the scan."""
        T = 1000
        dt = np.pi / 2 / T  # total time pi/2 s at 1 rad/s
        gyro = np.tile([0, 0, 1.0], (T, 1)).astype(np.float32)
        accel = np.tile([1.0, 0, 0], (T, 1)).astype(np.float32)
        it = preintegrate(jnp.asarray(gyro), jnp.asarray(accel),
                          jnp.full(T, dt, jnp.float32), jnp.ones(T, bool))
        # analytic: v = ∫ R(t) a dt = [sin T, 1-cos T, 0] for a=x, w=z 1rad/s
        Ttot = T * dt
        expected_v = np.array([np.sin(Ttot), 1 - np.cos(Ttot), 0.0])
        np.testing.assert_allclose(np.asarray(it.dv), expected_v, atol=2e-3)


class TestPredictors:
    def test_static_body_stays(self):
        from zenslam_tpu.imu.preintegration import identity_integral
        it = identity_integral()._replace(dt=jnp.float32(0.1))
        R_cw = jnp.eye(3); t_cw = jnp.zeros(3)
        R2, t2 = inertial_predict_pose(R_cw, t_cw, jnp.zeros(3), jnp.asarray(G), it,
                                       jnp.eye(3), jnp.zeros(3))
        # gravity pulls the body down by g t²/2 -> camera t changes accordingly
        R_w, p_w = se3_inverse(R2, t2)
        np.testing.assert_allclose(np.asarray(p_w), 0.5 * G * 0.01, atol=1e-5)

    def test_constant_velocity_advances(self):
        from zenslam_tpu.imu.preintegration import identity_integral
        it = identity_integral()._replace(dt=jnp.float32(0.5))
        v = jnp.asarray([1.0, 0, 0])
        R2, t2 = inertial_predict_pose(jnp.eye(3), jnp.zeros(3), v,
                                       jnp.zeros(3), it, jnp.eye(3), jnp.zeros(3))
        R_w, p_w = se3_inverse(R2, t2)
        np.testing.assert_allclose(np.asarray(p_w), [0.5, 0, 0], atol=1e-5)

    def test_velocity_propagation(self):
        from zenslam_tpu.imu.preintegration import identity_integral
        it = identity_integral()._replace(dt=jnp.float32(1.0), dv=jnp.asarray([0.2, 0, 0]))
        v2 = propagate_velocity(jnp.zeros(3), jnp.asarray(G), jnp.eye(3), it)
        np.testing.assert_allclose(np.asarray(v2), [0.2, 0, -9.81], atol=1e-5)


class TestGravity:
    def test_recovers_gravity_static(self):
        """Static body: VO accel = 0; accelerometer reads -g in body frame."""
        est = gravity_init()
        R_wb = jnp.eye(3)
        f_body = jnp.asarray(-G)  # specific force = a - g = +9.81 z
        p = jnp.zeros(3)
        for _ in range(12):
            est = gravity_add_sample(est, p, p, p, 0.05, 0.05, R_wb, f_body)
        g, ok = gravity_estimate(est)
        assert bool(ok)
        np.testing.assert_allclose(np.asarray(g), G, atol=1e-3)

    def test_magnitude_gate_rejects(self):
        est = gravity_init()
        for _ in range(12):
            est = gravity_add_sample(est, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
                                     0.05, 0.05, jnp.eye(3), jnp.asarray([0.0, 0, 1.0]))
        g, ok = gravity_estimate(est)
        assert not bool(ok)  # |g sample| ~ 1 -> gated out, no estimate

    def test_needs_min_samples(self):
        est = gravity_init()
        f_body = jnp.asarray(-G)
        for _ in range(5):
            est = gravity_add_sample(est, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
                                     0.05, 0.05, jnp.eye(3), f_body)
        _, ok = gravity_estimate(est)
        assert not bool(ok)
