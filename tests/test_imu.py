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


class TestContinuousPreintegration:
    """LPM / UGPM-grade backends (≡ `integrator.cpp:184-215`,
    `integrator_ugpm.cpp:15-79`): continuous-time fit over an overlap
    window, resampled and preintegrated — property-tested against the
    manifold integrator on smooth trajectories."""

    def _smooth_traj(self, T=240, dt=0.005, seed=5):
        """Sinusoidal body rates/accel sampled at 200 Hz over 1.2 s."""
        ts = np.arange(T, dtype=np.float32) * dt
        gyro = np.stack([0.4 * np.sin(2 * np.pi * 0.8 * ts),
                         0.2 * np.cos(2 * np.pi * 0.5 * ts),
                         0.3 * np.sin(2 * np.pi * 0.3 * ts + 0.7)], -1)
        accel = np.stack([1.0 * np.sin(2 * np.pi * 0.6 * ts),
                          0.5 * np.cos(2 * np.pi * 0.9 * ts),
                          9.8 + 0.3 * np.sin(2 * np.pi * 0.4 * ts)], -1)
        return (jnp.asarray(ts), jnp.asarray(gyro.astype(np.float32)),
                jnp.asarray(accel.astype(np.float32)), dt)

    @pytest.mark.parametrize("method", ["lpm", "ugpm"])
    def test_matches_manifold_on_smooth_trajectory(self, method):
        from zenslam_tpu.imu import preintegrate_continuous

        ts, gyro, accel, dt = self._smooth_traj()
        T = ts.shape[0]
        mask = jnp.ones(T, bool)
        # integrate the central 0.4 s; the rest is overlap context
        t0, t1 = 0.4, 0.8
        sel = (np.asarray(ts) >= t0) & (np.asarray(ts) < t1)
        it_ref = preintegrate(gyro[sel], accel[sel],
                              jnp.full(int(sel.sum()), dt), 
                              jnp.ones(int(sel.sum()), bool))
        it = preintegrate_continuous(ts, gyro, accel, mask, t0, t1,
                                     n_grid=80, method=method)
        from zenslam_tpu.geometry import so3_log
        r_err = float(jnp.linalg.norm(so3_log(it.dR @ it_ref.dR.T)))
        assert r_err < 3e-3
        np.testing.assert_allclose(np.asarray(it.dv), np.asarray(it_ref.dv),
                                   atol=2e-2)
        np.testing.assert_allclose(np.asarray(it.dp), np.asarray(it_ref.dp),
                                   atol=1e-2)
        assert abs(float(it.dt) - (t1 - t0)) < 1e-5

    def test_ugpm_denoises_vs_lpm(self):
        """The point of the GP backend: on NOISY samples of a smooth signal
        its integral is closer to the clean ground truth than LPM's."""
        from zenslam_tpu.imu import preintegrate_continuous

        ts, gyro, accel, dt = self._smooth_traj()
        T = ts.shape[0]
        mask = jnp.ones(T, bool)
        t0, t1 = 0.4, 0.8
        clean = preintegrate_continuous(ts, gyro, accel, mask, t0, t1,
                                        n_grid=80, method="lpm")
        rng = np.random.default_rng(0)
        gn = gyro + jnp.asarray(rng.normal(0, 0.05, gyro.shape).astype(np.float32))
        an = accel + jnp.asarray(rng.normal(0, 0.3, accel.shape).astype(np.float32))
        lpm = preintegrate_continuous(ts, gn, an, mask, t0, t1,
                                      n_grid=80, method="lpm")
        ugpm = preintegrate_continuous(ts, gn, an, mask, t0, t1,
                                       n_grid=80, method="ugpm")
        err_lpm = float(jnp.linalg.norm(lpm.dv - clean.dv))
        err_ugpm = float(jnp.linalg.norm(ugpm.dv - clean.dv))
        assert err_ugpm < err_lpm

    def test_masked_padding_and_unsorted_input(self):
        from zenslam_tpu.imu import preintegrate_continuous

        ts, gyro, accel, dt = self._smooth_traj()
        T = ts.shape[0]
        # shuffle + pad with garbage
        rng = np.random.default_rng(2)
        perm = rng.permutation(T)
        ts_s, g_s, a_s = ts[perm], gyro[perm], accel[perm]
        pad = 40
        ts_p = jnp.concatenate([ts_s, jnp.full(pad, 777.0)])
        g_p = jnp.concatenate([g_s, jnp.full((pad, 3), 999.0)])
        a_p = jnp.concatenate([a_s, jnp.full((pad, 3), 999.0)])
        m_p = jnp.concatenate([jnp.ones(T, bool), jnp.zeros(pad, bool)])
        ref = preintegrate_continuous(ts, gyro, accel, jnp.ones(T, bool),
                                      0.4, 0.8, n_grid=64, method="lpm")
        got = preintegrate_continuous(ts_p, g_p, a_p, m_p, 0.4, 0.8,
                                      n_grid=64, method="lpm")
        np.testing.assert_allclose(np.asarray(got.dv), np.asarray(ref.dv),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(got.dp), np.asarray(ref.dp),
                                   atol=1e-5)

    def test_overlap_window_mask(self):
        from zenslam_tpu.imu import overlap_window_mask

        ts = jnp.asarray(np.linspace(-10.0, 10.0, 201, dtype=np.float32))
        m = overlap_window_mask(ts, jnp.ones(201, bool), 0.0, 0.5,
                                overlap_factor=8.0)
        ts_np = np.asarray(ts)
        keep = np.asarray(m)
        assert keep[(ts_np >= -4.0) & (ts_np <= 4.5)].all()
        assert not keep[ts_np < -4.01].any()
        assert not keep[ts_np > 4.51].any()
