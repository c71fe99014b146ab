"""Visual-inertial pipeline tests (SURVEY.md §2.1 integrator /
inertial_predictor / gravity_estimator rows wired into the live loop —
≡ `slam_thread.cpp:118-132` preintegration+predict and `:221-235`
gravity/motion update, which the reference runs every frame)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.imu.preintegration import preintegrate
from zenslam_tpu.imu.predictors import inertial_predict_pose
from zenslam_tpu.pipeline import SlamConfig, run_sequence
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


@pytest.fixture(scope="module")
def vio_seq():
    return make_sequence(np.random.default_rng(11), n_frames=16,
                         motion="arc", with_imu=True)


class TestSyntheticImu:
    def test_preintegration_predicts_next_pose(self, vio_seq):
        """Preintegrate each frame interval and predict pose k from GT pose
        k-1 + GT velocity — the IMU stream must be dynamically consistent
        with the rendered trajectory."""
        seq = vio_seq
        g_w = jnp.asarray(seq.gravity_w)
        dt = float(seq.timestamps[1] - seq.timestamps[0])
        P = np.einsum("tij,tj->ti", np.transpose(seq.R_lw, (0, 2, 1)), -seq.t_lw)
        for k in range(2, len(seq.timestamps)):
            integ = preintegrate(
                jnp.asarray(seq.gyro[k]), jnp.asarray(seq.accel[k]),
                jnp.asarray(seq.imu_dts[k]), jnp.asarray(seq.imu_mask[k]))
            v = jnp.asarray((P[k - 1] - P[k - 2]) / dt)
            Rp, tp = inertial_predict_pose(
                jnp.asarray(seq.R_lw[k - 1]), jnp.asarray(seq.t_lw[k - 1]),
                v, g_w, integ, seq.rig.R_ci, seq.rig.t_ci)
            assert np.linalg.norm(np.asarray(Rp) - seq.R_lw[k]) < 1e-3
            assert np.linalg.norm(np.asarray(tp) - seq.t_lw[k]) < 5e-3

    def test_stationary_interval_measures_minus_gravity(self):
        seq = make_sequence(np.random.default_rng(3), n_frames=4,
                            motion="strafe", speed=0.0, with_imu=True)
        f = seq.accel[1][seq.imu_mask[1]]
        np.testing.assert_allclose(
            f.mean(axis=0), -np.asarray(seq.gravity_w), atol=1e-3)
        assert np.abs(seq.gyro[1][seq.imu_mask[1]]).max() < 1e-6


class TestVioPipeline:
    @pytest.fixture(scope="class")
    def run(self, vio_seq):
        seq = vio_seq
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128)
        imu = (seq.gyro, seq.accel, seq.imu_dts, seq.imu_mask)
        return run_sequence(cfg, seq.rig, seq.left, seq.right, imu=imu)

    def test_tracks_and_ate(self, run, vio_seq):
        state, tel = run
        assert tel.pose_ok[1:].all()
        est = camera_positions(tel.R_cw, tel.t_cw)
        gt = camera_positions(vio_seq.R_lw, vio_seq.t_lw)
        assert ate_rmse(est, gt) < 0.02

    def test_gravity_converges(self, run, vio_seq):
        """≡ `gravity_estimator.cpp:86-134`: component-median over accepted
        VO-vs-IMU samples converges to true gravity."""
        state, _ = run
        assert bool(state.vio.gravity_ok)
        g = np.asarray(state.vio.gravity_w)
        assert np.linalg.norm(g - np.asarray(vio_seq.gravity_w)) < 0.5

    def test_velocity_estimate(self, run, vio_seq):
        """Body velocity ≈ GT trajectory velocity at the last frame."""
        state, _ = run
        seq = vio_seq
        dt = float(seq.timestamps[1] - seq.timestamps[0])
        P = np.einsum("tij,tj->ti", np.transpose(seq.R_lw, (0, 2, 1)), -seq.t_lw)
        v_gt = (P[-1] - P[-2]) / dt
        assert np.linalg.norm(np.asarray(state.vio.v_world) - v_gt) < 0.1

    def test_scan_mode_matches_stream(self, vio_seq):
        seq = vio_seq
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128)
        imu = (seq.gyro, seq.accel, seq.imu_dts, seq.imu_mask)
        st_a, tel_a = run_sequence(cfg, seq.rig, seq.left, seq.right,
                                   imu=imu, mode="scan")
        assert tel_a.pose_ok[1:].all()
        gt = camera_positions(seq.R_lw, seq.t_lw)
        est = camera_positions(tel_a.R_cw, tel_a.t_cw)
        assert ate_rmse(est, gt) < 0.02


class TestImuBackendSelection:
    """`imu_method` config field dispatches the integrator backend
    (≡ the reference façade's method switch, `integrator.cpp:158-216`)."""

    @pytest.mark.parametrize("method", ["lpm", "ugpm"])
    def test_continuous_backends_track(self, vio_seq, method):
        seq = vio_seq
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128, imu_method=method)
        imu = (seq.gyro[:8], seq.accel[:8], seq.imu_dts[:8], seq.imu_mask[:8])
        states, telem = run_sequence(cfg, seq.rig, seq.left[:8], seq.right[:8],
                                     imu=imu)
        est = np.stack([np.asarray(-telem.R_cw[t].T @ telem.t_cw[t])
                        for t in range(8)])
        gt = camera_positions(seq.R_lw[:8], seq.t_lw[:8])
        assert ate_rmse(est, gt) < 0.05
        assert bool(np.asarray(telem.pose_ok)[2:].all())
