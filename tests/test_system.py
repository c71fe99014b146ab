"""Full-system tests: front-end + windowed BA + loop machinery on a rendered
sequence — BASELINE.json config[2] (full keyframe SLAM loop) coverage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline.state import SlamConfig
from zenslam_tpu.pipeline.system import BackendConfig, create_system, run_system
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


CFG = SlamConfig(max_keypoints=256, max_landmarks=2048, pnp_iters=128,
                 rigid_iters=128, kf_min_frames=2, kf_min_translation=0.04)


@pytest.fixture(scope="module")
def seq():
    return make_sequence(np.random.default_rng(11), n_frames=14, motion="strafe", speed=0.6)


class TestFullSystem:
    def test_ba_improves_or_holds_ate(self, seq):
        gt = camera_positions(seq.R_lw, seq.t_lw)
        # front-end only
        sys_fe = create_system(CFG, BackendConfig(ba_every_kf=False, enable_loop_closure=False),
                               seq.rig, seq.left[0].shape)
        tel_fe, _ = run_system(sys_fe, seq.left, seq.right)
        ate_fe = ate_rmse(camera_positions(tel_fe.R_cw, tel_fe.t_cw), gt)
        # with windowed BA
        sys_ba = create_system(CFG, BackendConfig(ba_every_kf=True, enable_loop_closure=False),
                               seq.rig, seq.left[0].shape)
        tel_ba, infos = run_system(sys_ba, seq.left, seq.right)
        ate_ba = ate_rmse(camera_positions(tel_ba.R_cw, tel_ba.t_cw), gt)
        assert sys_ba.n_ba_runs >= 1
        # BA must not blow up the trajectory; typically improves it
        assert ate_ba < max(ate_fe * 1.5, 0.02)
        # BA rmse drops within each run; the packed vector's third entry
        # counts observations dropped by landmark compaction (should be 0
        # on this small scene)
        ba_runs = [np.asarray(i["ba"]) for i in infos if i["ba"] is not None]
        assert all(r[1] <= r[0] * 1.05 for r in ba_runs)
        assert all(r[2] == 0 for r in ba_runs)

    def test_keyframes_inserted(self, seq):
        sys = create_system(CFG, BackendConfig(ba_every_kf=False, enable_loop_closure=False),
                            seq.rig, seq.left[0].shape)
        tel, _ = run_system(sys, seq.left, seq.right)
        assert int(tel.is_keyframe.sum()) >= 2
        assert bool(sys.kf_db.valid.sum() == tel.is_keyframe.sum())
        # odometry edges between consecutive keyframes
        assert len(sys.edge_i) == int(tel.is_keyframe.sum()) - 1

    def test_loop_closure_machinery_runs(self, seq):
        """Vocabulary trains, BoW DB fills; (a strafe sequence has no true
        loops — the machinery must run without firing false positives that
        break the trajectory)."""
        sys = create_system(CFG, BackendConfig(ba_every_kf=False, enable_loop_closure=True,
                                               bow_min_score=0.95),
                            seq.rig, seq.left[0].shape)
        tel, infos = run_system(sys, seq.left, seq.right)
        assert sys.vocab is not None
        assert int(sys.bow_db.valid.sum()) == int(tel.is_keyframe.sum())
        gt = camera_positions(seq.R_lw, seq.t_lw)
        assert ate_rmse(camera_positions(tel.R_cw, tel.t_cw), gt) < 0.05


class TestSystemVio:
    """VIO wired through the FULL system (process_frame imu=), not just the
    bare run_sequence path — ≡ `slam_thread.cpp:118-132, 221-235` where the
    reference's live loop always runs the IMU machinery."""

    @pytest.fixture(scope="class")
    def vio_seq(self):
        return make_sequence(np.random.default_rng(11), n_frames=16,
                             motion="arc", with_imu=True)

    def test_imu_on_tracks_and_estimates_gravity(self, vio_seq):
        seq = vio_seq
        gt = camera_positions(seq.R_lw, seq.t_lw)
        bcfg = BackendConfig(ba_every_kf=False, enable_loop_closure=False)
        sys_v = create_system(CFG, bcfg, seq.rig, seq.left[0].shape)
        imu = (seq.gyro, seq.accel, seq.imu_dts, seq.imu_mask)
        tel_v, _ = run_system(sys_v, seq.left, seq.right, imu=imu)
        assert tel_v.pose_ok[1:].all()
        ate_v = ate_rmse(camera_positions(tel_v.R_cw, tel_v.t_cw), gt)
        assert ate_v < 0.02
        # the VIO state actually engaged: gravity observed through the system path
        assert bool(sys_v.state.vio.gravity_ok)
        g = np.asarray(sys_v.state.vio.gravity_w)
        assert np.linalg.norm(g - np.asarray(seq.gravity_w)) < 0.5

    def test_imu_not_worse_than_vision_only(self, vio_seq):
        """IMU-on must match or beat vision-only ATE on the arc+gravity
        sequence (the inertial prediction replaces constant-velocity)."""
        seq = vio_seq
        gt = camera_positions(seq.R_lw, seq.t_lw)
        bcfg = BackendConfig(ba_every_kf=False, enable_loop_closure=False)
        sys_o = create_system(CFG, bcfg, seq.rig, seq.left[0].shape)
        tel_o, _ = run_system(sys_o, seq.left, seq.right)
        ate_o = ate_rmse(camera_positions(tel_o.R_cw, tel_o.t_cw), gt)
        sys_v = create_system(CFG, bcfg, seq.rig, seq.left[0].shape)
        imu = (seq.gyro, seq.accel, seq.imu_dts, seq.imu_mask)
        tel_v, _ = run_system(sys_v, seq.left, seq.right, imu=imu)
        ate_v = ate_rmse(camera_positions(tel_v.R_cw, tel_v.t_cw), gt)
        assert ate_v <= ate_o * 1.2 + 1e-4


class TestPipelinedTelemetry:
    """telemetry_lag > 0 (r3 verdict task 2): the packed telemetry is
    consumed L frames late (async D2H copy) so the per-frame host read costs
    ~0 on the TPU tunnel. Telemetry CONTENT must be identical to the
    synchronous mode, and the keyframe back-end must still run — from the
    keyframe's retained device state."""

    @pytest.fixture(scope="class")
    def pseq(self):
        return make_sequence(np.random.default_rng(77), n_frames=12,
                             motion="arc")

    def test_bitexact_telemetry_backend_off(self, pseq):
        seq = pseq
        bc = dict(ba_every_kf=False, enable_loop_closure=False,
                  enable_map_spill=False)
        s0 = create_system(CFG, BackendConfig(**bc), seq.rig, seq.left[0].shape)
        tel0, _ = run_system(s0, seq.left, seq.right)
        s3 = create_system(CFG, BackendConfig(telemetry_lag=3, **bc),
                           seq.rig, seq.left[0].shape)
        tel3, infos3 = run_system(s3, seq.left, seq.right)
        # same number of frames (queue flushed), bit-identical content
        assert tel3.t_cw.shape == tel0.t_cw.shape
        np.testing.assert_array_equal(np.asarray(tel0.t_cw),
                                      np.asarray(tel3.t_cw))
        np.testing.assert_array_equal(np.asarray(tel0.n_tracked),
                                      np.asarray(tel3.n_tracked))
        # infos carry the true frame index
        frames = [i["frame"] for i in infos3]
        assert frames == list(range(12))

    def test_backend_runs_with_lag(self, pseq):
        seq = pseq
        s3 = create_system(CFG, BackendConfig(telemetry_lag=3),
                           seq.rig, seq.left[0].shape)
        tel3, infos3 = run_system(s3, seq.left, seq.right)
        s0 = create_system(CFG, BackendConfig(), seq.rig, seq.left[0].shape)
        tel0, _ = run_system(s0, seq.left, seq.right)
        # same keyframes were declared and snapshotted
        assert int(np.asarray(s3.kf_db.valid).sum()) == \
            int(np.asarray(s0.kf_db.valid).sum())
        np.testing.assert_array_equal(
            np.sort(np.asarray(s3.kf_db.frame_idx)[np.asarray(s3.kf_db.valid)]),
            np.sort(np.asarray(s0.kf_db.frame_idx)[np.asarray(s0.kf_db.valid)]))
        assert s3.n_ba_runs >= 1
        # trajectory stays sane (corrections land 3 frames later, so allow
        # slack vs the synchronous run)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        ate3 = ate_rmse(camera_positions(tel3.R_cw, tel3.t_cw), gt)
        assert ate3 < 0.05, ate3
