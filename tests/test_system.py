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
        # BA rmse drops within each run
        ba_runs = [i["ba"] for i in infos if i["ba"] is not None]
        assert all(after <= before * 1.05 for before, after in ba_runs)

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
