"""End-to-end pipeline tests (SURVEY.md §7 phase 5 gate): full SLAM loop on a
rendered synthetic sequence with exact groundtruth — the dataset-driven ATE
regression test the reference lacks (§4 'for the TPU build add…')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig, run_sequence, init_state
from zenslam_tpu.pipeline.step import slam_step
from zenslam_tpu.eval.metrics import ate_rmse, rpe_rmse, camera_positions, align_umeyama
from zenslam_tpu.frontend.tables import insert_into_free_slots, allocate_landmark_slots


CFG = SlamConfig(max_keypoints=256, max_landmarks=2048, pnp_iters=128, rigid_iters=128)


@pytest.fixture(scope="module")
def strafe_seq():
    return make_sequence(np.random.default_rng(11), n_frames=10, motion="strafe")


class TestTables:
    def test_insert_free_slots_basic(self):
        free = jnp.array([True, False, True, True])
        score = jnp.array([0.5, 0.9, 0.1])
        valid = jnp.array([True, True, True])
        slot, placed = insert_into_free_slots(free, score, valid)
        # best candidate (idx 1) -> slot 0; next (idx 0) -> slot 2; idx 2 -> slot 3
        np.testing.assert_array_equal(np.asarray(slot), [2, 0, 3])
        assert np.asarray(placed).all()

    def test_insert_overflow(self):
        free = jnp.array([False, True, False])
        score = jnp.array([0.5, 0.9])
        valid = jnp.array([True, True])
        slot, placed = insert_into_free_slots(free, score, valid)
        np.testing.assert_array_equal(np.asarray(placed), [False, True])
        assert int(slot[1]) == 1 and int(slot[0]) == -1

    def test_allocate_evicts_stale_unprotected(self):
        lm_valid = jnp.array([True, True, True])
        last_seen = jnp.array([5, 1, 9])
        protect = jnp.array([False, False, True])
        score = jnp.array([1.0])
        valid = jnp.array([True])
        slot, placed = allocate_landmark_slots(lm_valid, last_seen, protect, score, valid)
        assert bool(placed[0]) and int(slot[0]) == 1  # stalest unprotected

    def test_allocate_prefers_free(self):
        lm_valid = jnp.array([True, False, True])
        last_seen = jnp.array([5, -1, 9])
        protect = jnp.array([False, False, False])
        slot, placed = allocate_landmark_slots(lm_valid, last_seen, protect,
                                               jnp.array([1.0]), jnp.array([True]))
        assert int(slot[0]) == 1


class TestEndToEnd:
    def test_strafe_tracking_accuracy(self, strafe_seq):
        seq = strafe_seq
        state, tel = run_sequence(CFG, seq.rig, seq.left, seq.right)
        # pose estimation must succeed on every frame after the first
        assert tel.pose_ok[1:].all()
        # PnP (method 0) should dominate
        assert (tel.pose_method[1:] == 0).mean() > 0.8
        est = camera_positions(tel.R_cw, tel.t_cw)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        ate = ate_rmse(est, gt)
        assert ate < 0.02, f"ATE {ate:.4f} m too high"
        assert rpe_rmse(est, gt) < 0.01

    def test_map_grows_and_persists(self, strafe_seq):
        seq = strafe_seq
        state, tel = run_sequence(CFG, seq.rig, seq.left, seq.right)
        assert tel.map_size[-1] > 100
        # landmarks get repeatedly observed (n_obs > 1 for a good fraction)
        n_obs = np.asarray(state.lmap.n_obs)[np.asarray(state.lmap.valid)]
        assert (n_obs >= 3).mean() > 0.4

    def test_first_frame_is_keyframe(self, strafe_seq):
        seq = strafe_seq
        state, tel = run_sequence(CFG, seq.rig, seq.left[:2], seq.right[:2])
        assert bool(tel.is_keyframe[0])

    def test_scan_mode_matches_stream(self, strafe_seq):
        seq = strafe_seq
        _, tel_stream = run_sequence(CFG, seq.rig, seq.left[:5], seq.right[:5])
        _, tel_scan = run_sequence(CFG, seq.rig, seq.left[:5], seq.right[:5], mode="scan")
        # scan changes XLA fusion -> f32 reduction orders differ slightly;
        # structure (counts) must match exactly, poses to ~mm
        np.testing.assert_allclose(tel_scan.t_cw, tel_stream.t_cw, atol=2e-3)
        np.testing.assert_array_equal(tel_scan.n_pose_inliers, tel_stream.n_pose_inliers)
        np.testing.assert_array_equal(tel_scan.n_tracked, tel_stream.n_tracked)

    def test_forward_motion(self):
        seq = make_sequence(np.random.default_rng(3), n_frames=8, motion="forward")
        state, tel = run_sequence(CFG, seq.rig, seq.left, seq.right)
        assert tel.pose_ok[1:].all()
        est = camera_positions(tel.R_cw, tel.t_cw)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        assert ate_rmse(est, gt) < 0.03

    def test_static_camera_stays_put(self):
        seq = make_sequence(np.random.default_rng(5), n_frames=4, motion="strafe", speed=0.0)
        state, tel = run_sequence(CFG, seq.rig, seq.left, seq.right)
        est = camera_positions(tel.R_cw, tel.t_cw)
        assert np.linalg.norm(est, axis=-1).max() < 0.01


class TestEvalMetrics:
    def test_ate_zero_for_identical(self, rng):
        p = rng.normal(0, 1, (20, 3))
        assert ate_rmse(p, p) < 1e-12

    def test_ate_alignment_invariance(self, rng):
        from zenslam_tpu.geometry import so3_exp
        p = rng.normal(0, 1, (20, 3)).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5], dtype=jnp.float32)))
        q = p @ R.T + np.array([4.0, -2.0, 1.0], np.float32)
        assert ate_rmse(p, q, align=True) < 1e-5

    def test_rpe_detects_drift(self):
        gt = np.stack([np.linspace(0, 1, 11), np.zeros(11), np.zeros(11)], -1)
        est = np.stack([np.linspace(0, 1.2, 11), np.zeros(11), np.zeros(11)], -1)
        assert rpe_rmse(est, gt) > 0.01


class TestTemporalRematch:
    """≡ match_temporal (`matching_utils.cpp:441-563`): descriptor recovery
    of KLT-lost landmark tracks under the epipolar gate of the predicted
    relative motion — fires where the map-radius association cannot (the
    epipolar constraint is a 1-D band; the radius gate needs the projection
    to land within 20 px)."""

    def test_epipolar_gated_transfer(self):
        import numpy as np
        import jax.numpy as jnp
        from zenslam_tpu.io.synthetic import default_rig
        from zenslam_tpu.pipeline.state import SlamConfig, empty_features, empty_landmarks
        from zenslam_tpu.pipeline.step import _temporal_rematch

        cfg = SlamConfig(max_keypoints=64, max_landmarks=256)
        rig = default_rig(320, 240)
        rng = np.random.default_rng(2)
        n = 64
        prev_xy = jnp.asarray(
            np.stack([rng.uniform(60, 260, n), rng.uniform(40, 200, n)], -1),
            jnp.float32)
        desc = jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))
        prev_lm = jnp.arange(n, dtype=jnp.int32)
        prev_valid = jnp.ones(n, bool)
        track_ok = jnp.zeros(n, bool)  # every track died

        # pure-x relative translation: epipolar lines are horizontal rows.
        # current keypoints shifted 40 px along x (WAY outside the radius
        # gate) keep y — they sit exactly on their epipolar lines.
        feats = empty_features(cfg)
        shift = jnp.asarray([40.0, 0.0], jnp.float32)
        feats = feats._replace(
            xy=prev_xy + shift, desc=desc,
            valid=jnp.ones(n, bool), lm_idx=jnp.full(n, -1, jnp.int32))
        lmap = empty_landmarks(cfg)
        lmap = lmap._replace(valid=lmap.valid.at[:n].set(True))

        R_prev = jnp.eye(3); t_prev = jnp.zeros(3)
        R_pred = jnp.eye(3); t_pred = jnp.asarray([-0.1, 0.0, 0.0], jnp.float32)
        out, n_hit = _temporal_rematch(
            cfg, rig, feats, desc, prev_xy, prev_lm, prev_valid, track_ok,
            R_prev, t_prev, R_pred, t_pred, lmap)
        assert int(n_hit) >= n - 4
        hit = np.asarray(out.lm_idx[:n])
        assert (hit == np.arange(n)).mean() > 0.9

        # violating the epipolar constraint (shift in y) must NOT transfer
        feats_bad = feats._replace(xy=prev_xy + jnp.asarray([0.0, 25.0]))
        out2, n_hit2 = _temporal_rematch(
            cfg, rig, feats_bad, desc, prev_xy, prev_lm, prev_valid, track_ok,
            R_prev, t_prev, R_pred, t_pred, lmap)
        assert int(n_hit2) <= 2

    def test_integration_not_worse_after_blank_frame(self):
        import numpy as np
        from zenslam_tpu.io.synthetic import make_sequence
        from zenslam_tpu.pipeline import SlamConfig, run_sequence
        from zenslam_tpu.eval.metrics import ate_rmse, camera_positions

        seq = make_sequence(np.random.default_rng(9), n_frames=10,
                            motion="strafe", speed=0.25, width=320, height=240)
        left = seq.left.copy(); right = seq.right.copy()
        left[5] = 0.5; right[5] = 0.5
        gt = camera_positions(seq.R_lw, seq.t_lw)

        def run(flag):
            cfg = SlamConfig(max_keypoints=256, max_landmarks=4096,
                             use_temporal_rematch=flag)
            st, tel = run_sequence(cfg, seq.rig, left, right)
            return ate_rmse(camera_positions(tel.R_cw, tel.t_cw), gt)

        assert run(True) <= run(False) * 1.2 + 1e-4
