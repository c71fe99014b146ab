"""Host-batch data-parallel offline mode (SURVEY.md §2.5): chunked frame
processing with overlap stitching must reproduce the serial trajectory."""

import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig, run_sequence
from zenslam_tpu.parallel import run_offline_chunks, split_chunks
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


class TestSplitChunks:
    def test_cover_and_overlap(self):
        for T, C, V in [(30, 3, 3), (64, 4, 2), (10, 1, 2), (17, 5, 3)]:
            b = split_chunks(T, C, V)
            assert b[0][0] == 0 and b[-1][1] == T
            for (s0, e0), (s1, e1) in zip(b, b[1:]):
                assert s1 == e0 - V, (b, T, C, V)
                assert e1 > e0


class TestOfflineChunks:
    @pytest.fixture(scope="class")
    def seq(self):
        return make_sequence(np.random.default_rng(11), n_frames=24,
                             motion="arc", speed=0.5, width=320, height=240)

    def test_matches_serial_ate(self, seq):
        cfg = SlamConfig(max_keypoints=256, max_landmarks=4096)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        _, tel = run_sequence(cfg, seq.rig, seq.left, seq.right)
        ate_serial = ate_rmse(camera_positions(tel.R_cw, tel.t_cw), gt)

        out = run_offline_chunks(cfg, seq.rig, seq.left, seq.right,
                                 n_chunks=3, overlap=4)
        est = camera_positions(out["R_cw"], out["t_cw"])
        ate_chunked = ate_rmse(est, gt)
        # chunked must be comparable to serial (gauge-stitch error only)
        assert ate_chunked < max(ate_serial * 3.0, 0.03), (
            ate_serial, ate_chunked)
        # merged map covers the scene at a plausible size
        assert out["map_xyz"].shape[0] > 200
        assert np.isfinite(out["map_xyz"]).all()

    def test_single_chunk_is_serial(self, seq):
        cfg = SlamConfig(max_keypoints=256, max_landmarks=4096)
        _, tel = run_sequence(cfg, seq.rig, seq.left, seq.right)
        out = run_offline_chunks(cfg, seq.rig, seq.left, seq.right,
                                 n_chunks=1)
        np.testing.assert_allclose(out["t_cw"], np.asarray(tel.t_cw),
                                   atol=1e-5)
