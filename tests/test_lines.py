"""Keyline subsystem tests (SURVEY.md §2.1 keyline_detector / keyline_tracker
/ line_estimator rows): detection on synthetic stripes, descriptor stability,
and the full pipeline with use_keylines=True — the reference's line subsystem
(`keyline_detector.cpp`, `keyline_tracker.cpp`, `combined_estimator.cpp`)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.ops.lines import (
    detect_keylines, keyline_descriptors, canonicalize_endpoints,
    point_segment_distance,
)
from zenslam_tpu.pipeline import SlamConfig, run_sequence
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


def _stripe_image(H=128, W=128, row=None, col=None, width=3, rng=None):
    rng = rng or np.random.default_rng(0)
    img = 0.45 + 0.1 * rng.random((H, W)).astype(np.float32)
    if row is not None:
        img[row : row + width, :] = 1.0
    if col is not None:
        img[:, col : col + width] = 1.0
    return jnp.asarray(img)


def _no_existing(m=4):
    return jnp.zeros((m, 2, 2), jnp.float32), jnp.zeros(m, bool)


class TestDetect:
    def test_horizontal_stripe_detected(self):
        img = _stripe_image(row=64)
        ep, score, valid = detect_keylines(img, *_no_existing(), max_keylines=8)
        assert bool(valid.any())
        best = np.asarray(ep[np.argmax(np.asarray(score))])
        # near-horizontal segment around y ≈ 64-66 (stripe edges)
        dy = abs(best[1, 1] - best[0, 1])
        dx = abs(best[1, 0] - best[0, 0])
        assert dx > 4 * dy
        assert 58 < best[:, 1].mean() < 72

    def test_vertical_stripe_detected(self):
        img = _stripe_image(col=40)
        ep, score, valid = detect_keylines(img, *_no_existing(), max_keylines=8)
        assert bool(valid.any())
        best = np.asarray(ep[np.argmax(np.asarray(score))])
        assert abs(best[1, 1] - best[0, 1]) > 4 * abs(best[1, 0] - best[0, 0])
        assert 34 < best[:, 0].mean() < 48

    def test_blank_image_no_lines(self):
        img = jnp.full((128, 128), 0.5, jnp.float32)
        ep, score, valid = detect_keylines(img, *_no_existing(), max_keylines=8)
        assert not bool(valid.any())

    def test_masking_suppresses_existing(self):
        img = _stripe_image(row=64)
        ep, score, valid = detect_keylines(img, *_no_existing(), max_keylines=8)
        best = ep[jnp.argmax(score)][None]
        ex_valid = jnp.ones(1, bool)
        ep2, score2, valid2 = detect_keylines(img, best, ex_valid, max_keylines=8)
        # re-detections on top of the known line must be suppressed
        mid2 = 0.5 * (ep2[:, 0] + ep2[:, 1])
        d = point_segment_distance(mid2, best)
        assert not bool((valid2 & (d[:, 0] <= 8.0)).any())


class TestDescriptors:
    def test_shift_stability_and_discrimination(self):
        rng = np.random.default_rng(2)
        img = _stripe_image(row=64, rng=rng)
        ep = jnp.asarray([[[20.0, 64.0], [100.0, 64.0]],
                          [[20.0, 66.5], [100.0, 66.5]],
                          [[30.0, 20.0], [30.0, 110.0]]], jnp.float32)
        valid = jnp.ones(3, bool)
        d = keyline_descriptors(img, ep, valid)

        def ham(a, b):
            x = np.asarray(a) ^ np.asarray(b)
            return int(sum(bin(int(v)).count("1") for v in x))

        # same physical line sampled 2.5 px apart along the normal: close
        # different line: far
        assert ham(d[0], d[1]) < ham(d[0], d[2])

    def test_invalid_rows_zero(self):
        img = _stripe_image(row=64)
        ep = jnp.zeros((2, 2, 2), jnp.float32)
        valid = jnp.array([False, False])
        d = keyline_descriptors(img, ep, valid)
        assert int(np.asarray(d).sum()) == 0


class TestGeomHelpers:
    def test_canonicalize_orders_endpoints(self):
        ep = jnp.asarray([[[5.0, 0.0], [1.0, 0.0]]])
        out = np.asarray(canonicalize_endpoints(ep))
        assert out[0, 0, 0] <= out[0, 1, 0]

    def test_point_segment_distance(self):
        ep = jnp.asarray([[[0.0, 0.0], [10.0, 0.0]]])
        p = jnp.asarray([[5.0, 3.0], [-4.0, 0.0], [5.0, 0.0]])
        d = np.asarray(point_segment_distance(p, ep))[:, 0]
        np.testing.assert_allclose(d, [3.0, 4.0, 0.0], atol=1e-5)


class TestEndToEnd:
    @pytest.fixture(scope="class")
    def lines_seq(self):
        return make_sequence(np.random.default_rng(11), n_frames=8,
                             motion="strafe", with_lines=True)

    def test_pipeline_with_keylines(self, lines_seq):
        seq = lines_seq
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128, use_keylines=True)
        state, tel = run_sequence(cfg, seq.rig, seq.left, seq.right)
        assert tel.pose_ok[1:].all()
        # lines are detected, triangulated, and mapped
        assert (tel.n_lines[1:] >= 8).all()
        assert tel.n_line_triangulated.max() >= 4
        assert tel.line_map_size[-1] >= 4
        est = camera_positions(tel.R_cw, tel.t_cw)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        assert ate_rmse(est, gt) < 0.02

    def test_line_map_world_consistency(self, lines_seq):
        """Triangulated 3D line endpoints must land on the corridor planes
        (wall z=6, floor y=1.5, ceiling y=-1.2 in world coords)."""
        seq = lines_seq
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128, use_keylines=True)
        state, tel = run_sequence(cfg, seq.rig, seq.left, seq.right)
        xyz = np.asarray(state.line_map.xyz)[np.asarray(state.line_map.valid)]
        assert xyz.shape[0] >= 4
        pts = xyz.reshape(-1, 3)
        d_wall = np.abs(pts[:, 2] - 6.0)
        d_floor = np.abs(pts[:, 1] - 1.5)
        d_ceil = np.abs(pts[:, 1] + 1.2)
        d_plane = np.minimum(d_wall, np.minimum(d_floor, d_ceil))
        # majority of endpoints within 10 cm of a true world plane
        assert (d_plane < 0.10).mean() > 0.6


class TestKeylinesFullSystem:
    """Keylines through the FULL system + scene artifacts (r4 verdict
    Weak #6 / Missing #2): lines on in a backend-on run, line3d exported
    into the scene artifacts, and no ATE regression vs the same run with
    lines off."""

    def test_system_run_exports_line3d_no_ate_regression(self, tmp_path):
        from zenslam_tpu.pipeline.system import (BackendConfig,
                                                 create_system, run_system)
        from zenslam_tpu.analysis.scene_export import export_scene

        seq = make_sequence(np.random.default_rng(11), n_frames=10,
                            motion="strafe", with_lines=True)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        ates = {}
        for lines_on in (False, True):
            cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                             pnp_iters=128, rigid_iters=128,
                             kf_min_frames=2, kf_min_translation=0.04,
                             use_keylines=lines_on)
            sysm = create_system(
                cfg, BackendConfig(ba_every_kf=True,
                                   enable_loop_closure=False),
                seq.rig, seq.left[0].shape)
            tel, _ = run_system(sysm, seq.left, seq.right)
            est = camera_positions(tel.R_cw, tel.t_cw)
            ates[lines_on] = ate_rmse(est, gt)
            if lines_on:
                assert int(tel.n_lines.max()) >= 8  # telemetry shows lines
                scene = export_scene(str(tmp_path), sysm, est, gt)
                # line3d segments present in the scene dict and artifacts
                assert scene["lines"].shape[0] >= 4
                html = open(tmp_path / "scene.html").read()
                assert '"lines": [[[' in html
                assert "keylines" in html
        # lines must not break the trajectory (typically equal or better)
        assert ates[True] < max(ates[False] * 1.5, 0.02), ates
