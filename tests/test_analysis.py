"""Analysis/plotting parity scripts produce figures from a recorded CSV
(≡ the reference's `zenslam_py/scripts/plot_*.py` over its frame CSV)."""

import os
from types import SimpleNamespace

import numpy as np
import pytest

from zenslam_tpu.io.telemetry import TelemetryWriter, analyze_frame_stats


def _write_csv(path, n=40, seed=3):
    rng = np.random.default_rng(seed)
    w = TelemetryWriter(str(path))
    for i in range(n):
        tel = SimpleNamespace(
            R_cw=np.eye(3, dtype=np.float32),
            t_cw=np.asarray([0.1 * i, 0.0, 0.0], np.float32),
            n_tracked=int(200 + rng.integers(-30, 30)),
            n_detected=int(rng.integers(20, 80)),
            n_stereo=int(rng.integers(80, 150)),
            n_triangulated=int(rng.integers(30, 90)),
            n_pose_inliers=int(rng.integers(40, 120)),
            pose_method=int(rng.integers(0, 4)),
            pose_ok=True,
            tracked_ratio=float(rng.uniform(0.5, 0.95)),
            is_keyframe=bool(i % 8 == 0),
            map_size=int(300 + 12 * i),
        )
        w.write(tel, timestamp=i * 0.05,
                duration_ms=float(rng.uniform(12, 25)),
                wait_ms=float(rng.uniform(1, 3)),
                step_ms=float(rng.uniform(8, 15)),
                backend_ms=float(rng.uniform(0, 6)) if i % 8 == 0 else 0.0)
    w.close()
    return path


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    return _write_csv(tmp_path_factory.mktemp("telemetry") / "frame_data.csv")


def test_plot_timing_breakdown(csv_path, tmp_path):
    from zenslam_tpu.analysis.plot_timing_breakdown import main

    out = tmp_path / "plots"
    assert main(["--csv", str(csv_path), "--output", str(out)]) == 0
    for f in ["timing_stacked.png", "timing_distribution.png",
              "timing_throughput.png"]:
        assert (out / f).stat().st_size > 1000


def test_plot_feature_metrics(csv_path, tmp_path):
    from zenslam_tpu.analysis.plot_feature_metrics import main

    out = tmp_path / "plots"
    assert main(["--csv", str(csv_path), "--output", str(out)]) == 0
    for f in ["feature_counts.png", "feature_quality.png",
              "feature_map_growth.png", "feature_pose_methods.png"]:
        assert (out / f).stat().st_size > 1000


def test_plot_detector_comparison(csv_path, tmp_path):
    from zenslam_tpu.analysis.plot_detector_comparison import main

    other = _write_csv(tmp_path / "other.csv", seed=9)
    out = tmp_path / "plots"
    assert main(["--run", f"baseline={csv_path}",
                 "--run", f"variant={other}",
                 "--output", str(out)]) == 0
    for f in ["comparison_means.png", "comparison_tracked.png",
              "comparison_timing.png"]:
        assert (out / f).stat().st_size > 1000


def test_analyze_frame_stats_consumes_same_csv(csv_path):
    stats = analyze_frame_stats(str(csv_path))
    assert stats["n_frames"] == 40
    assert 0.0 <= stats["problem_fraction"] <= 1.0


class TestSceneExport:
    """Headless 3D scene export ≡ the reference's VTK scene
    (`vtk_scene_window.cpp:1-415`): colored PLY + self-contained HTML +
    matplotlib snapshot, from a real (small) system run."""

    @pytest.fixture(scope="class")
    def scene_run(self, tmp_path_factory):
        import jax.numpy as jnp

        from zenslam_tpu.io.synthetic import make_sequence
        from zenslam_tpu.pipeline.state import SlamConfig
        from zenslam_tpu.pipeline.system import (
            BackendConfig, create_system, run_system)

        seq = make_sequence(np.random.default_rng(17), n_frames=8, width=256,
                            height=192, motion="strafe", speed=0.4)
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         kf_min_frames=2, kf_min_translation=0.04)
        sys = create_system(cfg, BackendConfig(ba_every_kf=False,
                                               enable_loop_closure=False),
                            seq.rig, seq.left[0].shape)
        tel, _ = run_system(sys, seq.left, seq.right)
        est = [-np.asarray(R).T @ np.asarray(t)
               for R, t in zip(tel.R_cw, tel.t_cw)]
        gt = [-seq.R_lw[i].T @ seq.t_lw[i] for i in range(8)]
        out = str(tmp_path_factory.mktemp("scene"))
        from zenslam_tpu.analysis.scene_export import export_scene

        scene = export_scene(out, sys, est_positions=est, gt_positions=gt)
        return out, scene, sys

    def test_ply_roundtrip_with_sampled_colors(self, scene_run):
        from zenslam_tpu.analysis.scene_export import read_ply

        out, scene, sys = scene_run
        pts, rgb = read_ply(os.path.join(out, "scene.ply"))
        assert len(pts) == len(scene["points"]) > 100
        np.testing.assert_allclose(pts, scene["points"], atol=1e-3)
        # colors are SAMPLED intensities (≡ triangulator.cpp:74-103), not a
        # constant fill — the textured scene must produce spread
        assert rgb[:, 0].std() > 5
        # gray: r == g == b
        assert (rgb[:, 0] == rgb[:, 1]).all() and (rgb[:, 1] == rgb[:, 2]).all()

    def test_html_self_contained(self, scene_run):
        out, scene, _ = scene_run
        html = open(os.path.join(out, "scene.html")).read()
        assert "SCENE" in html and "frusta" in html
        assert "http://" not in html and "https://" not in html, \
            "scene.html must not depend on the network"
        # landmark data is embedded
        assert html.count("[") > len(scene["points"])

    def test_png_written(self, scene_run):
        out, _, _ = scene_run
        p = os.path.join(out, "scene_3d.png")
        assert os.path.exists(p) and os.path.getsize(p) > 20_000

    def test_frusta_present(self, scene_run):
        _, scene, sys = scene_run
        assert len(scene["kf_R"]) == int(np.asarray(sys.kf_db.valid).sum())
