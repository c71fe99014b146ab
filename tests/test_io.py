"""IO layer tests: native PNG decode + prefetch, Kalibr calibration +
rectification, dataset reader, options round-trip, telemetry CSV."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.calibration import (
    parse_kalibr_camchain, compute_rectify_maps, parse_imu_config,
)
from zenslam_tpu.io.dataset import FolderReader, Groundtruth, _read_pgm
from zenslam_tpu.io.telemetry import TelemetryWriter, analyze_frame_stats
from zenslam_tpu.config import AllOptions, load_options, save_options
from zenslam_tpu.pipeline.state import SlamConfig


def _write_png_gray(path, img):
    """Reference PNG writer using zlib (pure python) for decoder testing."""
    import struct, zlib

    h, w = img.shape
    depth = 16 if img.dtype == np.uint16 else 8

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        return out + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    raw = b""
    for y in range(h):
        row = img[y]
        if depth == 16:
            raw += b"\x00" + row.astype(">u2").tobytes()
        else:
            raw += b"\x00" + row.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    open(path, "wb").write(data)


class TestNativePng:
    def test_decode_roundtrip_8bit(self, tmp_path, rng):
        from zenslam_tpu.native.loader import decode_png_gray
        img = rng.integers(0, 255, (48, 64), dtype=np.uint8)
        p = str(tmp_path / "t.png")
        _write_png_gray(p, img)
        out = decode_png_gray(p)
        np.testing.assert_array_equal(out, img)

    def test_decode_roundtrip_16bit(self, tmp_path, rng):
        from zenslam_tpu.native.loader import decode_png_gray
        img = rng.integers(0, 65535, (32, 40), dtype=np.uint16)
        p = str(tmp_path / "t16.png")
        _write_png_gray(p, img)
        out = decode_png_gray(p)
        np.testing.assert_array_equal(out, img)

    def test_prefetch_reader_ordered(self, tmp_path, rng):
        from zenslam_tpu.native.loader import PrefetchReader
        paths_l, paths_r = [], []
        imgs = []
        for i in range(6):
            img = rng.integers(0, 255, (16, 24), dtype=np.uint8)
            imgs.append(img)
            pl = str(tmp_path / f"l{i}.png"); _write_png_gray(pl, img)
            pr = str(tmp_path / f"r{i}.png"); _write_png_gray(pr, img[::-1].copy())
            paths_l.append(pl); paths_r.append(pr)
        reader = PrefetchReader(paths_l, paths_r, width=24, height=16,
                                queue_cap=3, n_threads=2)
        got = list(reader)
        assert [g[0] for g in got] == list(range(6))
        for i, (idx, l, r) in enumerate(got):
            np.testing.assert_allclose(l, imgs[i].astype(np.float32) / 255.0, atol=1e-6)
            np.testing.assert_allclose(r, imgs[i][::-1].astype(np.float32) / 255.0, atol=1e-6)


class TestCalibration:
    def _camchain(self):
        return {
            "cam0": {
                "intrinsics": [458.654, 457.296, 367.215, 248.375],
                "distortion_coeffs": [-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05],
                "distortion_model": "radtan",
                "resolution": [752, 480],
                "T_cam_imu": np.eye(4).tolist(),
            },
            "cam1": {
                "intrinsics": [457.587, 456.134, 379.999, 255.238],
                "distortion_coeffs": [-0.28368365, 0.07451284, -0.00010473, -3.55590700e-05],
                "distortion_model": "radtan",
                "resolution": [752, 480],
                "T_cn_cnm1": [
                    [0.999997, 0.002312, 0.000376, -0.110074],
                    [-0.002317, 0.999898, 0.014090, 0.000399],
                    [-0.000343, -0.014090, 0.999900, -0.000853],
                    [0.0, 0.0, 0.0, 1.0],
                ],
            },
        }

    def test_parse(self):
        rig, models = parse_kalibr_camchain(self._camchain())
        assert abs(float(rig.left.fx) - 458.654) < 1e-3
        assert abs(float(rig.baseline) - 0.1101) < 1e-3
        assert models == ("radtan", "radtan")

    def test_rectify_maps_geometry(self):
        """After rectification: pure horizontal baseline, identical rows for
        corresponding points (epipolar lines horizontal)."""
        rig, models = parse_kalibr_camchain(self._camchain())
        maps = compute_rectify_maps(rig, models)
        rr = maps.rig_rectified
        np.testing.assert_allclose(np.asarray(rr.R_rl), np.eye(3), atol=1e-6)
        assert abs(float(rr.t_rl[1])) < 1e-6 and abs(float(rr.t_rl[2])) < 1e-6
        assert maps.left_x.shape == (480, 752)
        # maps point inside the source image for the central region
        c = maps.left_x[200:280, 300:450]
        assert (c > 0).all() and (c < 752).all()

    def test_imu_config(self):
        noise = parse_imu_config({
            "gyroscope_noise_density": 1e-4,
            "accelerometer_noise_density": 2e-3,
            "gyroscope_random_walk": 1e-6,
            "accelerometer_random_walk": 1e-4,
        })
        assert noise.gyro_noise == 1e-4 and noise.accel_bias_walk == 1e-4


class TestDataset:
    def _make_dataset(self, root, rng, n=4):
        os.makedirs(root / "cam0/data"); os.makedirs(root / "cam1/data")
        os.makedirs(root / "imu0")
        t0 = 1_000_000_000
        for i in range(n):
            ts = t0 + i * 50_000_000  # 20 fps in ns
            img = rng.integers(0, 255, (20, 30), dtype=np.uint8)
            _write_png_gray(str(root / f"cam0/data/{ts}.png"), img)
            _write_png_gray(str(root / f"cam1/data/{ts}.png"), img)
        # 200 Hz imu
        rows = []
        for k in range(n * 10 + 1):
            ts = t0 + k * 5_000_000
            rows.append([ts, 0.01, 0.02, 0.03, 0.1, 0.2, 9.8])
        np.savetxt(str(root / "imu0/data.csv"), np.asarray(rows), delimiter=",")

    def test_frames_with_imu_slices(self, tmp_path, rng):
        self._make_dataset(tmp_path, rng)
        reader = FolderReader(root=str(tmp_path))
        frames = list(reader.frames())
        assert len(frames) == 4
        assert frames[0].left.shape == (20, 30)
        # frames after the first carry ~10 IMU samples each
        for f in frames[1:]:
            assert 8 <= int(f.imu_mask.sum()) <= 11
            dts = f.imu_dt[f.imu_mask]
            np.testing.assert_allclose(dts, 0.005, atol=1e-6)

    def test_skip_take(self, tmp_path, rng):
        self._make_dataset(tmp_path, rng)
        reader = FolderReader(root=str(tmp_path), skip_frames=1, take_frames=2)
        frames = list(reader.frames())
        assert len(frames) == 2

    def test_groundtruth_slerp(self, tmp_path):
        rows = [
            [0, 0, 0, 0, 1, 0, 0, 0],
            [1_000_000_000, 1, 0, 0, 0.7071068, 0, 0, 0.7071068],
        ]
        p = str(tmp_path / "gt.csv")
        np.savetxt(p, np.asarray(rows, dtype=np.float64), delimiter=",")
        gt = Groundtruth(p)
        R, pos = gt.pose_at(0.5)
        np.testing.assert_allclose(pos, [0.5, 0, 0], atol=1e-6)
        # halfway between identity and 90° yaw = 45°
        assert abs(np.degrees(np.arctan2(R[1, 0], R[0, 0])) - 45.0) < 0.1


class TestOptionsAndTelemetry:
    def test_options_roundtrip(self, tmp_path):
        opts = AllOptions()
        opts = AllOptions(slam=SlamConfig(max_keypoints=128, klt_radius=7))
        p = str(tmp_path / "opt.yaml")
        save_options(opts, p)
        loaded = load_options(p)
        assert loaded.slam.max_keypoints == 128
        assert loaded.slam.klt_radius == 7
        assert loaded.slam.max_landmarks == SlamConfig().max_landmarks  # defaulted

    def test_options_partial_yaml(self, tmp_path):
        p = str(tmp_path / "p.yaml")
        open(p, "w").write("slam:\n  fast_threshold: 0.1\nfolder:\n  root: /data\n")
        o = load_options(p)
        assert o.slam.fast_threshold == 0.1
        assert o.folder.root == "/data"
        assert o.slam.cell_size == SlamConfig().cell_size

    def test_telemetry_csv_and_analysis(self, tmp_path):
        from zenslam_tpu.pipeline.state import FrameTelemetry
        p = str(tmp_path / "telemetry.csv")
        w = TelemetryWriter(p)
        for i in range(5):
            tel = FrameTelemetry(
                n_tracked=jnp.asarray(100 + i), n_detected=jnp.asarray(10),
                n_stereo=jnp.asarray(80), n_triangulated=jnp.asarray(5 if i == 2 else 60),
                n_pose_inliers=jnp.asarray(50), pose_method=jnp.asarray(0),
                pose_ok=jnp.asarray(True), tracked_ratio=jnp.asarray(0.9),
                is_keyframe=jnp.asarray(i == 0), map_size=jnp.asarray(500),
                n_lines=jnp.asarray(0), n_line_triangulated=jnp.asarray(0),
                line_map_size=jnp.asarray(0),
                R_cw=jnp.eye(3), t_cw=jnp.zeros(3),
            )
            w.write(tel, timestamp=i * 0.05, duration_ms=20.0)
        w.close()
        stats = analyze_frame_stats(p)
        assert stats["n_frames"] == 5
        assert stats["problems"]["low_tri"] == [2]
        assert stats["problem_fraction"] == 0.2


class TestEurocRecipe:
    """The checked-in EuRoC MH recipe (options/euroc_mh.yaml +
    euroc_camchain.yaml + euroc_mh_expected.json) must stay loadable and
    geometrically sane so the ATE-parity claim is executable the moment the
    dataset is mounted (VERDICT r2 item 8)."""

    def test_options_load(self):
        from zenslam_tpu.config import load_options

        opts = load_options("options/euroc_mh.yaml")
        assert opts.folder.left == "cam0/data"
        assert opts.folder.imu_file == "imu0/data.csv"
        assert abs(opts.folder.timescale - 1e-9) < 1e-15
        assert opts.slam.use_clahe is True
        assert opts.backend.enable_loop_closure is True

    def test_camchain_parses_and_rectifies(self):
        from zenslam_tpu.io.calibration import (
            load_kalibr_yaml, compute_rectify_maps)

        rig, models = load_kalibr_yaml("options/euroc_camchain.yaml")
        assert models == ("radtan", "radtan")
        assert rig.left.width == 752 and rig.left.height == 480
        # the known EuRoC stereo baseline is ~11.0 cm
        assert abs(float(rig.baseline) - 0.1101) < 0.002
        maps = compute_rectify_maps(rig, models)
        assert np.isfinite(maps.left_x).all() and np.isfinite(maps.right_y).all()
        assert float(maps.rig_rectified.baseline) > 0.09

    def test_expected_metrics_schema(self):
        import json

        exp = json.load(open("options/euroc_mh_expected.json"))
        for k in ["sequence", "ate_bound_mm", "rpe_bound_mm", "min_fps_tpu",
                  "checked_with"]:
            assert k in exp
        assert exp["ate_bound_mm"] > 0

    def test_sensor_realism_knobs_render(self):
        """exposure_jitter/vignette produce the intended photometry."""
        from zenslam_tpu.io.synthetic import make_sequence

        rng = np.random.default_rng(7)
        seq = make_sequence(rng, n_frames=3, width=128, height=96,
                            vignette=0.5, exposure_jitter=0.3)
        img = seq.left[0]
        H, W = img.shape
        centre = img[H//2-8:H//2+8, W//2-8:W//2+8].mean()
        corner = img[:12, :12].mean()
        assert corner < centre  # vignette darkens corners
        # per-frame exposure flicker: frame means differ notably
        means = [seq.left[i].mean() for i in range(3)]
        assert np.std(means) > 0.01
