"""zenslam_tpu application entry — the `main.cpp` equivalent.

CLI (≡ `zenslam_app/source/main.cpp:33-115`):
    python -m zenslam_tpu.app --options-file options.yaml
    python -m zenslam_tpu.app --options-file options.yaml --no-backend
    python -m zenslam_tpu.app --version / --help

Runs the full keyframe SLAM system over the dataset named in the options:
native prefetch reader → (optional rectification) → jitted frame step →
keyframe back-end (windowed BA + loop closure) → telemetry CSV + trajectory,
ATE/RPE against groundtruth when available; writes the effective options back
on exit (≡ options_writer emit-back).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("zenslam_tpu")
    ap.add_argument("--options-file", default=None)
    ap.add_argument("--no-backend", action="store_true")
    ap.add_argument("--no-imu", action="store_true",
                    help="ignore the IMU stream (vision-only)")
    ap.add_argument("--take", type=int, default=0, help="override take_frames")
    ap.add_argument("--no-scene", action="store_true",
                    help="skip the 3D scene export (PLY/HTML/PNG)")
    ap.add_argument("--viz", action="store_true",
                    help="write per-keyframe 2D match-overlay PNGs "
                         "(stereo + temporal ≡ the reference's "
                         "opencv_window views) and a diagnostics.html "
                         "report into the output folder")
    ap.add_argument("--save-vocab", default="",
                    help="write the run's trained BoW vocabulary to this "
                         ".npz (reload via backend.vocab_file; ≡ the "
                         "reference's vocabulary save, bow_vocabulary.cpp:"
                         "275-305)")
    ap.add_argument("--version", action="store_true")
    args = ap.parse_args(argv)

    import zenslam_tpu

    if args.version:
        print(f"zenslam_tpu {zenslam_tpu.__version__}")
        return 0

    import jax
    import jax.numpy as jnp

    from zenslam_tpu.config import AllOptions, load_options, save_options
    from zenslam_tpu.io.dataset import FolderReader, Groundtruth
    from zenslam_tpu.io.calibration import (
        load_kalibr_yaml, compute_rectify_maps, parse_imu_config)
    from zenslam_tpu.io.telemetry import TelemetryWriter
    from zenslam_tpu.io.synthetic import default_rig
    from zenslam_tpu.ops.image import remap
    from zenslam_tpu.pipeline.system import BackendConfig, create_system, process_frame
    from zenslam_tpu.eval.metrics import ate_rmse, rpe_rmse, camera_positions

    opts = load_options(args.options_file) if args.options_file else AllOptions()
    if args.take:
        opts.folder.take_frames = args.take
    if args.no_backend:
        opts.backend.ba_every_kf = False
        opts.backend.enable_loop_closure = False

    os.makedirs(opts.folder.output, exist_ok=True)

    # calibration
    maps = None
    if opts.folder.calibration_file:
        rig_raw, models = load_kalibr_yaml(opts.folder.calibration_file)
        maps = compute_rectify_maps(rig_raw, models)
        rig = maps.rig_rectified
        print(f"calibration: {opts.folder.calibration_file} (rectifying, "
              f"baseline {float(rig.baseline):.4f} m)")
    else:
        rig = None  # resolved after the first frame's shape is known

    # IMU calibration (Kalibr imu_config.yaml ≡ `imu_calibration.h:21-67`):
    # Allan noise densities flow into the preintegration covariance and the
    # covariance-weighted inertial fusion candidate (SlamConfig.imu_* fields)
    if opts.folder.imu_calibration_file:
        import yaml

        with open(opts.folder.imu_calibration_file) as f:
            noise = parse_imu_config(yaml.safe_load(f) or {})
        opts.slam = opts.slam._replace(
            imu_gyro_noise=noise.gyro_noise,
            imu_accel_noise=noise.accel_noise,
            imu_gyro_bias_walk=noise.gyro_bias_walk,
            imu_accel_bias_walk=noise.accel_bias_walk)
        print(f"imu calibration: {opts.folder.imu_calibration_file} "
              f"(gyro {noise.gyro_noise:.2e} rad/s/√Hz, "
              f"accel {noise.accel_noise:.2e} m/s²/√Hz)")

    reader = FolderReader(
        root=opts.folder.root,
        left_dir=opts.folder.left, right_dir=opts.folder.right,
        imu_file=opts.folder.imu_file, timescale=opts.folder.timescale,
        skip_frames=opts.folder.skip_frames, take_frames=opts.folder.take_frames,
    )
    gt = Groundtruth(opts.folder.groundtruth_file) if opts.folder.groundtruth_file else None

    telemetry = TelemetryWriter(os.path.join(opts.folder.output, "frame_data.csv"))
    traj_path = os.path.join(opts.folder.output, "trajectory.csv")
    traj_f = open(traj_path, "w")
    traj_f.write("# timestamp, px, py, pz (camera center, world frame)\n")

    has_imu = reader.has_imu() and not args.no_imu
    if has_imu:
        print("IMU stream found — VIO branch enabled")
    system = None
    est_pos, gt_pos, times = [], [], []
    meta = []  # per-frame (timestamp, wait_ms) — telemetry may arrive lagged
    n = 0
    t_start = time.time()
    mx_l = my_l = mx_r = my_r = None

    def emit(tel, info, dt_ms):
        ts, wait_ms = meta[info["frame"]]
        telemetry.write(tel, timestamp=ts, duration_ms=dt_ms,
                        wait_ms=wait_ms, step_ms=info["step_ms"],
                        backend_ms=info["backend_ms"])
        R = np.asarray(tel.R_cw)
        t = np.asarray(tel.t_cw)
        c = -R.T @ t
        est_pos.append(c)
        traj_f.write(f"{ts:.9f}, {c[0]:.6f}, {c[1]:.6f}, {c[2]:.6f}\n")
        if gt is not None:
            _, p = gt.pose_at(ts)
            gt_pos.append(p)
        return R, t

    def _to_u8(img):
        return np.clip(img * 255.0 + 0.5, 0, 255).astype(np.uint8)

    R = t = None
    tel = None
    # --viz bookkeeping: keep recent RECTIFIED host frames so the (possibly
    # telemetry-lagged) keyframe overlay can fetch its images, plus the
    # previous keyframe's snapshot for the temporal join
    viz_entries = []
    viz_imgs = {}
    viz_prev_snap = None
    frame_iter = reader.frames_prefetch()  # native decode threads ≡ reader_thread
    while True:
        t_wait0 = time.time()
        frame = next(frame_iter, None)
        if frame is None:
            break
        wait_ms = (time.time() - t_wait0) * 1000
        # upload as uint8 and rescale ON DEVICE: the sensor data is 8-bit
        # anyway, and host->device bandwidth is the app's frame-rate ceiling
        # on remote-attached accelerators (measured: 2.9 MB/frame f32 over
        # the axon tunnel = ~290 ms; uint8 is 4x less)
        il = jnp.asarray(_to_u8(frame.left)).astype(jnp.float32) * (1.0 / 255.0)
        ir = jnp.asarray(_to_u8(frame.right)).astype(jnp.float32) * (1.0 / 255.0)
        imu = None
        if has_imu:
            imu = (jnp.asarray(frame.imu_gyro), jnp.asarray(frame.imu_accel),
                   jnp.asarray(frame.imu_dt), jnp.asarray(frame.imu_mask))
        if maps is not None:
            if mx_l is None:
                mx_l, my_l = jnp.asarray(maps.left_x), jnp.asarray(maps.left_y)
                mx_r, my_r = jnp.asarray(maps.right_x), jnp.asarray(maps.right_y)
            il = remap(il, mx_l, my_l)
            ir = remap(ir, mx_r, my_r)
        if system is None:
            if rig is None:
                H, W = frame.left.shape
                rig = default_rig(width=W, height=H)
                print(f"no calibration file — default rig for {W}x{H}")
            system = create_system(opts.slam, opts.backend, rig, il.shape)
        meta.append((frame.timestamp, wait_ms))
        t0 = time.time()
        # process_frame returns HOST telemetry (one packed transfer — every
        # separate jax-scalar read costs a full tunnel round trip). With
        # backend.telemetry_lag > 0 it arrives for an EARLIER frame (the
        # async-copy pipeline); `meta` realigns timestamps.
        tel_i, info = process_frame(system, il, ir, imu=imu)
        dt_ms = (time.time() - t0) * 1000 + wait_ms
        times.append(dt_ms)
        n += 1
        if args.viz:
            # retain the rectified DEVICE arrays (materialized only at
            # keyframes — --viz is a diagnostics mode, the occasional
            # blocking read is the product)
            viz_imgs[n - 1] = (il, ir)
        if tel_i is None:
            continue
        tel = tel_i
        R, t = emit(tel, info, dt_ms)
        if args.viz and bool(tel.is_keyframe) and system is not None \
                and system.last_kf_snap is not None \
                and info["frame"] in viz_imgs:
            from zenslam_tpu.analysis.overlays import save_keyframe_overlays

            l_img, r_img = viz_imgs[info["frame"]]
            viz_entries.append(save_keyframe_overlays(
                os.path.join(opts.folder.output, "viz"), info["frame"],
                np.asarray(l_img), np.asarray(r_img),
                system.last_kf_snap, viz_prev_snap))
            viz_prev_snap = system.last_kf_snap
        if args.viz:
            for k in [k for k in viz_imgs if k < info["frame"] - 1]:
                del viz_imgs[k]
        if n % 50 == 0:
            print(f"frame {n}: {np.mean(times[-50:]):.1f} ms/frame, "
                  f"map {int(tel.map_size)}, inliers {int(tel.n_pose_inliers)}")
    if system is not None:
        from zenslam_tpu.pipeline.system import flush_pipeline

        for tel_i, info in flush_pipeline(system):
            tel = tel_i
            R, t = emit(tel, info, 0.0)
            if args.viz and bool(tel.is_keyframe) \
                    and system.last_kf_snap is not None \
                    and info["frame"] in viz_imgs:
                from zenslam_tpu.analysis.overlays import save_keyframe_overlays

                l_img, r_img = viz_imgs[info["frame"]]
                viz_entries.append(save_keyframe_overlays(
                    os.path.join(opts.folder.output, "viz"), info["frame"],
                    np.asarray(l_img), np.asarray(r_img),
                    system.last_kf_snap, viz_prev_snap))
                viz_prev_snap = system.last_kf_snap

    telemetry.close()
    traj_f.close()
    wall = time.time() - t_start
    print(f"\nprocessed {n} frames in {wall:.1f}s "
          f"({n / max(wall, 1e-9):.1f} fps, steady {np.median(times):.1f} ms/frame)")
    if n:
        from zenslam_tpu.utils import format_pose  # ≡ formatters.h pose log
        # print the camera-in-world pose (what the trajectory file logs),
        # not T_cam_world whose t is easily misread as the camera position
        print(f"final pose (camera in world): {format_pose(R.T, -R.T @ t)}")
    if system is not None:
        print(f"keyframes: {int(system.kf_db.valid.sum())}, "
              f"BA runs: {system.n_ba_runs}, loop closures: {system.n_loop_closures}")
    if gt is not None and len(gt_pos) > 2:
        ate = ate_rmse(np.asarray(est_pos), np.asarray(gt_pos))
        rpe = rpe_rmse(np.asarray(est_pos), np.asarray(gt_pos))
        print(f"ATE RMSE: {ate * 1000:.1f} mm   RPE RMSE: {rpe * 1000:.1f} mm")
    if system is not None and not args.no_scene:
        # headless 3D scene ≡ the reference's VTK window
        # (`vtk_scene_window.cpp:1-415`): colored landmark PLY + interactive
        # HTML + matplotlib snapshot
        from zenslam_tpu.analysis.scene_export import export_scene

        scene = export_scene(opts.folder.output, system,
                             est_positions=est_pos, gt_positions=gt_pos)
        print(f"scene export: {len(scene['points'])} landmarks -> "
              f"{opts.folder.output}/scene.{{ply,html}} + scene_3d.png")
    if args.viz and viz_entries:
        from zenslam_tpu.analysis.overlays import export_viz_report

        # timing plots rendered from the run's own telemetry feed the report
        # (the imgui_controls_window substitute)
        timing_pngs = []
        try:
            from zenslam_tpu.analysis.plot_timing_breakdown import (
                main as plot_main)

            plot_main(["--csv", os.path.join(opts.folder.output,
                                             "frame_data.csv"),
                       "--output", os.path.join(opts.folder.output, "plots")])
            for name in ("timing_stacked.png",):
                p = os.path.join(opts.folder.output, "plots", name)
                if os.path.exists(p):
                    timing_pngs.append(os.path.join("plots", name))
        except Exception as e:  # plots are garnish; overlays are the product
            print(f"viz: timing plots skipped ({e})")
        report = export_viz_report(opts.folder.output, viz_entries,
                                   timing_pngs)
        print(f"viz: {len(viz_entries)} keyframe overlay pairs -> {report}")
    if args.save_vocab and system is not None and system.vocab is not None:
        from zenslam_tpu.backend.bow import save_vocabulary

        save_vocabulary(args.save_vocab, system.vocab)
        print(f"vocabulary saved: {args.save_vocab}")
    if args.options_file:
        save_options(opts, os.path.join(opts.folder.output, "effective_options.yaml"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
