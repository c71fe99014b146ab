"""Dataset reading: EuRoC/TUM-VI-style stereo folders + IMU CSV + groundtruth.

Parity targets:
- `folder_reader`: sorted stereo image dirs, filename-nanosecond timestamps ×
  timescale, per-frame IMU interval slicing (`io/folder_reader.cpp:130-202`)
- `groundtruth`: CSV poses + SLERP interpolation (`io/groundtruth.cpp:7-51`)
- skip/take frame windowing (`reader_thread.h:39-72`)

Image decode uses the native C++ loader (zenslam_tpu.native) when built,
falling back to pure-python PGM/NPY decoding. PNG requires the native path
(zlib inflate lives there — no imageio in this environment).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator, NamedTuple, Optional

import numpy as np

from zenslam_tpu.geometry.lie import quat_slerp, quat_to_rotmat

import jax.numpy as jnp


class StereoFrame(NamedTuple):
    timestamp: float         # seconds
    left: np.ndarray         # (H, W) float32 [0,1]
    right: np.ndarray
    imu_gyro: np.ndarray     # (S, 3) samples in (prev, current]
    imu_accel: np.ndarray    # (S, 3)
    imu_dt: np.ndarray       # (S,)
    imu_mask: np.ndarray     # (S,) bool


def _decode_image(path: str) -> np.ndarray:
    """Decode PGM/PNG/NPY to float32 [0,1] grayscale."""
    if path.endswith(".npy"):
        img = np.load(path)
    elif path.endswith(".pgm"):
        img = _read_pgm(path)
    elif path.endswith(".png"):
        from zenslam_tpu.native import loader as native_loader

        img = native_loader.decode_png_gray(path)
    else:
        raise ValueError(f"unsupported image format: {path}")
    if img.dtype == np.uint8:
        return img.astype(np.float32) / 255.0
    if img.dtype == np.uint16:
        return img.astype(np.float32) / 65535.0
    return img.astype(np.float32)


def _read_pgm(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    # P5 binary PGM
    parts = data.split(b"\n", 3)
    assert parts[0].strip() == b"P5", "only binary PGM supported"
    # handle comments
    idx = 1
    dims = []
    rest = data[len(parts[0]) + 1 :]
    tokens = []
    pos = 0
    while len(tokens) < 3:
        nl = rest.index(b"\n", pos)
        line = rest[pos:nl].strip()
        pos = nl + 1
        if line.startswith(b"#"):
            continue
        tokens += line.split()
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    raw = rest[pos : pos + w * h * (2 if maxval > 255 else 1)]
    dt = np.uint16 if maxval > 255 else np.uint8
    img = np.frombuffer(raw, dtype=dt)
    if maxval > 255:
        img = img.byteswap()  # PGM is big-endian
    return img.reshape(h, w)


@dataclass
class FolderReader:
    """EuRoC mav0-style layout:
      root/cam0/data/<ns>.png, root/cam1/data/<ns>.png,
      root/imu0/data.csv (ns, wx, wy, wz, ax, ay, az)
    ≡ folder_options (root/left/right/imu_file/timescale/skip/take).
    """

    root: str
    left_dir: str = "cam0/data"
    right_dir: str = "cam1/data"
    imu_file: str = "imu0/data.csv"
    timescale: float = 1e-9
    skip_frames: int = 0
    take_frames: int = 0       # 0 = all
    max_imu_per_frame: int = 64

    def _list(self, sub: str):
        d = os.path.join(self.root, sub)
        out = []
        for n in os.listdir(d):
            stem = n.rsplit(".", 1)[0]
            try:
                ts = int(stem) * self.timescale
            except ValueError:
                continue
            out.append((ts, os.path.join(d, n)))
        # sort by NUMERIC timestamp, never by filename: lexicographic order
        # breaks the moment stamps cross a digit boundary (e.g. 9.95 s →
        # 10.0 s in ns names), which silently shuffles the sequence in time
        # (real EuRoC zero-pads to 19 digits, arbitrary exports don't)
        out.sort(key=lambda p: p[0])
        return out

    def has_imu(self) -> bool:
        """Whether the dataset carries an IMU stream (enables the app's VIO
        branch, ≡ the reference always preintegrating when imu data exists,
        `processor.cpp:57-63`)."""
        return os.path.exists(os.path.join(self.root, self.imu_file))

    def _load_imu(self):
        path = os.path.join(self.root, self.imu_file)
        if not os.path.exists(path):
            return None
        rows = np.loadtxt(path, delimiter=",", comments="#", ndmin=2)
        ts = rows[:, 0] * self.timescale
        return ts, rows[:, 1:4].astype(np.float32), rows[:, 4:7].astype(np.float32)

    def frame_index(self):
        """Paired (timestamp, left_path, right_path) list after skip/take
        windowing (≡ folder_reader's sorted pairing, filename-ns stamps)."""
        left = self._list(self.left_dir)
        right = self._list(self.right_dir)
        # pair by timestamp (EuRoC: identical ns stamps)
        rmap = {round(ts, 6): p for ts, p in right}
        pairs = [(ts, lp, rmap[round(ts, 6)]) for ts, lp in left if round(ts, 6) in rmap]
        pairs = pairs[self.skip_frames :]
        if self.take_frames:
            pairs = pairs[: self.take_frames]
        return pairs

    def _imu_slice(self, imu, prev_ts, ts):
        """Fixed-capacity IMU slice of the (prev_ts, ts] interval
        (≡ `folder_reader.cpp:130-202`)."""
        S = self.max_imu_per_frame
        g = np.zeros((S, 3), np.float32)
        a = np.zeros((S, 3), np.float32)
        dt = np.zeros(S, np.float32)
        m = np.zeros(S, bool)
        if imu is not None:
            its, gyro, accel = imu
            sel = np.flatnonzero((its > prev_ts) & (its <= ts))[:S]
            n = sel.size
            if n:
                g[:n] = gyro[sel]
                a[:n] = accel[sel]
                seg_ts = its[sel]
                dts = np.diff(np.concatenate([[prev_ts], seg_ts])).astype(np.float32)
                dt[:n] = dts
                m[:n] = True
        return g, a, dt, m

    def frames(self) -> Iterator[StereoFrame]:
        pairs = self.frame_index()
        imu = self._load_imu()
        prev_ts = pairs[0][0] if pairs else 0.0
        for ts, lp, rp in pairs:
            g, a, dt, m = self._imu_slice(imu, prev_ts, ts)
            yield StereoFrame(
                timestamp=ts,
                left=_decode_image(lp),
                right=_decode_image(rp),
                imu_gyro=g, imu_accel=a, imu_dt=dt, imu_mask=m,
            )
            prev_ts = ts

    def frames_prefetch(self, queue_cap: int = 4,
                        n_threads: int = 2) -> Iterator[StereoFrame]:
        """Like :meth:`frames` but image decode runs on NATIVE worker threads
        overlapping device compute (≡ the reference's reader_thread,
        `io/reader_thread.h:39-72`). Falls back to the serial path when the
        native library can't build or the images aren't PNG."""
        pairs = self.frame_index()
        if not pairs:
            return
        if not pairs[0][1].endswith(".png"):
            yield from self.frames()
            return
        try:
            from zenslam_tpu.native.loader import PrefetchReader

            first = _decode_image(pairs[0][1])
        except Exception:
            yield from self.frames()
            return
        H, W = first.shape
        imu = self._load_imu()
        ts_list = [p[0] for p in pairs]
        reader = PrefetchReader([p[1] for p in pairs], [p[2] for p in pairs],
                                width=W, height=H, queue_cap=queue_cap,
                                n_threads=n_threads)
        prev_ts = ts_list[0]
        for idx, l, r in reader:
            ts = ts_list[idx]
            g, a, dt, m = self._imu_slice(imu, prev_ts, ts)
            yield StereoFrame(timestamp=ts, left=l, right=r,
                              imu_gyro=g, imu_accel=a, imu_dt=dt, imu_mask=m)
            prev_ts = ts


class Groundtruth:
    """CSV pose file (ts, px py pz, qw qx qy qz ...) with SLERP interpolation
    ≡ `io/groundtruth.cpp:7-51`."""

    def __init__(self, path: str, timescale: float = 1e-9):
        rows = np.loadtxt(path, delimiter=",", comments="#", ndmin=2)
        self.ts = rows[:, 0] * timescale
        self.pos = rows[:, 1:4].astype(np.float64)
        self.quat = rows[:, 4:8].astype(np.float64)  # (w, x, y, z)

    def pose_at(self, t: float):
        """Interpolated (R_wb, p_wb) at time t (body pose in world)."""
        i = int(np.clip(np.searchsorted(self.ts, t), 1, len(self.ts) - 1))
        t0, t1 = self.ts[i - 1], self.ts[i]
        alpha = 0.0 if t1 <= t0 else float(np.clip((t - t0) / (t1 - t0), 0.0, 1.0))
        p = (1 - alpha) * self.pos[i - 1] + alpha * self.pos[i]
        q = quat_slerp(jnp.asarray(self.quat[i - 1], jnp.float32),
                       jnp.asarray(self.quat[i], jnp.float32), alpha)
        R = np.asarray(quat_to_rotmat(q))
        return R, p.astype(np.float32)
