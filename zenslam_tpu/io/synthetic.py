"""Synthetic stereo scene generation for tests, demos, and benchmarks.

The reference is evaluated on TUM-VI/EuRoC datasets which are not available in
this environment (zero egress); this module renders a controllable substitute:
a textured two-plane "corridor" world viewed by a moving stereo rig, with
exact groundtruth poses and landmark depths. Test strategy parity: the
reference's synthetic-geometry round-trips (`zenslam_tests.cpp:306-499`)
extended to full image rendering so detection/LK/matching run on real pixels.

Rendering model: each world plane carries a smooth random texture; images are
formed by inverse-warping the plane texture through the plane-induced
homography for each camera pose — no external renderer needed, exact GT.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from zenslam_tpu.geometry.camera import PinholeCamera, StereoRig

import jax.numpy as jnp


def smooth_texture(rng: np.random.Generator, h: int, w: int, octaves: int = 7,
                   roughness: float = 0.65) -> np.ndarray:
    """Multi-octave random texture in [0,1], float32 (h, w).

    The spectrum must carry real energy at FINE scales: with only low-frequency
    content, LK windows hit the aperture problem (gradients locally 1-D) and
    slide consistently in both directions — sub-pixel disparity errors of
    several px that the fwd-bwd check cannot catch. roughness≈0.65 keeps
    per-octave energy decaying slowly enough that corners are sharp.
    """
    tex = np.zeros((h, w), np.float32)
    for o in range(octaves):
        shift = max(octaves - 1 - o, 0)
        hs, ws = max(2, h >> shift), max(2, w >> shift)
        coarse = rng.standard_normal((hs, ws)).astype(np.float32)
        # bilinear upsample to (h, w)
        yi = np.linspace(0, hs - 1, h, dtype=np.float32)
        xi = np.linspace(0, ws - 1, w, dtype=np.float32)
        y0 = np.clip(yi.astype(np.int32), 0, hs - 2)
        x0 = np.clip(xi.astype(np.int32), 0, ws - 2)
        fy = (yi - y0)[:, None]
        fx = (xi - x0)[None, :]
        up = (
            coarse[y0][:, x0] * (1 - fy) * (1 - fx)
            + coarse[y0][:, x0 + 1] * (1 - fy) * fx
            + coarse[y0 + 1][:, x0] * fy * (1 - fx)
            + coarse[y0 + 1][:, x0 + 1] * fy * fx
        )
        tex += up * (roughness ** (octaves - 1 - o))
    tex -= tex.min()
    tex /= max(tex.max(), 1e-6)
    return tex.astype(np.float32)


class PlaneWorld(NamedTuple):
    """Textured planes: n·X = d (plane normal n, offset d) with a texture
    anchored by in-plane axes (u_axis, v_axis, origin)."""

    normals: np.ndarray    # (P, 3)
    offsets: np.ndarray    # (P,)
    origins: np.ndarray    # (P, 3)
    u_axes: np.ndarray     # (P, 3) texture-u direction (unit)
    v_axes: np.ndarray     # (P, 3)
    textures: np.ndarray   # (P, TH, TW)
    tex_scale: float       # pixels per meter in texture space


def make_corridor_world(rng: np.random.Generator, tex_size: int = 1024,
                        with_lines: bool = False) -> PlaneWorld:
    """A corridor the camera flies through: end wall (z=6), floor (y=+1.5,
    y-down convention), ceiling (y=-1.2) — depths 1.2-6 m, a good range for
    an 0.11 m baseline. Plane equation: n·X + d = 0 with d = -n·p.

    with_lines=True overlays high-contrast stripes on the plane textures
    (plank seams / wall edges) that project as true 3D line segments — the
    synthetic workload for the keyline subsystem."""
    textures = np.stack([smooth_texture(rng, tex_size, tex_size) for _ in range(3)])
    if with_lines:
        for p in range(3):
            tex = textures[p]
            for _ in range(6):
                pos = int(rng.uniform(40, tex_size - 40))
                val = 0.0 if rng.random() < 0.5 else 1.0
                if rng.random() < 0.5:
                    tex[pos : pos + 4, :] = val
                else:
                    tex[:, pos : pos + 4] = val
    normals = np.array(
        [[0.0, 0.0, 1.0],   # end wall z = 6
         [0.0, 1.0, 0.0],   # floor   y = +1.5
         [0.0, 1.0, 0.0]],  # ceiling y = -1.2
        np.float32,
    )
    points = np.array([[0, 0, 6.0], [0, 1.5, 0], [0, -1.2, 0]], np.float32)
    offsets = -np.einsum("pi,pi->p", normals, points).astype(np.float32)
    origins = points
    u_axes = np.array([[1, 0, 0], [1, 0, 0], [1, 0, 0]], np.float32)
    v_axes = np.array([[0, 1, 0], [0, 0, 1], [0, 0, 1]], np.float32)
    return PlaneWorld(normals, offsets, origins, u_axes, v_axes, textures, tex_scale=96.0)


def make_room_world(rng: np.random.Generator, tex_size: int = 1024,
                    half: float = 3.0) -> PlaneWorld:
    """A closed room (4 walls + floor + ceiling), each plane with its own
    texture — the world for loop-closure trajectories: an orbit inside the
    room revisits its starting view after a full revolution."""
    textures = np.stack([smooth_texture(rng, tex_size, tex_size) for _ in range(6)])
    normals = np.array(
        [[1.0, 0, 0], [1.0, 0, 0],    # walls x = ±half
         [0, 0, 1.0], [0, 0, 1.0],    # walls z = ±half
         [0, 1.0, 0], [0, 1.0, 0]],   # floor y=+1.5, ceiling y=-1.2
        np.float32)
    points = np.array(
        [[half, 0, 0], [-half, 0, 0],
         [0, 0, half], [0, 0, -half],
         [0, 1.5, 0], [0, -1.2, 0]], np.float32)
    offsets = -np.einsum("pi,pi->p", normals, points).astype(np.float32)
    u_axes = np.array(
        [[0, 0, 1], [0, 0, 1],
         [1, 0, 0], [1, 0, 0],
         [1, 0, 0], [1, 0, 0]], np.float32)
    v_axes = np.array(
        [[0, 1, 0], [0, 1, 0],
         [0, 1, 0], [0, 1, 0],
         [0, 0, 1], [0, 0, 1]], np.float32)
    return PlaneWorld(normals, offsets, points, u_axes, v_axes, textures,
                      tex_scale=96.0)


def render_view(world: PlaneWorld, cam: PinholeCamera, R_cw: np.ndarray, t_cw: np.ndarray,
                height: int, width: int, rays_cam: np.ndarray = None) -> np.ndarray:
    """Render one camera view by ray-plane intersection + texture lookup.

    Host-side numpy (data generation is host work, ≡ the reference's disk
    reader thread); returns float32 (H, W) in [0,1].

    rays_cam: optional (H, W, 3) per-pixel camera-frame ray directions —
    pass the UNDISTORTED rays of a distorted camera model to render through
    a real (e.g. EuRoC radtan) lens; default is the pinhole grid.
    """
    fx, fy, cx, cy = float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)
    R_wc = R_cw.T
    c = -R_wc @ t_cw  # camera center in world
    if rays_cam is None:
        u, v = np.meshgrid(np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32))
        rays_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], axis=-1)
    rays_w = rays_cam @ R_wc.T  # (H, W, 3)

    img = np.zeros((height, width), np.float32)
    depth = np.full((height, width), np.inf, np.float32)
    for p in range(world.normals.shape[0]):
        n = world.normals[p]
        d = world.offsets[p]
        denom = rays_w @ n
        denom = np.where(np.abs(denom) < 1e-9, 1e-9, denom)
        tval = -(c @ n + d) / denom
        X = c[None, None, :] + tval[..., None] * rays_w  # (H, W, 3)
        z_cam = tval  # ray parameter ∝ depth along ray; use for z-buffer
        hit = tval > 0.1
        rel = X - world.origins[p]
        tu = (rel @ world.u_axes[p]) * world.tex_scale
        tv = (rel @ world.v_axes[p]) * world.tex_scale
        TH, TW = world.textures[p].shape
        tui = np.mod(tu, TW - 1)
        tvi = np.mod(tv, TH - 1)
        x0 = tui.astype(np.int32)
        y0 = tvi.astype(np.int32)
        fxw = tui - x0
        fyw = tvi - y0
        tex = world.textures[p]
        val = (
            tex[y0, x0] * (1 - fxw) * (1 - fyw)
            + tex[y0, np.minimum(x0 + 1, TW - 1)] * fxw * (1 - fyw)
            + tex[np.minimum(y0 + 1, TH - 1), x0] * (1 - fxw) * fyw
            + tex[np.minimum(y0 + 1, TH - 1), np.minimum(x0 + 1, TW - 1)] * fxw * fyw
        )
        closer = hit & (z_cam < depth)
        img = np.where(closer, val, img)
        depth = np.where(closer, z_cam, depth)
    return img


import functools as _functools

import jax as _jax


@_functools.partial(_jax.jit, static_argnames=("height", "width"))
def _render_view_device(world_arrays, fx, fy, cx, cy, R_cw, t_cw,
                        height: int, width: int):
    """Device (JAX) version of render_view — identical ray-plane math, run on
    the accelerator so multi-hundred-frame 1024² benchmark sequences render in
    seconds instead of minutes. Returns (H, W) float32."""
    normals, offsets, origins, u_axes, v_axes, textures, tex_scale = world_arrays
    R_wc = R_cw.T
    c = -R_wc @ t_cw
    u, v = jnp.meshgrid(jnp.arange(width, dtype=jnp.float32),
                        jnp.arange(height, dtype=jnp.float32))
    rays_cam = jnp.stack([(u - cx) / fx, (v - cy) / fy, jnp.ones_like(u)], axis=-1)
    rays_w = rays_cam @ R_wc.T

    img = jnp.zeros((height, width), jnp.float32)
    depth = jnp.full((height, width), jnp.inf, jnp.float32)
    P = normals.shape[0]
    TH, TW = textures.shape[1], textures.shape[2]
    for p in range(P):
        n = normals[p]
        d = offsets[p]
        denom = rays_w @ n
        denom = jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
        tval = -(c @ n + d) / denom
        X = c[None, None, :] + tval[..., None] * rays_w
        hit = tval > 0.1
        rel = X - origins[p]
        tu = (rel @ u_axes[p]) * tex_scale
        tv = (rel @ v_axes[p]) * tex_scale
        tui = jnp.mod(tu, TW - 1)
        tvi = jnp.mod(tv, TH - 1)
        x0 = tui.astype(jnp.int32)
        y0 = tvi.astype(jnp.int32)
        fxw = tui - x0
        fyw = tvi - y0
        tex = textures[p]
        val = (
            tex[y0, x0] * (1 - fxw) * (1 - fyw)
            + tex[y0, jnp.minimum(x0 + 1, TW - 1)] * fxw * (1 - fyw)
            + tex[jnp.minimum(y0 + 1, TH - 1), x0] * (1 - fxw) * fyw
            + tex[jnp.minimum(y0 + 1, TH - 1), jnp.minimum(x0 + 1, TW - 1)] * fxw * fyw
        )
        closer = hit & (tval < depth)
        img = jnp.where(closer, val, img)
        depth = jnp.where(closer, tval, depth)
    return img


def render_view_device(world: PlaneWorld, cam: PinholeCamera, R_cw, t_cw,
                       height: int, width: int):
    """Device-rendered view (see _render_view_device)."""
    wa = (jnp.asarray(world.normals), jnp.asarray(world.offsets),
          jnp.asarray(world.origins), jnp.asarray(world.u_axes),
          jnp.asarray(world.v_axes), jnp.asarray(world.textures),
          jnp.float32(world.tex_scale))
    return _render_view_device(
        wa, jnp.float32(cam.fx), jnp.float32(cam.fy), jnp.float32(cam.cx),
        jnp.float32(cam.cy), jnp.asarray(R_cw, jnp.float32),
        jnp.asarray(t_cw, jnp.float32), height, width)


def default_rig(width: int = 512, height: int = 384) -> StereoRig:
    """EuRoC-like stereo rig (rectified pinhole, 0.11 m baseline)."""
    cam = PinholeCamera(
        fx=jnp.float32(380.0), fy=jnp.float32(380.0),
        cx=jnp.float32(width / 2.0), cy=jnp.float32(height / 2.0),
        dist=jnp.zeros(4, jnp.float32), width=width, height=height,
    )
    return StereoRig(
        left=cam, right=cam,
        R_rl=jnp.eye(3, dtype=jnp.float32),
        t_rl=jnp.array([-0.11, 0.0, 0.0], jnp.float32),
        R_ci=jnp.eye(3, dtype=jnp.float32),
        t_ci=jnp.zeros(3, jnp.float32),
    )


class SyntheticSequence(NamedTuple):
    left: np.ndarray        # (T, H, W) float32
    right: np.ndarray       # (T, H, W) float32
    R_lw: np.ndarray        # (T, 3, 3) world->left-cam
    t_lw: np.ndarray        # (T, 3)
    timestamps: np.ndarray  # (T,) seconds
    rig: StereoRig
    # IMU (present when make_sequence(with_imu=True); body frame = left cam):
    gyro: np.ndarray = None      # (T, S, 3) rad/s
    accel: np.ndarray = None     # (T, S, 3) m/s² specific force
    imu_dts: np.ndarray = None   # (T, S) seconds
    imu_mask: np.ndarray = None  # (T, S) bool (frame 0 all-False)
    gravity_w: np.ndarray = None # (3,) true gravity in world frame


def _np_so3_log(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> axis-angle vector (numpy, float64)."""
    c = np.clip((np.trace(R) - 1.0) / 2.0, -1.0, 1.0)
    theta = np.arccos(c)
    w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
    s = 2.0 * np.sin(theta)
    if theta < 1e-8:
        return 0.5 * w
    return (theta / s) * w


def make_imu(
    pose_fn,
    timestamps: np.ndarray,
    samples_per_frame: int = 10,
    gravity_w=(0.0, 9.81, 0.0),
    rng: np.random.Generator | None = None,
    gyro_noise: float = 0.0,
    accel_noise: float = 0.0,
):
    """Synthesize body-frame IMU from a continuous pose trajectory.

    ≡ the role of the dataset IMU stream sliced per frame interval by
    `folder_reader.cpp:130-202`. pose_fn(t) -> (R_cw, t_cw) world->cam
    (float64); body = left camera (rig.R_ci = I). Gyro/accel are exact
    numerical derivatives of the trajectory; the accelerometer measures
    specific force f_b = R_bw (a_w - g_w).

    Returns (gyro (T,S,3), accel (T,S,3), dts (T,S), mask (T,S)) float32.
    """
    g_w = np.asarray(gravity_w, np.float64)
    T = len(timestamps)
    S = samples_per_frame
    gyro = np.zeros((T, S, 3), np.float64)
    accel = np.zeros((T, S, 3), np.float64)
    dts = np.zeros((T, S), np.float64)
    mask = np.zeros((T, S), bool)
    eps = 1e-4

    def body_pose(t):
        R_cw, t_cw = pose_fn(t)
        R_wb = R_cw.T            # body = cam; R_wb = R_wc
        p_w = -R_cw.T @ t_cw     # camera center in world
        return R_wb, p_w

    for k in range(1, T):
        t0, t1 = timestamps[k - 1], timestamps[k]
        h = (t1 - t0) / S
        for j in range(S):
            tm = t0 + (j + 0.5) * h  # interval midpoint
            R0, _ = body_pose(tm - eps / 2)
            R1, _ = body_pose(tm + eps / 2)
            w_b = _np_so3_log(R0.T @ R1) / eps
            _, pm = body_pose(tm)
            _, pa = body_pose(tm - eps)
            _, pb = body_pose(tm + eps)
            a_w = (pb - 2.0 * pm + pa) / (eps * eps)
            R_wb, _ = body_pose(tm)
            f_b = R_wb.T @ (a_w - g_w)
            gyro[k, j] = w_b
            accel[k, j] = f_b
            dts[k, j] = h
            mask[k, j] = True
    if rng is not None and (gyro_noise > 0 or accel_noise > 0):
        gyro += rng.normal(0, gyro_noise, gyro.shape)
        accel += rng.normal(0, accel_noise, accel.shape)
    return (gyro.astype(np.float32), accel.astype(np.float32),
            dts.astype(np.float32), mask)


def make_sequence(
    rng: np.random.Generator,
    n_frames: int = 20,
    width: int = 512,
    height: int = 384,
    motion: str = "strafe",
    dt: float = 0.05,
    speed: float = 0.4,
    with_lines: bool = False,
    with_imu: bool = False,
    imu_samples_per_frame: int = 10,
    gravity_w=(0.0, 9.81, 0.0),
    device_render: bool = False,
    pixel_noise: float = 0.0,
    orbit_radius: float = 1.5,
    orbit_revolutions: float = 1.0,
    exposure_jitter: float = 0.0,
    vignette: float = 0.0,
) -> SyntheticSequence:
    """Render a stereo sequence with known groundtruth.

    motion: 'strafe' (x translation), 'forward' (z), 'arc' (translation +
    yaw), 'orbit' (full revolution inside a closed room — REVISITS the
    starting view at the end: the loop-closure workload).
    with_imu: also synthesize body-frame IMU samples per frame interval
    (body = left camera; ≡ the dataset IMU stream the reference slices per
    frame, `folder_reader.cpp:130-202`).
    device_render: render on the JAX device (same math; use for long/large
    benchmark sequences — host rendering of 1024² frames takes seconds each).
    pixel_noise: additive Gaussian image noise σ (drives realistic VO drift).

    Sensor-realism knobs (the photometric effects a real auto-exposure
    global-shutter stereo rig exhibits — the 'hard' full-dress config):
    exposure_jitter: per-frame, PER-CAMERA multiplicative gain σ (log-space)
      — models exposure flicker; stresses CLAHE and descriptor matching.
    vignette: radial intensity falloff at the image corners (0..1) — models
      lens shading; breaks the brightness-constancy assumption off-center.
    """
    if motion == "orbit":
        world = make_room_world(rng)
    else:
        world = make_corridor_world(rng, with_lines=with_lines)
    rig = default_rig(width, height)
    R_rl = np.asarray(rig.R_rl, np.float64)
    t_rl = np.asarray(rig.t_rl, np.float64)

    def _np_so3_exp(w):
        th = np.linalg.norm(w)
        if th < 1e-12:
            return np.eye(3)
        k = w / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0.0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)

    def pose_fn(t: float):
        """Continuous trajectory (float64): returns (R_cw, t_cw)."""
        s = t * speed
        i_cont = t / dt
        if motion == "strafe":
            c_w = np.array([s, 0.0, 0.0])
            R_wc = np.eye(3)
        elif motion == "forward":
            c_w = np.array([0.0, 0.0, s])
            R_wc = np.eye(3)
        elif motion == "orbit":
            # `orbit_revolutions` revolutions over the sequence, camera
            # looking radially outward at the room walls; one revolution
            # closes the loop once (frame T-1 ≈ frame 0), >1 revisits every
            # view once per extra revolution — the place-recognition
            # precision/recall workload
            theta = 2.0 * np.pi * orbit_revolutions * t / (n_frames * dt)
            c_w = orbit_radius * np.array([np.sin(theta), 0.0, np.cos(theta)])
            R_wc = _np_so3_exp(np.array([0.0, theta, 0.0]))
        else:  # arc
            yaw = 0.2 * t
            R_wc = _np_so3_exp(np.array([0.0, yaw, 0.0]))
            c_w = np.array([s, 0.02 * np.sin(0.5 * i_cont), 0.3 * s])
        R_cw = R_wc.T
        t_cw = -R_cw @ c_w
        return R_cw, t_cw

    timestamps = np.arange(n_frames, dtype=np.float64) * dt
    render = (
        (lambda w, c, R, t, h, ww: np.asarray(render_view_device(w, c, R, t, h, ww)))
        if device_render else render_view)
    vig_map = None
    if vignette > 0:
        yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
        r2 = (((xx - width / 2) / (width / 2)) ** 2
              + ((yy - height / 2) / (height / 2)) ** 2) / 2.0
        vig_map = (1.0 - vignette * r2).astype(np.float32)
    lefts, rights, Rs, ts = [], [], [], []
    for i in range(n_frames):
        R_cw, t_cw = pose_fn(timestamps[i])
        R_rcw = R_rl @ R_cw
        t_rcw = R_rl @ t_cw + t_rl
        li = render(world, rig.left, R_cw, t_cw, height, width)
        ri = render(world, rig.right, R_rcw, t_rcw, height, width)
        if vig_map is not None:
            li = li * vig_map
            ri = ri * vig_map
        if exposure_jitter > 0:
            # independent per-camera log-gain flicker
            li = li * np.exp(rng.normal(0, exposure_jitter))
            ri = ri * np.exp(rng.normal(0, exposure_jitter))
        if pixel_noise > 0:
            li = li + rng.normal(0, pixel_noise, li.shape)
            ri = ri + rng.normal(0, pixel_noise, ri.shape)
        if vignette > 0 or exposure_jitter > 0 or pixel_noise > 0:
            li = np.clip(li, 0, 1).astype(np.float32)
            ri = np.clip(ri, 0, 1).astype(np.float32)
        lefts.append(li)
        rights.append(ri)
        Rs.append(R_cw.astype(np.float32))
        ts.append(t_cw.astype(np.float32))

    imu = {}
    if with_imu:
        gyro, accel, imu_dts, imu_mask = make_imu(
            pose_fn, timestamps, imu_samples_per_frame, gravity_w)
        imu = dict(gyro=gyro, accel=accel, imu_dts=imu_dts, imu_mask=imu_mask,
                   gravity_w=np.asarray(gravity_w, np.float32))
    return SyntheticSequence(
        left=np.stack(lefts),
        right=np.stack(rights),
        R_lw=np.stack(Rs),
        t_lw=np.stack(ts),
        timestamps=timestamps,
        rig=rig,
        **imu,
    )


def distort_sequence(seq: "SyntheticSequence", dist, model: str = "radtan"
                     ) -> "SyntheticSequence":
    """Produce the RAW (lens-distorted) version of an ideal pinhole-rendered
    sequence: RAW(p_d) = Ideal(K·undistort(K⁻¹·p_d)). Feeding these through
    the calibration/rectification path must reproduce the ideal geometry —
    the full-dress end-to-end exercise of `calibration.cpp:33-240`."""
    from zenslam_tpu.geometry.camera import (
        undistort_points_radtan, undistort_points_equidistant)
    from zenslam_tpu.ops.image import remap

    cam = seq.rig.left
    H, W = seq.left.shape[1:]
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    nd = np.stack([(u - float(cam.cx)) / float(cam.fx),
                   (v - float(cam.cy)) / float(cam.fy)], -1).reshape(-1, 2)
    undist = (undistort_points_radtan if model == "radtan"
              else undistort_points_equidistant)
    nu = np.asarray(undist(jnp.asarray(dist, jnp.float32), jnp.asarray(nd)))
    mx = (nu[:, 0] * float(cam.fx) + float(cam.cx)).reshape(H, W)
    my = (nu[:, 1] * float(cam.fy) + float(cam.cy)).reshape(H, W)
    mxj, myj = jnp.asarray(mx), jnp.asarray(my)
    lefts = np.stack([np.asarray(remap(jnp.asarray(f), mxj, myj))
                      for f in seq.left])
    rights = np.stack([np.asarray(remap(jnp.asarray(f), mxj, myj))
                       for f in seq.right])
    return seq._replace(left=lefts, right=rights)


def write_kalibr_yaml(seq: "SyntheticSequence", dist, path: str,
                      model: str = "radtan") -> None:
    """Emit a Kalibr camchain YAML describing the (distorted) synthetic rig
    — consumed by `io.calibration.load_kalibr_yaml` in the app."""
    import yaml

    cam = seq.rig.left
    H, W = seq.left.shape[1:]
    T_rl = np.eye(4)
    T_rl[:3, :3] = np.asarray(seq.rig.R_rl)
    T_rl[:3, 3] = np.asarray(seq.rig.t_rl)
    entry = {
        "camera_model": "pinhole",
        "intrinsics": [float(cam.fx), float(cam.fy), float(cam.cx), float(cam.cy)],
        "distortion_model": model,
        "distortion_coeffs": [float(x) for x in dist],
        "resolution": [int(W), int(H)],
    }
    d = {
        "cam0": dict(entry, T_cam_imu=np.eye(4).tolist()),
        "cam1": dict(entry, T_cn_cnm1=T_rl.tolist()),
    }
    with open(path, "w") as f:
        yaml.safe_dump(d, f)


def write_png_gray(path: str, img: np.ndarray) -> None:
    """Minimal grayscale PNG writer (zlib): 8/16-bit, filter 0."""
    import struct
    import zlib

    h, w = img.shape
    depth = 16 if img.dtype == np.uint16 else 8

    def chunk(tag, body):
        out = struct.pack(">I", len(body)) + tag + body
        return out + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    raw = b""
    for y in range(h):
        row = img[y]
        raw += b"\x00" + (row.astype(">u2") if depth == 16 else row.astype(np.uint8)).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, 0, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    with open(path, "wb") as f:
        f.write(data)


def export_dataset(seq: "SyntheticSequence", root: str) -> None:
    """Write a SyntheticSequence as an EuRoC-style folder dataset (PNG images
    with nanosecond filenames + groundtruth CSV + imu0/data.csv when the
    sequence carries IMU) for end-to-end app runs."""
    import os

    os.makedirs(os.path.join(root, "cam0/data"), exist_ok=True)
    os.makedirs(os.path.join(root, "cam1/data"), exist_ok=True)
    t0_ns = 1_000_000_000
    gt_rows = []
    for i in range(seq.left.shape[0]):
        ns = int(seq.timestamps[i] * 1e9) + t0_ns
        l8 = np.clip(seq.left[i] * 255.0, 0, 255).astype(np.uint8)
        r8 = np.clip(seq.right[i] * 255.0, 0, 255).astype(np.uint8)
        write_png_gray(os.path.join(root, f"cam0/data/{ns}.png"), l8)
        write_png_gray(os.path.join(root, f"cam1/data/{ns}.png"), r8)
        R = seq.R_lw[i]
        c = -R.T @ seq.t_lw[i]
        from zenslam_tpu.geometry.lie import rotmat_to_quat
        import jax.numpy as _jnp
        q = np.asarray(rotmat_to_quat(_jnp.asarray(R.T)))  # R_wc quaternion
        gt_rows.append([ns, c[0], c[1], c[2], q[0], q[1], q[2], q[3]])
    np.savetxt(os.path.join(root, "groundtruth.csv"), np.asarray(gt_rows), delimiter=",")
    if seq.gyro is not None:
        # EuRoC imu0/data.csv: ns, wx, wy, wz, ax, ay, az. Sample k of frame
        # interval i ends at cumulative dt into the interval.
        os.makedirs(os.path.join(root, "imu0"), exist_ok=True)
        rows = []
        for i in range(seq.left.shape[0]):
            t_start = seq.timestamps[i - 1] if i else seq.timestamps[0]
            acc = t_start
            for k in range(seq.gyro.shape[1]):
                if not seq.imu_mask[i, k]:
                    continue
                acc += float(seq.imu_dts[i, k])
                ns = int(acc * 1e9) + t0_ns
                rows.append([ns, *seq.gyro[i, k], *seq.accel[i, k]])
        np.savetxt(os.path.join(root, "imu0/data.csv"), np.asarray(rows),
                   delimiter=",", fmt=["%d"] + ["%.9f"] * 6)


def distorted_camera_rays(cam: PinholeCamera, model: str = "radtan") -> np.ndarray:
    """Per-pixel camera-frame ray directions of a DISTORTED camera.

    For each pixel of the real (distorted) image, invert the projection:
    normalized-distorted -> normalized-undistorted -> ray [x, y, 1].
    ≡ the geometry cv::initUndistortRectifyMap inverts
    (`calibration.cpp:144-240`); used to render synthetic imagery through a
    real camchain (EuRoC radtan) for the rectification-path e2e."""
    import jax.numpy as jnp

    from zenslam_tpu.geometry.camera import undistort_points_radtan

    if model not in ("radtan",):
        raise NotImplementedError(f"distorted rendering for model {model!r}")
    H, W = int(cam.height), int(cam.width)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    u, v = np.meshgrid(np.arange(W, dtype=np.float32),
                       np.arange(H, dtype=np.float32))
    xd = np.stack([(u - cx) / fx, (v - cy) / fy], axis=-1).reshape(-1, 2)
    xu = np.asarray(undistort_points_radtan(cam.dist, jnp.asarray(xd)))
    rays = np.concatenate([xu, np.ones((xu.shape[0], 1), np.float32)],
                          axis=-1)
    return rays.reshape(H, W, 3)


def make_distorted_sequence(
    rng: np.random.Generator,
    rig_raw: StereoRig,
    models=("radtan", "radtan"),
    n_frames: int = 12,
    motion: str = "strafe",
    dt: float = 0.1,
    speed: float = 0.25,
    pixel_noise: float = 0.0,
) -> SyntheticSequence:
    """Render a stereo sequence through a REAL (distorted) camchain rig —
    e.g. the shipped EuRoC calibration (`options/euroc_camchain.yaml`).

    The returned images are in the DISTORTED camera geometry, so an app run
    with `folder.calibration_file` pointing at the same camchain exercises
    the full rectification path (`calibration.cpp:33-240` parity) before the
    tracker ever sees a pixel. Groundtruth poses are the left camera's.
    """
    world = make_corridor_world(rng)
    H, W = int(rig_raw.left.height), int(rig_raw.left.width)
    rays_l = distorted_camera_rays(rig_raw.left, models[0])
    rays_r = distorted_camera_rays(rig_raw.right, models[1])
    R_rl = np.asarray(rig_raw.R_rl, np.float64)
    t_rl = np.asarray(rig_raw.t_rl, np.float64)

    timestamps = np.arange(n_frames, dtype=np.float64) * dt
    lefts, rights, Rs, ts = [], [], [], []
    for i in range(n_frames):
        s = timestamps[i] * speed
        if motion == "strafe":
            c_w = np.array([s, 0.0, 0.0])
            R_wc = np.eye(3)
        else:  # slow forward arc
            c_w = np.array([0.6 * s, 0.0, 0.4 * s])
            R_wc = np.eye(3)
        R_cw = R_wc.T
        t_cw = -R_cw @ c_w
        R_rcw = R_rl @ R_cw
        t_rcw = R_rl @ t_cw + t_rl
        li = render_view(world, rig_raw.left, R_cw, t_cw, H, W,
                         rays_cam=rays_l)
        ri = render_view(world, rig_raw.right, R_rcw, t_rcw, H, W,
                         rays_cam=rays_r)
        if pixel_noise > 0:
            li = np.clip(li + rng.normal(0, pixel_noise, li.shape), 0, 1)
            ri = np.clip(ri + rng.normal(0, pixel_noise, ri.shape), 0, 1)
        lefts.append(li.astype(np.float32))
        rights.append(ri.astype(np.float32))
        Rs.append(R_cw.astype(np.float32))
        ts.append(t_cw.astype(np.float32))
    return SyntheticSequence(
        left=np.stack(lefts), right=np.stack(rights),
        R_lw=np.stack(Rs), t_lw=np.stack(ts),
        timestamps=timestamps, rig=rig_raw,
    )
