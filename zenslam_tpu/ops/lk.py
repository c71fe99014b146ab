"""Batched pyramidal Lucas-Kanade optical flow (pure JAX → XLA; Pallas variant
is the planned hot-path upgrade).

Parity target: the reference's lone device kernel — the Metal iterative LK
compute shader (`zenslam_metal/source/pyr_lk_metal.mm:16-115`) and its CPU
fallback cv::calcOpticalFlowPyrLK (`tracking/pyr_lk.cpp:9-44`):
per-point 2x2 normal equations G from window gradients, Newton updates with
epsilon/margin/singularity exits, coarse-to-fine over pyramid levels,
OPTFLOW_USE_INITIAL_FLOW honored (the pose-predicted initial flow,
`keypoint_tracker.cpp:361-373`).

TPU-first: all N points solved simultaneously; each iteration is a batched
bilinear gather (N, W²) + VPU reductions. Fixed iteration count with masked
convergence (no data-dependent control flow under jit).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.ops.image import bilinear_sample, scharr_gradients


def _window_offsets(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (W², 2)


def _lk_single_level(prev_img, next_img, gx_img, gy_img, pts, flow, radius: int,
                     iters: int, eps: float, min_eig_threshold: float):
    """One pyramid level of LK for all points. Returns (flow, ok, err)."""
    H, W = prev_img.shape
    offs = _window_offsets(radius)  # (K, 2)
    win = pts[:, None, :] + offs[None, :, :]  # (N, K, 2)
    Ip = bilinear_sample(prev_img, win)
    gx = bilinear_sample(gx_img, win)
    gy = bilinear_sample(gy_img, win)

    # 2x2 spatial gradient (normal-equation) matrix per point
    gxx = jnp.sum(gx * gx, axis=-1)
    gxy = jnp.sum(gx * gy, axis=-1)
    gyy = jnp.sum(gy * gy, axis=-1)
    det = gxx * gyy - gxy * gxy
    trace = gxx + gyy
    # min eigenvalue of [[gxx, gxy], [gxy, gyy]] / window area (OpenCV convention)
    min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
    n_win = offs.shape[0]
    eig_ok = (min_eig / n_win) > min_eig_threshold
    det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    iG = (
        jnp.stack(
            [jnp.stack([gyy, -gxy], -1), jnp.stack([-gxy, gxx], -1)], -2
        )
        / det_safe[:, None, None]
    )  # (N, 2, 2)

    def body(_, carry):
        flow, converged = carry
        Jp = bilinear_sample(next_img, win + flow[:, None, :])
        e = Ip - Jp  # (N, K)
        bx = jnp.sum(e * gx, axis=-1)
        by = jnp.sum(e * gy, axis=-1)
        b = jnp.stack([bx, by], axis=-1)
        delta = jnp.einsum("nij,nj->ni", iG, b)
        step = jnp.where((converged | ~eig_ok)[:, None], 0.0, delta)
        flow = flow + step
        converged = converged | (jnp.sum(delta * delta, axis=-1) < eps * eps)
        return flow, converged

    flow, _ = jax.lax.fori_loop(0, iters, body, (flow, jnp.zeros(pts.shape[0], jnp.bool_)))

    # residual error (mean abs diff over window) for quality reporting
    Jp = bilinear_sample(next_img, win + flow[:, None, :])
    err = jnp.mean(jnp.abs(Ip - Jp), axis=-1)

    # in-bounds check at the tracked location (with margin ≡ Metal kernel's margin exit)
    tracked = pts + flow
    margin = 1.0
    in_bounds = (
        (tracked[:, 0] >= margin)
        & (tracked[:, 0] < W - margin)
        & (tracked[:, 1] >= margin)
        & (tracked[:, 1] < H - margin)
    )
    return flow, eig_ok & in_bounds, err


@functools.partial(
    jax.jit,
    static_argnames=("radius", "iters", "use_initial_flow"),
)
def pyramidal_lk(
    prev_pyramid,
    next_pyramid,
    pts,
    valid,
    init_pts=None,
    radius: int = 10,
    iters: int = 10,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-7,  # OpenCV's 1e-4 is for [0,255] images; ours are [0,1] (x255^2 scale)
    use_initial_flow: bool = False,
):
    """Track ``pts`` from prev to next image through a Gaussian pyramid.

    Args:
      prev_pyramid / next_pyramid: tuples of (H/2^l, W/2^l) float32 images
        (from ops.image.build_pyramid), level 0 = finest.
      pts: (N, 2) float32 source points (x, y) at level 0.
      valid: (N,) bool — invalid points are carried through untouched & flagged.
      init_pts: optional (N, 2) initial guess of target positions
        (≡ OPTFLOW_USE_INITIAL_FLOW with pose-predicted flow).
      radius: window radius (window = (2r+1)²; reference default 15x15→r=7,
        TUM-VI config 63x63; we default 21x21).
    Returns:
      tracked_pts: (N, 2) float32
      status: (N,) bool — tracked successfully
      err: (N,) float32 — mean abs window residual at finest level
    """
    levels = len(prev_pyramid)
    scale = float(2 ** (levels - 1))
    if init_pts is None or not use_initial_flow:
        init_pts = pts
    flow = (init_pts - pts) / scale
    pts_l = pts / scale
    ok = valid
    err = jnp.zeros(pts.shape[0], jnp.float32)

    for l in range(levels - 1, -1, -1):
        prev_img = prev_pyramid[l]
        next_img = next_pyramid[l]
        gx, gy = scharr_gradients(prev_img)
        flow, ok_l, err = _lk_single_level(
            prev_img, next_img, gx, gy, pts_l, flow, radius, iters, eps, min_eig_threshold
        )
        ok = ok & ok_l
        if l > 0:
            flow = flow * 2.0
            pts_l = pts / float(2 ** (l - 1))

    tracked = pts + flow
    tracked = jnp.where(valid[:, None], tracked, pts)
    return tracked, ok & valid, err


@functools.partial(jax.jit, static_argnames=("radius", "iters"))
def lk_forward_backward(
    prev_pyramid,
    next_pyramid,
    pts,
    valid,
    init_pts=None,
    radius: int = 10,
    iters: int = 10,
    fb_threshold: float = 1.0,
):
    """Forward-backward consistency tracking (`keypoint_tracker.cpp:379-423`):
    track prev→next, then next→prev, accept if the round trip lands within
    ``fb_threshold`` pixels of the start."""
    fwd, ok_f, err = pyramidal_lk(
        prev_pyramid, next_pyramid, pts, valid,
        init_pts=init_pts, radius=radius, iters=iters,
        use_initial_flow=init_pts is not None,
    )
    bwd, ok_b, _ = pyramidal_lk(
        next_pyramid, prev_pyramid, fwd, ok_f, radius=radius, iters=iters,
    )
    fb_err = jnp.linalg.norm(bwd - pts, axis=-1)
    ok = ok_f & ok_b & (fb_err <= fb_threshold)
    return fwd, ok, err
