"""Batched pyramidal Lucas-Kanade optical flow (pure JAX → XLA).

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

COMPILED-SIZE NOTE (load-bearing on this hardware): pyramid levels are
processed by ONE `lax.scan` body over a stacked (L, H, W) pyramid buffer, and
the forward/backward passes of the consistency check share that body through a
second 2-step scan. A naively unrolled version (8 inlined level bodies per
fb-pair) compiles to a ~8.6 MB TPU executable; executables that large fall out
of the device program cache and get re-uploaded every call (~10 MB/s → ~900 ms
per call). The scanned version compiles ~8x smaller and stays resident.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.ops.image import build_pyramid, scharr_gradients


def _window_offsets(radius: int):
    r = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(r, r, indexing="ij")
    return jnp.stack([ox.reshape(-1), oy.reshape(-1)], axis=-1)  # (K, 2)


def stack_pyramid(pyr):
    """Tuple of (H/2^l, W/2^l) levels -> ((L, H, W) buffer, (L, 2) sizes).

    Level content sits at the top-left of each (H, W) slice; ``sizes`` carries
    the true (h, w) per level for bounds handling. This makes every level the
    same static shape so one scanned body serves all levels.
    """
    H, W = pyr[0].shape
    imgs = [jnp.pad(p, ((0, H - p.shape[0]), (0, W - p.shape[1]))) for p in pyr]
    sizes = jnp.asarray([[p.shape[0], p.shape[1]] for p in pyr], jnp.float32)
    return jnp.stack(imgs), sizes


def stack_gradients(pyr):
    """Per-level Scharr gradients (computed at true level shapes — correct
    borders), stacked like stack_pyramid. Returns (gx_stack, gy_stack)."""
    H, W = pyr[0].shape
    gxs, gys = [], []
    for p in pyr:
        gx, gy = scharr_gradients(p)
        gxs.append(jnp.pad(gx, ((0, H - p.shape[0]), (0, W - p.shape[1]))))
        gys.append(jnp.pad(gy, ((0, H - p.shape[0]), (0, W - p.shape[1]))))
    return jnp.stack(gxs), jnp.stack(gys)


def build_lk_pyramid(img, levels: int):
    """Image -> (stacked pyramid (L+1, H, W), sizes (L+1, 2)). The canonical
    representation the tracker stores per frame."""
    return stack_pyramid(build_pyramid(img, levels))


def build_lk_pyramid_pair(img_l, img_r, levels: int):
    """Build BOTH stereo pyramids in one batched pass (the pyrDown filter
    chain runs once on a (2, H, W) stack — half the VPU passes of two
    separate builds). Returns (pyr_l, pyr_r, sizes)."""
    from zenslam_tpu.ops.image import _pyr_down

    H, W = img_l.shape
    cur = jnp.stack([img_l, img_r])
    pyr = [cur]
    for _ in range(levels):
        cur = _pyr_down(cur)
        pyr.append(cur)
    padded = [jnp.pad(p, ((0, 0), (0, H - p.shape[1]), (0, W - p.shape[2])))
              for p in pyr]
    stack = jnp.stack(padded, axis=1)  # (2, L+1, H, W)
    sizes = jnp.asarray([[p.shape[1], p.shape[2]] for p in pyr], jnp.float32)
    return stack[0], stack[1], sizes


def build_ragged_pyramid_pair(img_l, img_r, levels: int, dtype=jnp.float32):
    """Build BOTH stereo pyramids as RAGGED per-level arrays — the Pallas LK
    kernel's native format (ops/lk_pallas.py): each level at its true size,
    padded only up to VMEM tile alignment (sublane 8 / lane 128, min one
    (32, 256) tile). At 1024x1024 this is 1/3 the memory of the full-size
    stacked format and skips its zero-fill writes.

    Returns (tuple_l, tuple_r) of levels+1 arrays in ``dtype`` (bf16 halves
    VMEM residency and feeds the kernel's bf16 MXU path)."""
    from zenslam_tpu.ops.image import _pyr_down
    from zenslam_tpu.ops.lk_pallas import padded_level_shape

    cur = jnp.stack([img_l, img_r])
    out_l, out_r = [], []
    for l in range(levels + 1):
        if l:
            cur = _pyr_down(cur)
        h, w = cur.shape[-2:]
        Hp, Wp = padded_level_shape(h, w)
        p = jnp.pad(cur, ((0, 0), (0, Hp - h), (0, Wp - w))).astype(dtype)
        out_l.append(p[0])
        out_r.append(p[1])
    return tuple(out_l), tuple(out_r)


def empty_ragged_pyramid(H: int, W: int, levels: int, dtype=jnp.float32):
    """Zero ragged pyramid with the shapes build_ragged_pyramid_pair makes
    for an (H, W) image — the init_state placeholder for prev_pyr_l."""
    from zenslam_tpu.ops.lk_pallas import padded_level_shape, ragged_level_sizes

    return tuple(
        jnp.zeros(padded_level_shape(h, w), dtype)
        for h, w in ragged_level_sizes(H, W, levels + 1))


def ragged_to_stacked(levels_tuple, true_sizes):
    """Adapter: ragged padded levels -> ((L, H, W) f32 stack, sizes array),
    the XLA-fallback LK format (stack_pyramid layout)."""
    H, W = true_sizes[0]
    stack = jnp.stack([
        jnp.pad(p.astype(jnp.float32)[:h, :w], ((0, H - h), (0, W - w)))
        for p, (h, w) in zip(levels_tuple, true_sizes)])
    sizes = jnp.asarray([[h, w] for h, w in true_sizes], jnp.float32)
    return stack, sizes


def _sample_clamped(img, xy, w, h):
    """Bilinear sample with edge replication w.r.t. DYNAMIC level bounds
    (w, h): coordinates clamp into [0, w-1]x[0, h-1]. img is the (H, W)
    full-size buffer holding the level at its top-left."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, w - 1.0001)
    y = jnp.clip(xy[..., 1], 0.0, h - 1.0001)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    x1i = jnp.clip(x0i + 1, 0, W - 1)
    y1i = jnp.clip(y0i + 1, 0, H - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def _lk_core(prev_stack, prev_gx, prev_gy, next_stack, sizes, pts, init_pts,
             valid, radius: int, iters: int, eps: float, min_eig_threshold: float):
    """Coarse-to-fine LK via one scanned level body.

    All positions/flows are kept in FULL-RESOLUTION pixel units; the body
    rescales by the level factor. Returns (tracked_pts, ok, err)."""
    L = prev_stack.shape[0]
    offs = _window_offsets(radius)  # (K, 2)
    n_win = offs.shape[0]

    flow0 = init_pts - pts

    def level_body(carry, xs):
        flow, ok = carry
        prev_img, gx_img, gy_img, next_img, size, scale = xs
        h, w = size[0], size[1]
        pts_l = pts * scale
        win = pts_l[:, None, :] + offs[None, :, :]  # (N, K, 2)
        Ip = _sample_clamped(prev_img, win, w, h)
        gx = _sample_clamped(gx_img, win, w, h)
        gy = _sample_clamped(gy_img, win, w, h)
        gxx = jnp.sum(gx * gx, axis=-1)
        gxy = jnp.sum(gx * gy, axis=-1)
        gyy = jnp.sum(gy * gy, axis=-1)
        det = gxx * gyy - gxy * gxy
        trace = gxx + gyy
        min_eig = (trace - jnp.sqrt(jnp.maximum(trace * trace - 4 * det, 0.0))) * 0.5
        eig_ok = (min_eig / n_win) > min_eig_threshold
        det_safe = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        iG00 = gyy / det_safe
        iG01 = -gxy / det_safe
        iG11 = gxx / det_safe

        def newton(_, st):
            flow, converged = st
            flow_l = flow * scale
            Jp = _sample_clamped(next_img, win + flow_l[:, None, :], w, h)
            e = Ip - Jp
            bx = jnp.sum(e * gx, axis=-1)
            by = jnp.sum(e * gy, axis=-1)
            dx = iG00 * bx + iG01 * by
            dy = iG01 * bx + iG11 * by
            delta = jnp.stack([dx, dy], axis=-1)
            step = jnp.where((converged | ~eig_ok)[:, None], 0.0, delta)
            flow = flow + step / scale  # back to full-res units
            converged = converged | (jnp.sum(delta * delta, axis=-1) < eps * eps)
            return flow, converged

        flow, _ = jax.lax.fori_loop(
            0, iters, newton, (flow, jnp.zeros(pts.shape[0], jnp.bool_))
        )
        # residual + bounds at this level
        flow_l = flow * scale
        Jp = _sample_clamped(next_img, win + flow_l[:, None, :], w, h)
        err = jnp.mean(jnp.abs(Ip - Jp), axis=-1)
        tracked_l = pts_l + flow_l
        margin = 1.0
        in_b = (
            (tracked_l[:, 0] >= margin) & (tracked_l[:, 0] < w - margin)
            & (tracked_l[:, 1] >= margin) & (tracked_l[:, 1] < h - margin)
        )
        return (flow, ok & eig_ok & in_b), err

    # coarse -> fine: reverse level order in the scanned inputs
    order = jnp.arange(L - 1, -1, -1)
    scales = (1.0 / (2.0 ** jnp.arange(L, dtype=jnp.float32)))[order]
    xs = (
        prev_stack[order], prev_gx[order], prev_gy[order], next_stack[order],
        sizes[order], scales,
    )
    (flow, ok), errs = jax.lax.scan(level_body, (flow0, valid), xs)
    tracked = pts + flow
    tracked = jnp.where(valid[:, None], tracked, pts)
    return tracked, ok & valid, errs[-1]


@functools.partial(jax.jit, static_argnames=("radius", "iters", "use_initial_flow"))
def pyramidal_lk(
    prev_pyramid,
    next_pyramid,
    pts,
    valid,
    init_pts=None,
    radius: int = 10,
    iters: int = 10,
    eps: float = 0.01,
    min_eig_threshold: float = 1e-7,  # OpenCV's 1e-4 is for [0,255] images; ours are [0,1]
    use_initial_flow: bool = False,
):
    """Track ``pts`` from prev to next image through a Gaussian pyramid.

    Pyramids may be given as tuples from ops.image.build_pyramid (stacked
    internally) or as (stack, sizes) pairs from build_lk_pyramid.
    Returns (tracked_pts (N,2), status (N,) bool, err (N,) float32).
    """
    prev_stack, sizes = _as_stack(prev_pyramid)
    next_stack, _ = _as_stack(next_pyramid)
    if init_pts is None or not use_initial_flow:
        init_pts = pts
    prev_gx, prev_gy = _grad_stack(prev_pyramid)
    return _lk_core(prev_stack, prev_gx, prev_gy, next_stack, sizes, pts,
                    init_pts, valid, radius, iters, eps, min_eig_threshold)


def _as_stack(pyr):
    if isinstance(pyr, tuple) and isinstance(pyr[0], jnp.ndarray) and pyr[0].ndim == 2:
        return stack_pyramid(pyr)
    stack, sizes = pyr
    return stack, sizes


def _grad_stack(pyr):
    if isinstance(pyr, tuple) and isinstance(pyr[0], jnp.ndarray) and pyr[0].ndim == 2:
        return stack_gradients(pyr)
    # stacked input: recover per-level views statically is impossible without
    # static sizes; compute gradients on the stacked buffer batched (border
    # columns of each level see zeros — masked by the level-bounds clamp).
    stack, _ = pyr
    gx, gy = jax.vmap(scharr_gradients)(stack)
    return gx, gy


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
    ``fb_threshold`` pixels of the start.

    The two directions share ONE compiled level body via a 2-step scan (see
    module docstring on compiled-size).
    """
    prev_stack, sizes = _as_stack(prev_pyramid)
    next_stack, _ = _as_stack(next_pyramid)
    if init_pts is None:
        init_pts = pts
    # direction-stacked inputs: step 0 tracks prev->next, step 1 next->prev
    tmpl = jnp.stack([prev_stack, next_stack])      # template image per step
    tgt = jnp.stack([next_stack, prev_stack])       # target image per step
    tmpl_gx, tmpl_gy = jax.vmap(lambda s: jax.vmap(scharr_gradients)(s))(tmpl)

    def direction_body(carry, xs):
        start, init, ok, fwd_saved, err_saved, step = carry
        t_img, t_gx, t_gy, n_img = xs
        tracked, ok_d, err = _lk_core(
            t_img, t_gx, t_gy, n_img, sizes, start, init, valid,
            radius, iters, 0.01, 1e-7,
        )
        is_fwd = step == 0
        fwd_saved = jnp.where(is_fwd, tracked, fwd_saved)
        err_saved = jnp.where(is_fwd, err, err_saved)
        # backward pass starts from the forward result, initialized at the
        # original points (best guess for the return trip)
        new_carry = (tracked, jnp.where(is_fwd, pts, init), ok & ok_d,
                     fwd_saved, err_saved, step + 1)
        return new_carry, 0

    carry0 = (pts, init_pts, valid, pts, jnp.zeros(pts.shape[0], jnp.float32),
              jnp.asarray(0, jnp.int32))
    (bwd, _, ok, fwd, err, _), _ = jax.lax.scan(
        direction_body, carry0, (tmpl, tmpl_gx, tmpl_gy, tgt)
    )
    fb_err = jnp.linalg.norm(bwd - pts, axis=-1)
    ok = ok & (fb_err <= fb_threshold)
    return fwd, ok, err
