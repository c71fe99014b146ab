"""Line-segment detection + line descriptors (pure JAX → XLA).

Parity targets:
- LSD line detection           ≡ cv::line_descriptor::LSDDetector in
                                 `detection/keyline_detector.h:43-44`,
                                 `keyline_detector.cpp:21-87` (detect with
                                 thick-line masking over existing keylines and
                                 max-length filter)
- binary line descriptor       ≡ cv::line_descriptor::BinaryDescriptor (LBD)
                                 used for keyline landmark re-association
                                 (`keyline_tracker.cpp:78-163`)

TPU-first design — NOT a port of LSD's region-growing (which is a sequential
flood fill): the image is divided into cells; each cell computes a gradient
STRUCTURE TENSOR whose coherence says "one dominant edge orientation lives
here" (the same quantity LSD's level-line field measures pointwise). A
coherent cell yields a support segment (weighted centroid + principal
direction + masked extent). Collinear neighboring cells are then merged with
a run-length segmented reduction along grid rows (near-horizontal lines) and
grid columns (near-vertical lines) — one pass, fixed shapes, no dynamic
control flow. Output is a fixed-capacity endpoint table + validity mask.

The descriptor is a line-aligned binary patch ("line-BRIEF"): intensities
sampled on a 16x16 grid in the (direction, normal) frame of the segment,
binarized against the patch mean → 256 bits packed (L, 8) uint32 — the same
layout as ORB so the MXU Hamming matcher (ops/match.py) is reused verbatim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.ops.image import scharr_gradients, bilinear_sample

_BIG = 1 << 30


def canonicalize_endpoints(ep):
    """Order endpoints so the segment direction has angle in [-90°, 90°):
    dx > 0, ties broken by dy >= 0. ep: (..., 2, 2) [point, xy]."""
    d = ep[..., 1, :] - ep[..., 0, :]
    flip = (d[..., 0] < 0) | ((d[..., 0] == 0) & (d[..., 1] < 0))
    return jnp.where(flip[..., None, None], ep[..., ::-1, :], ep)


def _cell_support(img, cell_size: int, mag_threshold: float):
    """Per-cell line-support statistics.

    Returns dict of (gh, gw) arrays: ok, centroid (…,2), dir (…,2 unit),
    ep (…,2,2) cell-local segment endpoints, coherence, n_edge, perp_rms,
    strength.
    """
    H, W = img.shape
    cs = cell_size
    gh, gw = H // cs, W // cs
    gx, gy = scharr_gradients(img)
    mag2 = gx * gx + gy * gy

    yy = jnp.arange(H, dtype=jnp.float32)[:, None] * jnp.ones((1, W), jnp.float32)
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] * jnp.ones((H, 1), jnp.float32)

    def cells(a):
        return a.reshape(gh, cs, gw, cs).transpose(0, 2, 1, 3).reshape(gh, gw, cs * cs)

    m2c = cells(mag2)
    # ADAPTIVE edge gate: a pixel supports the cell's line only if its
    # gradient is both above the absolute floor AND within a fraction of the
    # cell's strongest gradient — textured backgrounds contribute weak edges
    # everywhere, which would otherwise wash out the perpendicular-spread
    # statistic of a genuine stripe (LSD's region growing has the same
    # magnitude-ordering effect).
    cell_max = jnp.max(m2c, axis=-1, keepdims=True)
    gate = jnp.maximum(mag_threshold * mag_threshold, 0.25 * cell_max)
    wc = jnp.where(m2c > gate, m2c, 0.0)
    xc = cells(xx)
    yc = cells(yy)
    gxc = cells(gx)
    gyc = cells(gy)

    wsum = jnp.sum(wc, axis=-1)
    wsafe = jnp.maximum(wsum, 1e-12)
    cx = jnp.sum(wc * xc, axis=-1) / wsafe
    cy = jnp.sum(wc * yc, axis=-1) / wsafe

    # gradient structure tensor (weighted by magnitude², edge-gated)
    jxx = jnp.sum(wc * gxc * gxc / jnp.maximum(m2c, 1e-12), axis=-1)
    jxy = jnp.sum(wc * gxc * gyc / jnp.maximum(m2c, 1e-12), axis=-1)
    jyy = jnp.sum(wc * gyc * gyc / jnp.maximum(m2c, 1e-12), axis=-1)
    tr = jxx + jyy
    dd = jxx - jyy
    disc = jnp.sqrt(dd * dd / 4.0 + jxy * jxy)
    lam1 = tr / 2.0 + disc
    lam2 = tr / 2.0 - disc
    coherence = (lam1 - lam2) / jnp.maximum(lam1 + lam2, 1e-12)
    # dominant GRADIENT orientation (mod π); the LINE direction is its normal
    theta_g = 0.5 * jnp.arctan2(2.0 * jxy, dd)
    dirx = -jnp.sin(theta_g)
    diry = jnp.cos(theta_g)
    # canonical: dx >= 0
    flip = dirx < 0
    dirx = jnp.where(flip, -dirx, dirx)
    diry = jnp.where(flip, -diry, diry)

    # masked extent along the line direction + RMS perpendicular spread
    px = xc - cx[..., None]
    py = yc - cy[..., None]
    s = px * dirx[..., None] + py * diry[..., None]
    p = -px * diry[..., None] + py * dirx[..., None]
    mask = wc > 0
    s_min = jnp.min(jnp.where(mask, s, jnp.inf), axis=-1)
    s_max = jnp.max(jnp.where(mask, s, -jnp.inf), axis=-1)
    perp_rms = jnp.sqrt(jnp.sum(wc * p * p, axis=-1) / wsafe)
    n_edge = jnp.sum(mask.astype(jnp.int32), axis=-1)

    d = jnp.stack([dirx, diry], axis=-1)
    c = jnp.stack([cx, cy], axis=-1)
    finite = jnp.isfinite(s_min) & jnp.isfinite(s_max)
    s_min = jnp.where(finite, s_min, 0.0)
    s_max = jnp.where(finite, s_max, 0.0)
    ep = jnp.stack([c + s_min[..., None] * d, c + s_max[..., None] * d], axis=-2)
    return {
        "centroid": c, "dir": d, "ep": ep, "coherence": coherence,
        "n_edge": n_edge, "perp_rms": perp_rms, "strength": lam1,
        "extent": s_max - s_min, "finite": finite,
    }


def _merge_runs(ok, d, ep, along_rows: bool, angle_cos_tol: float,
                gap_tol: float, perp_tol: float):
    """Merge collinear consecutive cells along grid rows (or columns).

    Returns (emit (gh,gw) bool, ep_merged (gh,gw,2,2)) — merged segments are
    emitted at the FIRST cell of each run.
    """
    gh, gw = ok.shape
    if not along_rows:
        # transpose the grid; swap handled by caller passing same arrays
        okT, dT, epT = ok.T, jnp.swapaxes(d, 0, 1), jnp.swapaxes(ep, 0, 1)
        emitT, mepT = _merge_runs(okT, dT, epT, True, angle_cos_tol, gap_tol, perp_tol)
        return emitT.T, jnp.swapaxes(mepT, 0, 1)

    # predecessor (same row, col-1)
    def prev(a):
        return jnp.concatenate([jnp.zeros_like(a[:, :1]), a[:, :-1]], axis=1)

    d_prev = prev(d)
    ep_prev = prev(ep)
    ok_prev = prev(ok.astype(jnp.int32)).astype(bool)
    # angle similarity: |d · d_prev| (both canonical dx>=0, so no abs needed,
    # but keep abs for the near-vertical wraparound)
    cos_sim = jnp.abs(jnp.sum(d * d_prev, axis=-1))
    # endpoint continuity: prev's far endpoint vs our near endpoint
    # (cells are in canonical x order along a row for near-horizontal lines;
    #  for columns the transpose handles it — segments near-vertical have
    #  canonical order by construction dy>=0 after dx>=0 canonicalization
    #  within ~45°; use min pairwise endpoint gap to stay orientation-safe)
    gaps = jnp.linalg.norm(ep[:, :, :, None, :] - ep_prev[:, :, None, :, :], axis=-1)
    gap = jnp.min(gaps.reshape(gh, gw, 4), axis=-1)
    # perpendicular offset of prev centroid from our infinite line
    n = jnp.stack([-d[..., 1], d[..., 0]], axis=-1)
    c_prev = 0.5 * (ep_prev[..., 0, :] + ep_prev[..., 1, :])
    c_cur = 0.5 * (ep[..., 0, :] + ep[..., 1, :])
    perp = jnp.abs(jnp.sum((c_prev - c_cur) * n, axis=-1))

    link = ok & ok_prev & (cos_sim >= angle_cos_tol) & (gap <= gap_tol) & (perp <= perp_tol)
    start = ok & ~link
    rid = jnp.cumsum(start.astype(jnp.int32), axis=1) - 1  # run index within row
    seg = jnp.where(ok, jnp.arange(gh, dtype=jnp.int32)[:, None] * gw + rid, gh * gw)
    seg_flat = seg.reshape(-1)
    nseg = gh * gw + 1

    # first/last cell of each run by column index
    col = jnp.tile(jnp.arange(gw, dtype=jnp.int32)[None, :], (gh, 1)).reshape(-1)
    flat = jnp.arange(gh * gw, dtype=jnp.int32)
    key_first = col * (gh * gw) + flat
    key_last = (gw - 1 - col) * (gh * gw) + flat
    first_packed = jax.ops.segment_min(key_first, seg_flat, num_segments=nseg)
    last_packed = jax.ops.segment_min(key_last, seg_flat, num_segments=nseg)
    first_idx = (first_packed % (gh * gw)).astype(jnp.int32)
    last_idx = (last_packed % (gh * gw)).astype(jnp.int32)

    ep_flat = ep.reshape(-1, 2, 2)
    # merged segment: extreme endpoints of first & last cell projected on the
    # FIRST cell's direction
    d_first = d.reshape(-1, 2)[first_idx]  # (nseg, 2)
    cand = jnp.concatenate([ep_flat[first_idx], ep_flat[last_idx]], axis=-2)  # (nseg,4,2)
    sproj = jnp.sum(cand * d_first[:, None, :], axis=-1)
    lo = jnp.argmin(sproj, axis=-1)
    hi = jnp.argmax(sproj, axis=-1)
    r = jnp.arange(nseg)
    mep = jnp.stack([cand[r, lo], cand[r, hi]], axis=-2)  # (nseg, 2, 2)

    emit = start
    ep_merged = mep[jnp.clip(seg, 0, nseg - 1)]
    return emit, ep_merged


def point_segment_distance(p, ep):
    """Distance from points p (N,2) to segments ep (M,2,2) → (N,M)."""
    a = ep[:, 0, :]
    b = ep[:, 1, :]
    ab = b - a
    denom = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-12)
    ap = p[:, None, :] - a[None, :, :]
    t = jnp.clip(jnp.sum(ap * ab[None], axis=-1) / denom[None], 0.0, 1.0)
    proj = a[None] + t[..., None] * ab[None]
    return jnp.linalg.norm(p[:, None, :] - proj, axis=-1)


@functools.partial(jax.jit, static_argnames=("cell_size", "max_keylines", "border"))
def detect_keylines(
    img,
    existing_ep,
    existing_valid,
    mag_threshold: float = 0.06,
    coherence_threshold: float = 0.6,
    cell_size: int = 16,
    max_keylines: int = 64,
    min_length: float = 12.0,
    max_length: float = 200.0,
    perp_tol: float = 1.6,
    suppress_radius: float = 8.0,
    border: int = 8,
):
    """Detect line segments into a fixed-capacity endpoint table.

    ≡ `keyline_detector::detect_keylines` (`keyline_detector.cpp:21-87`):
    detection with thick-line masking over ``existing`` keylines and a
    max-length filter; selection is top-K by length × edge strength.

    Args:
      img: (H, W) float32 in [0,1]; H, W divisible by cell_size.
      existing_ep: (M, 2, 2) float32 endpoints of current keylines.
      existing_valid: (M,) bool.
    Returns:
      ep: (max_keylines, 2, 2) float32 canonical endpoints, score
      (max_keylines,) float32, valid (max_keylines,) bool.
    """
    H, W = img.shape
    sup = _cell_support(img, cell_size, mag_threshold)
    cs = cell_size
    min_edge = cs  # at least one cell-crossing of edge pixels
    cell_ok = (
        sup["finite"]
        & (sup["n_edge"] >= min_edge)
        & (sup["coherence"] >= coherence_threshold)
        & (sup["perp_rms"] <= perp_tol)
        & (sup["extent"] >= 0.5 * cs)
    )
    d = sup["dir"]
    horizontal = jnp.abs(d[..., 0]) >= jnp.abs(d[..., 1])

    cos_tol = float(np.cos(np.radians(12.0)))
    emit_h, ep_h = _merge_runs(cell_ok & horizontal, d, sup["ep"], True,
                               cos_tol, 0.75 * cs, 2.0)
    emit_v, ep_v = _merge_runs(cell_ok & ~horizontal, d, sup["ep"], False,
                               cos_tol, 0.75 * cs, 2.0)

    emit = jnp.concatenate([emit_h.reshape(-1), emit_v.reshape(-1)])
    eps = jnp.concatenate([ep_h.reshape(-1, 2, 2), ep_v.reshape(-1, 2, 2)])
    strength = jnp.concatenate([sup["strength"].reshape(-1)] * 2)

    eps = canonicalize_endpoints(eps)
    # Clip segments to the border box (Liang–Barsky) rather than rejecting
    # lines that touch the image edge — a full-width corridor edge is still a
    # usable keyline on its interior portion.
    a, b = eps[:, 0], eps[:, 1]
    seg_d = b - a
    lo_box = jnp.asarray([border, border], jnp.float32)
    hi_box = jnp.asarray([W - 1 - border, H - 1 - border], jnp.float32)
    safe_d = jnp.where(jnp.abs(seg_d) < 1e-9, 1e-9, seg_d)
    t0 = (lo_box[None] - a) / safe_d
    t1 = (hi_box[None] - a) / safe_d
    t_enter = jnp.max(jnp.where(jnp.abs(seg_d) < 1e-9, 0.0, jnp.minimum(t0, t1)), axis=-1)
    t_exit = jnp.min(jnp.where(jnp.abs(seg_d) < 1e-9, 1.0, jnp.maximum(t0, t1)), axis=-1)
    t_lo = jnp.clip(t_enter, 0.0, 1.0)
    t_hi = jnp.clip(t_exit, 0.0, 1.0)
    # a degenerate-axis segment must still start inside the box on that axis
    inside_static = jnp.all(
        jnp.where(jnp.abs(seg_d) < 1e-9, (a >= lo_box[None]) & (a <= hi_box[None]), True),
        axis=-1)
    clip_ok = (t_hi > t_lo) & inside_static
    eps = jnp.stack([a + t_lo[:, None] * seg_d, a + t_hi[:, None] * seg_d], axis=-2)
    length = jnp.linalg.norm(eps[:, 1] - eps[:, 0], axis=-1)
    ok = emit & clip_ok & (length >= min_length) & (length <= max_length)

    # thick-line masking over existing keylines: candidate midpoint too close
    # to an existing segment → suppressed (≡ the mask drawn with thickness in
    # `keyline_detector.cpp`)
    mid = 0.5 * (eps[:, 0] + eps[:, 1])
    ex_ep = jnp.where(existing_valid[:, None, None], existing_ep, -1e6)
    dist = point_segment_distance(mid, ex_ep)
    near = jnp.any(dist <= suppress_radius, axis=-1) & jnp.any(existing_valid)
    ok = ok & ~near

    score = jnp.where(ok, length * jnp.sqrt(jnp.maximum(strength, 0.0)), 0.0)
    k = min(max_keylines, score.shape[0])
    top_score, top_i = jax.lax.top_k(score, k)
    top_ep = eps[top_i]
    valid = top_score > 0.0
    if k < max_keylines:
        pad = max_keylines - k
        top_score = jnp.pad(top_score, (0, pad))
        top_ep = jnp.pad(top_ep, ((0, pad), (0, 0), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    return top_ep, top_score, valid


@functools.partial(jax.jit, static_argnames=("n_along", "n_perp"))
def keyline_descriptors(img, ep, valid, n_along: int = 16, n_perp: int = 16,
                        perp_step: float = 1.0):
    """Line-aligned binary descriptor, (L, 8) uint32 — 256-bit "line-BRIEF".

    ≡ cv::line_descriptor::BinaryDescriptor (LBD) role in the reference's
    keyline landmark association (`keyline_tracker.cpp:78-163`): a binary
    descriptor matchable with Hamming distance. Samples a n_along × n_perp
    intensity patch in the (direction, normal) frame of the canonical
    segment (rotation-invariant), binarized against the patch mean.
    """
    ep = canonicalize_endpoints(ep)
    a, b = ep[:, 0], ep[:, 1]
    d = b - a
    length = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / jnp.maximum(length, 1e-6)
    n = jnp.stack([-d[:, 1], d[:, 0]], axis=-1)
    ts = jnp.linspace(0.08, 0.92, n_along, dtype=jnp.float32)
    os_ = (jnp.arange(n_perp, dtype=jnp.float32) - (n_perp - 1) / 2.0) * perp_step
    # (L, S, P, 2)
    centers = a[:, None, :] + ts[None, :, None] * length[:, None, :] * d[:, None, :]
    pts = centers[:, :, None, :] + os_[None, None, :, None] * n[:, None, None, :]
    samp = bilinear_sample(img, pts.reshape(-1, 2)).reshape(ep.shape[0], n_along * n_perp)
    mean = jnp.mean(samp, axis=-1, keepdims=True)
    bits = (samp > mean).astype(jnp.uint32)
    bits = jnp.where(valid[:, None], bits, 0)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    packed = jnp.sum(bits.reshape(-1, 8, 32) << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
    return packed
