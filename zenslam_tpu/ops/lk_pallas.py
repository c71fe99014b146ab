"""Pallas TPU kernel for batched pyramidal Lucas-Kanade.

This is the direct TPU analogue of the reference's Metal compute shader
(`zenslam_metal/source/pyr_lk_metal.mm:16-115`) / cv::calcOpticalFlowPyrLK:
iterative 2x2 Newton solve per point, coarse-to-fine, margin/singularity
exits, forward-backward consistency (≡ `keypoint_tracker.cpp:379-423`).

Why a kernel at all: the pure-JAX LK (ops/lk.py) lowers window sampling to
XLA gathers — 36M scattered loads per fwd/bwd pair → ~1.1 s/call on a v5e.

How the kernel samples without gathers (Mosaic has no unaligned vector
loads): each point loads ONE aligned (32, 256) tile around its window from
the VMEM-resident pyramid, and the unaligned shift + bilinear interpolation
are fused into two one-hot matmuls on the MXU:

    S(G,G) = R(G,32) @ tile(32,256) @ C(256,G)

where R/C are separable bilinear selector matrices built from iota
comparisons against the window's integer offset (dy/dx) and fractional part.
Gradients are central differences of the sampled grid (≡ Metal kernel).
B points are solved per grid step with the tiles stacked vertically and the
selector pairs merged into BLOCK-DIAGONAL matrices, so each sample step is
two MXU matmuls instead of 2B tiny ones.

Measured design choices (v5e, 512 pts, 1024x1024, 4 levels, r=10):

- RAGGED pyramid — each level its own VMEM ref at (~) true size instead of
  an (L, H, W) stack padded to full resolution. The stacked pair needed
  32 MB of VMEM (2x the 16 MB/core budget — compile-time OOM); the ragged
  pair needs ~10.6 MB f32, ~5.3 MB bf16. Level sizes are STATIC.
- FUSED forward+backward in one grid step (one dispatch, setup amortized
  across both directions): 7.2 → 6.7 ms vs two separate calls.
- UNROLLED Newton iterations instead of a convergence while_loop: the
  while_loop's scalar exit test serializes the pipeline; cost was flat-ish
  (~7 ms) regardless of `iters`, while unrolled cost is linear at ~1 ms/iter
  — unroll 4 ≈ 5.4 ms, max deviation from the converged result 5e-4 px.
- bf16 pyramid storage + bf16 MXU passes (f32 accumulate): 5.4 → 4.4 ms.
  Selector rows/cols have <=2 nonzeros (bilinear taps) so bf16 inputs lose
  nothing beyond the uint8 sensor quantization already in the pixels
  (measured 0.03 px vs the f32 kernel).
- Block size: B=4 was optimal with one-hot selectors (B=8/16 slower — the
  (BG, B*32) selector fields grow quadratically in B and the per-point
  one-hot VPU work overtook the amortization win). With the cheaper
  TRIANGLE selectors (below) the balance moved: B=8 measured ~10% faster
  than B=4 (2.31 vs 2.66 ms/call standalone) and B=16 slower again; the
  pipeline uses B=8.
- PER-LEVEL iteration schedule (``iters`` may be a fine→coarse tuple):
  coarse levels only need to land within the next level's convergence
  radius (~``radius`` px), which 2-3 Newton steps achieve; the finest level
  keeps the full count for subpixel accuracy.
- SHALLOW BACKWARD pass (``bwd_levels``): the fwd-bwd consistency check
  starts the return track at the forward solution with initial flow = -fwd
  flow — already inside the finest level's convergence basin — so the
  backward direction skips the coarse-to-fine chain entirely and refines at
  the finest ``bwd_levels`` level(s) only. A forward track that drifted to a
  wrong basin still fails the check: the backward refinement stays in that
  wrong basin and lands far from the start point. Skipping the backward
  direction's final error-sample (status comes from a bounds compare on the
  final position — no image access needed) saves one more sample step.
  Together: 50 → ~26 sample steps per fwd+bwd call at the default config.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TH = 32    # aligned tile rows  (sublane multiple of 8)
_TW = 256   # aligned tile cols  (lane multiple of 128)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def ragged_level_sizes(H: int, W: int, levels: int):
    """True (h, w) per pyramid level for an (H, W) image (decimate-by-2
    chain, level 0 = input). Static python ints."""
    sizes = [(H, W)]
    for _ in range(levels - 1):
        h, w = sizes[-1]
        sizes.append(((h + 1) // 2, (w + 1) // 2))
    return tuple(sizes)


def padded_level_shape(h: int, w: int):
    """VMEM-friendly padded shape for a level: >= one aligned tile."""
    return max(_TH, _round_up(h, 8)), max(_TW, _round_up(w, 128))


def _lk_fb_kernel(
    pts_ref,     # (2, N) SMEM float32 (transposed; SMEM pads per ROW)
    init_ref,    # (2, N) SMEM float32
    valid_ref,   # (1, N) SMEM int32
    *refs,       # L prev-level VMEM refs, L next-level refs, then 3 outputs
    levels: int,
    sizes: tuple,        # static ((h, w), ...) true level sizes
    radius: int,
    iters: tuple,        # static per-level Newton counts, indexed by level
    eps: float,
    min_eig_threshold: float,
    fb_threshold: float,
    B: int,
    do_backward: bool,
    bwd_levels: int,     # backward pass refines only the finest k levels
    compute_err: bool,   # False: skip the final residual sample (err = 0)
    unroll: bool,
):
    prev_refs = refs[:levels]
    next_refs = refs[levels : 2 * levels]
    out_xy_ref, out_ok_ref, out_err_ref = refs[2 * levels :]

    G = 2 * radius + 3           # sampled grid (window + gradient margin)
    BG = B * G
    n_win = float((2 * radius + 1) ** 2)
    base = pl.program_id(0) * B

    x0 = [pts_ref[0, base + b] for b in range(B)]
    y0 = [pts_ref[1, base + b] for b in range(B)]
    fx0 = [init_ref[0, base + b] - x0[b] for b in range(B)]
    fy0 = [init_ref[1, base + b] - y0[b] for b in range(B)]
    valid = [valid_ref[0, base + b] != 0 for b in range(B)]

    # block-diagonal selector index fields (shared across sample steps and
    # both track directions)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (BG, B * _TH), 0)
    k_i = jax.lax.broadcasted_iota(jnp.int32, (BG, B * _TH), 1)
    row_blk = [r_i // G == b for b in range(B)]
    row_w_f = (r_i % G).astype(jnp.float32)   # window row index field
    k_row_f = k_i.astype(jnp.float32)         # stacked-tile row index field
    k2_i = jax.lax.broadcasted_iota(jnp.int32, (_TW, BG), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (_TW, BG), 1)
    col_blk = [c_i // G == b for b in range(B)]
    col_w_f = (c_i % G).astype(jnp.float32)   # window col index field
    k_col_f = k2_i.astype(jnp.float32)        # tile col index field

    def sample_block(refs_lvl, l, pxs, pys):
        """Bilinear (G, G) grids for B points at level l. Static bounds.

        Sampling is EDGE-CLAMPED per window cell (≡ the XLA fallback's
        _sample_clamped / cv::BORDER_REPLICATE): each selector one-hot
        targets clip(window_row + cy, 0, h-1). Without clamping, coarse
        pyramid levels of small images (e.g. level 3 of 320x240 is 30x40 —
        smaller than one window margin band) reject nearly every window, the
        coarse-to-fine chain never initializes, and large motions are lost.

        Matmuls run in the pyramid's dtype (bf16 pyramids → bf16 MXU passes
        with f32 accumulation; selector one-hots and subpixel fractions are
        exactly/adequately representable in bf16 — fraction quantization is
        2^-8 ≈ 0.004 px, below the sensor's uint8 quantization)."""
        h, w = sizes[l]
        Hp, Wp = refs_lvl[l].shape
        dt = refs_lvl[l].dtype
        tiles = []
        in_oks = []
        # Bilinear selectors as TRIANGLE functions of the CONTINUOUS window
        # coordinate: one_hot(t0)·(1-f) + one_hot(t1)·f over edge-clamped taps
        # equals max(0, 1 - |k - clip(y_cont, 0, h-1)|) exactly (interior AND
        # border: when both taps clamp to the same index the triangle puts
        # weight 1 there) — about half the per-sample VPU field ops of the
        # two-one-hot construction. The row side needs no block mask in the
        # final expression: block b's target lives in [b·_TH, b·_TH+31] and
        # every other block's column is ≥ 1 away, where the triangle is 0.
        # Target accumulation in f32 (Mosaic has no scalar bf16 arith);
        # cast once before the MXU pass.
        Yr = jnp.zeros((BG, B * _TH), jnp.float32)   # row targets
        Xc = jnp.zeros((_TW, BG), jnp.float32)       # col targets
        for b in range(B):
            px, py = pxs[b], pys[b]
            ix = jnp.floor(px)
            iy = jnp.floor(py)
            # center-in-bounds status (≡ the XLA path's 1 px margin test);
            # the window itself is edge-clamped, not rejected
            in_oks.append((px >= 1.0) & (py >= 1.0)
                          & (px <= w - 2.0) & (py <= h - 2.0))
            cx = (ix - radius - 1).astype(jnp.int32)   # window top-left
            cy = (iy - radius - 1).astype(jnp.int32)
            oy = jnp.clip((cy // 8) * 8, 0, Hp - _TH)
            ox = jnp.clip((cx // 128) * 128, 0, Wp - _TW)
            tiles.append(refs_lvl[l][pl.ds(pl.multiple_of(oy, 8), _TH),
                                     pl.ds(pl.multiple_of(ox, 128), _TW)])
            # continuous tap coordinate = window_index + (p - radius - 1)
            yb = jnp.clip(row_w_f + (py - radius - 1.0), 0.0, h - 1.0) \
                + (b * _TH - oy).astype(jnp.float32)
            Yr = Yr + jnp.where(row_blk[b], yb, 0.0)
            xb = jnp.clip(col_w_f + (px - radius - 1.0), 0.0, w - 1.0) \
                - ox.astype(jnp.float32)
            Xc = Xc + jnp.where(col_blk[b], xb, 0.0)
        Rv = jnp.maximum(0.0, 1.0 - jnp.abs(k_row_f - Yr))
        Cv = jnp.maximum(0.0, 1.0 - jnp.abs(k_col_f - Xc))
        T = jnp.concatenate(tiles, axis=0)  # (B*_TH, _TW)
        if dt == jnp.bfloat16:
            # bf16 MXU inputs with f32 accumulation (v5e native bf16 passes;
            # f32 matmul is multi-pass emulation). Selector rows/cols have
            # <=2 nonzeros, so bf16 inputs lose nothing beyond the uint8
            # sensor quantization already in the pixels.
            # explicit DEFAULT precision: the package pins
            # jax_default_matmul_precision=float32 for geometry math, which
            # would force (unsupported) fp32-precision contracts on bf16.
            M = jnp.dot(Rv.astype(dt), T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
            Sfull = jnp.dot(M.astype(dt), Cv.astype(dt),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
        else:
            M = jnp.dot(Rv, T, preferred_element_type=jnp.float32)
            Sfull = jnp.dot(M, Cv, preferred_element_type=jnp.float32)
        S = [Sfull[b * G : (b + 1) * G, b * G : (b + 1) * G] for b in range(B)]
        return S, in_oks

    def track(src_refs, dst_refs, sx, sy, tfx, tfy, ok_in, lvls, want_err):
        """One coarse-to-fine LK track of B points from src to dst over the
        static level list ``lvls`` (descending, finest last). (sx, sy) start
        positions, (tfx, tfy) initial flow. With want_err=False the finest
        level's status comes from a bounds compare instead of a final image
        sample (the fb-consistency distance check supersedes the residual).
        Returns (fx, fy, ok, err) lists."""
        fx, fy = list(tfx), list(tfy)
        ok = list(ok_in)
        err = [jnp.float32(0.0)] * B
        for l in lvls:
            n_iters = iters[l]
            scale = jnp.float32(1.0 / (1 << l))
            S, lvl_ok = sample_block(src_refs, l,
                                     [x * scale for x in sx],
                                     [y * scale for y in sy])
            I, gx, gy = [], [], []
            iG00, iG01, iG11, can = [], [], [], []
            for b in range(B):
                Sb = S[b]
                I.append(Sb[1 : G - 1, 1 : G - 1])
                gxb = (Sb[1 : G - 1, 2:] - Sb[1 : G - 1, : G - 2]) * 0.5
                gyb = (Sb[2:, 1 : G - 1] - Sb[: G - 2, 1 : G - 1]) * 0.5
                gx.append(gxb)
                gy.append(gyb)
                gxx = jnp.sum(gxb * gxb)
                gxy = jnp.sum(gxb * gyb)
                gyy = jnp.sum(gyb * gyb)
                det = gxx * gyy - gxy * gxy
                tr = gxx + gyy
                min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
                eig_ok = (min_eig / n_win) > min_eig_threshold
                det_s = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
                iG00.append(gyy / det_s)
                iG01.append(-gxy / det_s)
                iG11.append(gxx / det_s)
                can.append(ok[b] & lvl_ok[b] & eig_ok)

            def newton_cond(st):
                _, _, conv, it = st
                active = jnp.bool_(False)
                for b in range(B):
                    active = active | (can[b] & ~conv[b])
                return active & (it < n_iters)

            def newton(st):
                fxs, fys, conv, it = st
                J, t_ok = sample_block(
                    dst_refs, l,
                    [(sx[b] + fxs[b]) * scale for b in range(B)],
                    [(sy[b] + fys[b]) * scale for b in range(B)])
                nfx, nfy, nconv = [], [], []
                for b in range(B):
                    e = I[b] - J[b][1 : G - 1, 1 : G - 1]
                    bx = jnp.sum(e * gx[b])
                    by = jnp.sum(e * gy[b])
                    dx_ = iG00[b] * bx + iG01[b] * by
                    dy_ = iG01[b] * bx + iG11[b] * by
                    act = can[b] & (~conv[b]) & t_ok[b]
                    nfx.append(fxs[b] + jnp.where(act, dx_ / scale, 0.0))
                    nfy.append(fys[b] + jnp.where(act, dy_ / scale, 0.0))
                    nconv.append(conv[b] | (dx_ * dx_ + dy_ * dy_ < eps * eps)
                                 | (~t_ok[b]))
                return tuple(nfx), tuple(nfy), tuple(nconv), it + 1

            if unroll:
                st = (tuple(fx), tuple(fy), (jnp.bool_(False),) * B,
                      jnp.int32(0))
                for _ in range(n_iters):
                    st = newton(st)
                fxs, fys = st[0], st[1]
            else:
                fxs, fys, _, _ = jax.lax.while_loop(
                    newton_cond, newton,
                    (tuple(fx), tuple(fy), (jnp.bool_(False),) * B,
                     jnp.int32(0)),
                )
            fx, fy = list(fxs), list(fys)
            # only the FINEST level decides status (≡ OpenCV/Metal margin
            # semantics); a coarse level that can't track contributes nothing
            if l == 0 and want_err:
                Jf, t_ok0 = sample_block(
                    dst_refs, 0,
                    [sx[b] + fx[b] for b in range(B)],
                    [sy[b] + fy[b] for b in range(B)])
                for b in range(B):
                    err[b] = jnp.sum(
                        jnp.abs(I[b] - Jf[b][1 : G - 1, 1 : G - 1])) / n_win
                    ok[b] = can[b] & t_ok0[b]
            elif l == 0:
                # status-only finish: same center-in-bounds test the final
                # sample would apply, computed from the position alone
                h0, w0 = sizes[0]
                for b in range(B):
                    pxb = sx[b] + fx[b]
                    pyb = sy[b] + fy[b]
                    pos_ok = ((pxb >= 1.0) & (pyb >= 1.0)
                              & (pxb <= w0 - 2.0) & (pyb <= h0 - 2.0))
                    ok[b] = can[b] & pos_ok
        return fx, fy, ok, err

    fwd_lvls = tuple(range(levels - 1, -1, -1))
    fx, fy, okf, err = track(prev_refs, next_refs, x0, y0, fx0, fy0, valid,
                             fwd_lvls, want_err=compute_err)

    if do_backward:
        sx2 = [x0[b] + fx[b] for b in range(B)]
        sy2 = [y0[b] + fy[b] for b in range(B)]
        bwd_lvls = tuple(range(min(bwd_levels, levels) - 1, -1, -1))
        bx, by, okb, _ = track(next_refs, prev_refs, sx2, sy2,
                               [-f for f in fx], [-f for f in fy], okf,
                               bwd_lvls, want_err=False)
        thr2 = fb_threshold * fb_threshold
        ok_out = [okf[b] & okb[b]
                  & ((fx[b] + bx[b]) ** 2 + (fy[b] + by[b]) ** 2 <= thr2)
                  for b in range(B)]
    else:
        ok_out = okf

    for b in range(B):
        is_valid = valid_ref[0, base + b] != 0
        out_xy_ref[0, base + b] = jnp.where(is_valid, x0[b] + fx[b], x0[b])
        out_xy_ref[1, base + b] = jnp.where(is_valid, y0[b] + fy[b], y0[b])
        out_ok_ref[0, base + b] = ok_out[b].astype(jnp.int32)
        out_err_ref[0, base + b] = err[b]


@functools.partial(jax.jit, static_argnames=(
    "radius", "iters", "fb_threshold", "block", "do_backward", "bwd_levels",
    "compute_err", "sizes", "unroll", "interpret"))
def lk_ragged_pallas(
    prev_levels,  # tuple of (Hp_l, Wp_l) float32, padded ragged pyramid
    next_levels,
    pts,          # (N, 2) float32
    valid,        # (N,) bool
    init_pts=None,
    radius: int = 10,
    iters=10,     # int (uniform) or fine→coarse per-level tuple
    eps: float = 0.01,
    min_eig_threshold: float = 1e-7,
    fb_threshold: float = 1.0,
    block: int = 8,
    do_backward: bool = True,
    bwd_levels: int = 0,  # 0 = full pyramid; k = finest k levels only
    compute_err: bool = True,  # False: err output is 0 (saves one sample)
    sizes=None,   # static ((h, w), ...) true level sizes; None = unpadded
    unroll: bool = False,
    interpret: bool = False,
):
    """Fused forward(+backward) pyramidal LK on a ragged pyramid pair.

    Returns (tracked (N,2), ok (N,), err (N,)). With do_backward, ok is the
    fwd-bwd-consistency status (≡ `keypoint_tracker.cpp:379-423`)."""
    levels = len(prev_levels)
    if sizes is None:
        sizes = tuple((int(p.shape[0]), int(p.shape[1])) for p in prev_levels)
    if isinstance(iters, int):
        iters = (iters,) * levels
    assert len(iters) == levels
    if bwd_levels <= 0:
        bwd_levels = levels
    n = pts.shape[0]
    if init_pts is None:
        init_pts = pts
    pad = (-n) % block
    if pad:
        pts = jnp.pad(pts, ((0, pad), (0, 0)))
        init_pts = jnp.pad(init_pts, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
    kernel = functools.partial(
        _lk_fb_kernel,
        levels=levels, sizes=sizes, radius=radius, iters=tuple(iters), eps=eps,
        min_eig_threshold=min_eig_threshold, fb_threshold=fb_threshold,
        B=block, do_backward=do_backward, bwd_levels=bwd_levels,
        compute_err=compute_err, unroll=unroll,
    )
    np_ = n + pad
    out_xy, out_ok, out_err = pl.pallas_call(
        kernel,
        grid=(np_ // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 * levels),
        out_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((2, np_), jnp.float32),
            jax.ShapeDtypeStruct((1, np_), jnp.int32),
            jax.ShapeDtypeStruct((1, np_), jnp.float32),
        ],
        interpret=interpret,
    )(pts.T, init_pts.T, valid.astype(jnp.int32)[None, :],
      *prev_levels, *next_levels)
    return out_xy.T[:n], (out_ok[0, :n] != 0) & valid[:n], out_err[0, :n]
