"""Pallas TPU kernel for ORB: orientation + steered-BRIEF in one pass.

Replaces the XLA formulation's two hot spots at the 1024x1024 operating point
(measured via profile_trace.py, see ROOFLINE.md):

- the (N, 256) nearest-pixel descriptor gathers (`ops/orb.py:109-117`) —
  2x ~0.93 ms/frame of serialized scattered loads, and
- the dense integral-image moment maps for orientation
  (`ops/orb.py:69-87`) — ~0.7 ms/frame of 1024-tap cumsum convolutions that
  compute centroids for every pixel when only ~512 are read.

Kernel shape (same aligned-tile + selector-matmul scheme as ops/lk_pallas.py):
each keypoint loads ONE aligned (56, 256) VMEM tile around its rounded
center — tall/wide enough for the 31x31 moment window and every rotated
pattern offset (|clip| <= 14, x sqrt(2) rotation < 20, +1 rounding) at any
sublane/lane misalignment. Then:

1. orientation: m10/m01 as masked iota-weighted sums over the tile (VPU);
   cos/sin by normalization — no arctan needed to steer.
2. sampling: the 512 rotated pattern points become one one-hot row-selector
   matmul M = Rsel(512,56) @ tile(56,256) on the MXU followed by an
   elementwise one-hot column pick (VPU) — nearest-pixel semantics identical
   to the XLA path's round+clip gather.

Parity: same pattern table, same round/clip convention, bf16 tile samples
(quantization 2^-8 — the same order as the uint8 sensor data, and the pairs
it can flip are the noise-dominated ones; the parity test bounds the Hamming
distance to the f32 XLA path).

Reference: cv::ORB per-keypoint loops (`keypoint_detector_simple.cpp:8-36`);
this is the dense TPU redesign, not a translation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zenslam_tpu.ops.image import gaussian_blur
from zenslam_tpu.ops.orb import ORB_PATTERN, _PATCH_RADIUS

_TH = 56    # tile rows:  8-align slack (7) + 2*reach (42) + rounding
_TW = 256   # tile cols:  128-align slack (127) + 2*reach fits in 256
_REACH = 21  # max |rotated pattern offset| + rounding margin


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _orb_kernel(pts_ref, valid_ref, needs_ref, img_ref, pat_ref, out_bits_ref,
                out_cs_ref, *, H: int, W: int, B: int):
    r = _PATCH_RADIUS
    base = pl.program_id(0) * B
    Hp, Wp = img_ref.shape
    # pattern input: both endpoints stacked -> (512, 1) columns
    PX = pat_ref[:, 0:1]  # (512, 1)
    PY = pat_ref[:, 1:2]

    # whole-block skip: when the caller compacts needs-describing points to
    # the front (describe-at-detection semantics — tracked features keep
    # their detection-time descriptor, `keypoint_detector_simple.cpp`), the
    # tail blocks are all-skip and this grid step costs ~nothing. Skipped
    # rows' outputs are UNDEFINED — the caller merges via the needs mask.
    any_need = needs_ref[0, base] != 0
    for b in range(1, B):
        any_need = any_need | (needs_ref[0, base + b] != 0)

    @pl.when(any_need)
    def _block_body():
        _orb_block(pts_ref, valid_ref, img_ref, PX, PY, out_bits_ref,
                   out_cs_ref, base=base, H=H, W=W, B=B, Hp=Hp, Wp=Wp, r=r)


def _orb_block(pts_ref, valid_ref, img_ref, PX, PY, out_bits_ref,
               out_cs_ref, *, base, H, W, B, Hp, Wp, r):
    row_f = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 0)
    col_f = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW), 1)
    sel_r = jax.lax.broadcasted_iota(jnp.int32, (2 * 256, _TH), 1)
    sel_c = jax.lax.broadcasted_iota(jnp.int32, (2 * 256, _TW), 1)

    for b in range(B):
        xc = pts_ref[0, base + b]
        yc = pts_ref[1, base + b]
        xi = jnp.round(xc).astype(jnp.int32)
        yi = jnp.round(yc).astype(jnp.int32)
        oy = jnp.clip(((yi - _REACH) // 8) * 8, 0, Hp - _TH)
        ox = jnp.clip(((xi - _REACH) // 128) * 128, 0, Wp - _TW)
        T = img_ref[pl.ds(pl.multiple_of(oy, 8), _TH),
                    pl.ds(pl.multiple_of(ox, 128), _TW)]
        Tf = T.astype(jnp.float32)

        # intensity-centroid moments over the 31x31 square window centered
        # at the rounded keypoint (≡ ops/orb.py box() semantics: zero
        # contribution outside the true image)
        dy = row_f - (yi - oy)
        dx = col_f - (xi - ox)
        inside = ((jnp.abs(dy) <= r) & (jnp.abs(dx) <= r)
                  & (row_f + oy < H) & (col_f + ox < W))
        wimg = jnp.where(inside, Tf, 0.0)
        m10 = jnp.sum(dx.astype(jnp.float32) * wimg)
        m01 = jnp.sum(dy.astype(jnp.float32) * wimg)
        nrm = jnp.sqrt(m10 * m10 + m01 * m01)
        good = nrm > 1e-12
        c = jnp.where(good, m10 / jnp.maximum(nrm, 1e-12), 1.0)
        s = jnp.where(good, m01 / jnp.maximum(nrm, 1e-12), 0.0)

        # rotated nearest-pixel sample coordinates (≡ round+clip gather)
        qx = xc + PX * c - PY * s            # (512, 1)
        qy = yc + PX * s + PY * c
        kx = jnp.clip(jnp.round(qx).astype(jnp.int32), 0, W - 1) - ox
        ky = jnp.clip(jnp.round(qy).astype(jnp.int32), 0, H - 1) - oy
        kx = jnp.clip(kx, 0, _TW - 1)
        ky = jnp.clip(ky, 0, _TH - 1)

        Rsel = (sel_r == ky).astype(T.dtype)          # (512, 56)
        if T.dtype == jnp.bfloat16:
            M = jnp.dot(Rsel, T, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
        else:
            M = jnp.dot(Rsel, T, preferred_element_type=jnp.float32)
        vals = jnp.sum(jnp.where(sel_c == kx, M, 0.0), axis=1)  # (512,)
        v1 = vals[:256]
        v2 = vals[256:]
        ok = valid_ref[0, base + b] != 0
        bits = ((v1 < v2) & ok).astype(jnp.int32)
        out_bits_ref[base + b, :] = bits
        out_cs_ref[0, base + b] = c
        out_cs_ref[1, base + b] = s


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def orb_pallas(sm, xy, valid, needs=None, block: int = 2,
               interpret: bool = False):
    """Steered-BRIEF bits from a pre-smoothed image.

    sm: (H, W) smoothed image (f32 or bf16); xy: (N, 2); valid: (N,).
    needs: optional (N,) bool — rows whose descriptor must be computed; a
    block whose rows all have needs=False is SKIPPED entirely (its output
    rows are undefined — the caller must merge via the mask). None = valid.
    Returns (bits (N, 256) int32, cos (N,), sin (N,)).
    """
    H, W = sm.shape
    Hp = max(_TH, _round_up(H, 8))
    Wp = max(_TW, _round_up(W, 128))
    if (Hp, Wp) != (H, W):
        sm = jnp.pad(sm, ((0, Hp - H), (0, Wp - W)))
    n = xy.shape[0]
    if needs is None:
        needs = valid
    pad = (-n) % block
    if pad:
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        valid = jnp.pad(valid, (0, pad))
        needs = jnp.pad(needs, (0, pad))
    np_ = n + pad
    kernel = functools.partial(_orb_kernel, H=H, W=W, B=block)
    pat = np.concatenate([ORB_PATTERN[:, 0:2], ORB_PATTERN[:, 2:4]], axis=0)
    bits, cs = pl.pallas_call(
        kernel,
        grid=(np_ // block,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((np_, 256), jnp.int32),
            jax.ShapeDtypeStruct((2, np_), jnp.float32),
        ],
        interpret=interpret,
    )(xy.T, valid.astype(jnp.int32)[None, :],
      needs.astype(jnp.int32)[None, :], sm, jnp.asarray(pat))
    return bits[:n], cs[0, :n], cs[1, :n]


@functools.partial(jax.jit, static_argnames=("interpret",))
def orb_descriptors_pallas(img, xy, valid, needs=None,
                           interpret: bool = False):
    """Drop-in replacement for ops/orb.py:orb_descriptors on TPU.

    Same contract: returns (packed (N, 8) uint32, angles (N,)). Smoothing
    and bit packing stay in XLA (cheap, fused); the tile kernel does
    orientation + sampling in bf16.

    needs: optional (N,) bool — compute only these rows (others return
    UNDEFINED rows the caller merges away). The rows are compacted to the
    front so the kernel's whole-block skip turns the untouched tail into
    ~free grid steps (steady state: ~3-30 new detections of 512 slots).
    """
    sm = gaussian_blur(img, sigma=2.0, radius=4).astype(jnp.bfloat16)
    if needs is None:
        bits, c, s = orb_pallas(sm, xy, valid, interpret=interpret)
    else:
        need = needs & valid
        order = jnp.argsort(~need, stable=True)
        inv = jnp.argsort(order)
        bits, c, s = orb_pallas(sm, xy[order], need[order],
                                needs=need[order], interpret=interpret)
        bits, c, s = bits[inv], c[inv], s[inv]
    theta = jnp.arctan2(s, c)
    bitsu = bits.astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    words = bitsu.reshape(-1, 8, 32) << shifts[None, None, :]
    packed = jnp.sum(words, axis=-1).astype(jnp.uint32)
    return packed, theta
