"""Batched binary-descriptor matching on the MXU.

Parity targets:
- BF cross-check matcher     ≡ `matcher.cpp:13-114` (BRUTE, crossCheck=true)
- KNN top-2 + ratio test     ≡ `matcher.cpp:116-217` (KNN, ratio default 0.8)
- FLANN                      — replaced by the same dense kernel: on TPU the
                               brute matrix IS the fast path (one MXU matmul
                               vs. pointer-chasing trees; cf. the reference's
                               6ms-vs-45ms FLANN discussion in
                               `zenslam_docs/development/flann-matcher-guide.md`)
- epipolar gating            ≡ `matching_utils.cpp:17-61` applied as a mask on
                               the distance matrix before the row/col argmins.

Key TPU trick: for bit-vectors a, b ∈ {0,1}^256,
    hamming(a, b) = |a| + |b| - 2 a·b
so a full (N, M) Hamming matrix is one (N, 256) x (256, M) matmul — systolic
array food, exact in bf16xbf16->f32 because all values are small integers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# plain python int: a module-level jnp constant would be materialized on the
# import-time default device and then baked into every jit as a device constant
BIG = 1 << 20


def unpack_bits(packed):
    """(N, 8) uint32 -> (N, 256) float32 of {0,1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (packed[..., :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(*packed.shape[:-1], 256).astype(jnp.float32)


@jax.jit
def hamming_matrix(packed_a, packed_b):
    """Full Hamming distance matrix (N, M) int32 via one MXU matmul."""
    a = unpack_bits(packed_a).astype(jnp.bfloat16)
    b = unpack_bits(packed_b).astype(jnp.bfloat16)
    na = jnp.sum(a, axis=-1, dtype=jnp.float32)
    nb = jnp.sum(b, axis=-1, dtype=jnp.float32)
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    d = na[:, None] + nb[None, :] - 2.0 * ab
    return d.astype(jnp.int32)


def _select_matches(D, valid_a, valid_b, max_distance, ratio, cross_check,
                    use_ratio, gate_mask, big):
    """Shared row/col-argmin match selection over a distance matrix D."""
    invalid = (~valid_a[:, None]) | (~valid_b[None, :])
    if gate_mask is not None:
        invalid = invalid | (~gate_mask)
    D = jnp.where(invalid, big, D)

    idx_b = jnp.argmin(D, axis=1).astype(jnp.int32)
    best = jnp.min(D, axis=1)
    ok = best <= max_distance

    if use_ratio:
        # second best: mask out the best column per row
        row = jnp.arange(D.shape[0])
        D2 = D.at[row, idx_b].set(big)
        second = jnp.min(D2, axis=1)
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))

    if cross_check:
        back = jnp.argmin(D, axis=0).astype(jnp.int32)  # best A for each B
        ok = ok & (back[idx_b] == jnp.arange(D.shape[0], dtype=jnp.int32))

    idx_b = jnp.where(ok, idx_b, -1)
    return idx_b, best, ok


@functools.partial(jax.jit, static_argnames=("cross_check", "use_ratio"))
def match_descriptors(
    packed_a,
    packed_b,
    valid_a,
    valid_b,
    max_distance: int = 64,
    ratio: float = 0.8,
    cross_check: bool = True,
    use_ratio: bool = False,
    gate_mask=None,
):
    """Match A-descriptors to B-descriptors with cross-check and/or ratio test.

    Args:
      packed_a: (N, 8) uint32; packed_b: (M, 8) uint32.
      valid_a/valid_b: bool masks.
      gate_mask: optional (N, M) bool — pairs allowed to match (e.g. epipolar
        gate or radius gate). Disallowed pairs get infinite distance.
    Returns:
      idx_b: (N,) int32 best match in B for each A (or -1)
      dist:  (N,) int32 best distance
      ok:    (N,) bool  match accepted
    """
    D = hamming_matrix(packed_a, packed_b)
    return _select_matches(D, valid_a, valid_b, max_distance, ratio,
                           cross_check, use_ratio, gate_mask, BIG)


@jax.jit
def l2_matrix(desc_a, desc_b):
    """Full squared-L2 distance matrix (N, M) float32 via one MXU matmul:
    ||a-b||² = |a|² + |b|² − 2 a·b (≡ the float-descriptor BF/FLANN matcher,
    `matcher.cpp` + `matching_utils.cpp:63-95` — on TPU the dense matmul IS
    the fast path, same argument as the Hamming kernel above)."""
    na = jnp.sum(desc_a * desc_a, axis=-1)
    nb = jnp.sum(desc_b * desc_b, axis=-1)
    ab = jax.lax.dot_general(
        desc_a, desc_b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    return jnp.maximum(na[:, None] + nb[None, :] - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("cross_check", "use_ratio"))
def match_descriptors_float(
    desc_a,
    desc_b,
    valid_a,
    valid_b,
    max_distance: float = 0.35,
    ratio: float = 0.8,
    cross_check: bool = True,
    use_ratio: bool = False,
    gate_mask=None,
):
    """L2 matcher for float descriptors (SIFT-family). Same contract as
    `match_descriptors`; ``max_distance`` is EUCLIDEAN (not squared) and the
    ratio test compares euclidean distances like Lowe's."""
    D = jnp.sqrt(l2_matrix(desc_a, desc_b) + 1e-12)
    return _select_matches(D, valid_a, valid_b, max_distance, ratio,
                           cross_check, use_ratio, gate_mask, jnp.float32(1e9))


def _lsh_planes(dim: int = 128, bits: int = 256, seed: int = 77):
    import numpy as np

    rs = np.random.RandomState(seed)
    return rs.normal(0.0, 1.0, size=(dim, bits)).astype(np.float32)


@jax.jit
def lsh_binarize(desc):
    """(N, D) float descriptors -> (N, 8) packed uint32 sign-of-projection
    bits (256 fixed random hyperplanes). Lets the float-descriptor family
    flow through every binary consumer (keyframe snapshots, BoW vocabulary,
    loop-closure matching) unchanged — Hamming distance of the codes
    approximates angular distance of the float vectors (Charikar SimHash)."""
    planes = jnp.asarray(_lsh_planes(desc.shape[-1]))
    bits = (desc @ planes > 0.0)                       # (N, 256)
    b = bits.reshape(*desc.shape[:-1], 8, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


@jax.jit
def radius_gate(xy_a, xy_b, radius: float):
    """(N, M) bool mask: ||a - b|| <= radius. For landmark re-association
    (≡ KD radius search over `point3d_cloud`, `matching_utils.cpp:132-217`)."""
    d2 = jnp.sum((xy_a[:, None, :] - xy_b[None, :, :]) ** 2, axis=-1)
    return d2 <= radius * radius


@jax.jit
def epipolar_gate(F, uv_a, uv_b, threshold: float):
    """(N, M) bool mask of pairs within epipolar distance (`matching_utils.cpp:17-61`)."""
    ones_a = jnp.ones_like(uv_a[..., :1])
    ones_b = jnp.ones_like(uv_b[..., :1])
    pa = jnp.concatenate([uv_a, ones_a], axis=-1)  # (N, 3)
    pb = jnp.concatenate([uv_b, ones_b], axis=-1)  # (M, 3)
    lines = pa @ F.T  # (N, 3) epipolar lines in B image
    num = jnp.abs(lines @ pb.T)  # (N, M)
    den = jnp.linalg.norm(lines[:, :2], axis=-1, keepdims=True) + 1e-12
    return (num / den) <= threshold
