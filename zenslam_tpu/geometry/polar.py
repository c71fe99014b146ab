"""Fusable small-matrix rotation extraction — SVD-free on the hot path.

The estimation layer (`estimation/pnp.py`, `estimation/rigid.py`,
`estimation/epipolar.py`) projects small matrices onto SO(3) / rank-2 inside
vmapped RANSAC hypothesis batches (2x128 PnP DLTs, 128 Umeyama covs, 128
eight-point F's per frame). `jnp.linalg.svd` on those (…,3,3) batches lowers
to LAPACK-style custom calls + while-loops on TPU — ~2 ms/frame of
latency-bound serial passes that XLA cannot fuse (measured via
profile_trace.py, see ROOFLINE.md). Every routine here is plain
elementwise/matmul arithmetic, so the whole hypothesis batch fuses into the
surrounding RANSAC program.

Reference parity note: these replace cv::SVDecomp-based rotation extraction
(`utils/rigid_transform.cpp:12-78`, `point_estimator.cpp:233-296`) with
numerically equivalent closed-form/iterative schemes; unit tests assert
agreement with jnp.linalg.svd to f32 tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def polar_so3(M, iters: int = 22):
    """Orthogonal polar factor of a (…,3,3) matrix by Newton–Schulz.

    Returns (Q, s): Q the nearest orthogonal matrix (det ±1 follows det(M) —
    callers that fixed the sign upstream, e.g. by cheirality, get a proper
    rotation), s = tr(QᵀM)/3 = mean singular value (the DLT scale).

    Frobenius pre-normalization puts every singular value in (0, 1], inside
    the Newton–Schulz convergence region σ ∈ (0, √3); σ grows only ~1.5x/step
    while small, then cubically near 1, so reaching σ_min ≈ 1 needs
    ≈ log₁.₅(cond) + 4 steps. ``iters`` = 22 converges to f32 precision up to
    cond(M) ≈ 10³ (measured: max ‖QQᵀ−I‖∞ = 2.4e-7 at cond 10³; 0.7 at 10⁴).
    Each step is two fused 3x3 matmuls, so the cost is negligible against the
    RANSAC scoring around it. Beyond the envelope the result degrades toward
    the dominant singular directions — callers re-orthonormalize and GN-polish
    the RANSAC winner, and such ill-conditioned M only arise from degenerate
    minimal samples that score themselves out. Rank-deficient inputs
    (σ_min = 0) stay rank-deficient — such hypotheses score zero inliers
    downstream.
    """
    nrm = jnp.sqrt(jnp.sum(M * M, axis=(-2, -1), keepdims=True))
    X = M / jnp.maximum(nrm, 1e-20)
    eye = jnp.eye(3, dtype=M.dtype)
    for _ in range(iters):
        X = 1.5 * X - 0.5 * X @ (jnp.swapaxes(X, -1, -2) @ X)
    s = jnp.einsum("...ij,...ij->...", X, M) / 3.0
    return X, s


def rotation_from_cov(cov, squarings: int = 10):
    """Optimal rotation R maximizing tr(Rᵀ·cov) for cov = Σ wᵢ dᵢ sᵢᵀ
    (dst·srcᵀ) — the Umeyama/Wahba rotation, ALWAYS a proper rotation.

    Horn's unit-quaternion method (closed-form absolute orientation): the
    optimum is the largest eigenvector of the symmetric 4x4 N(cov). Unlike
    the SVD route (U·diag(1,1,det)·Vᵀ) this needs no reflection fix-up and
    handles the rank-2 covariances that every 3-point minimal RANSAC sample
    produces (where Newton–Schulz polar iteration would break: σ₃ = 0
    stays 0).

    The eigenvector comes from repeated squaring of B = N + ‖N‖_F·I
    (normalized each squaring): B^(2^k) → λ₁^(2^k)·v₁v₁ᵀ, so ANY column with
    non-trivial norm is the answer — immune to the orthogonal-start failure
    of plain power iteration, and the convergence ratio squares per step:
    10 squarings apply ratio^1024. Degenerate samples (λ₁ ≈ λ₂: collinear
    points, ambiguous rotation) yield a blend that scores itself out of the
    RANSAC vote. Near-rank-1 covariances (all three sample points nearly
    collinear, σ₂/σ₁ → 0) are degenerate the same way: the in-line rotation
    component is unobservable and the returned R is one arbitrary member of
    the optimal family — RANSAC scoring disposes of such hypotheses.
    """
    A = cov
    a = lambda i, j: A[..., i, j]
    trA = a(0, 0) + a(1, 1) + a(2, 2)
    # N(A): qᵀ N q = tr(R(q)·A)  [Horn 1987, eq. 39-40]
    N = jnp.stack([
        jnp.stack([trA, a(1, 2) - a(2, 1), a(2, 0) - a(0, 2), a(0, 1) - a(1, 0)], -1),
        jnp.stack([a(1, 2) - a(2, 1), a(0, 0) - a(1, 1) - a(2, 2),
                   a(0, 1) + a(1, 0), a(0, 2) + a(2, 0)], -1),
        jnp.stack([a(2, 0) - a(0, 2), a(0, 1) + a(1, 0),
                   a(1, 1) - a(0, 0) - a(2, 2), a(1, 2) + a(2, 1)], -1),
        jnp.stack([a(0, 1) - a(1, 0), a(0, 2) + a(2, 0),
                   a(1, 2) + a(2, 1), a(2, 2) - a(0, 0) - a(1, 1)], -1),
    ], axis=-2)  # (..., 4, 4)
    c = jnp.sqrt(jnp.sum(N * N, axis=(-2, -1), keepdims=True))
    B = (N + c * jnp.eye(4, dtype=cov.dtype)) / jnp.maximum(c, 1e-30)
    for _ in range(squarings):
        B = B @ B
        B = B / jnp.maximum(
            jnp.sqrt(jnp.sum(B * B, axis=(-2, -1), keepdims=True)), 1e-30)
    # dominant column (v₁ has ≥ 1/2 magnitude in some coordinate)
    col_n = jnp.sum(B * B, axis=-2)                       # (..., 4)
    pick = jax.nn.one_hot(jnp.argmax(col_n, axis=-1), 4, dtype=cov.dtype)
    q = jnp.einsum("...ij,...j->...i", B, pick)
    q = q / jnp.maximum(
        jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True)), 1e-30)
    # N(A)'s optimum satisfies tr(R(q)·A) max — i.e. R(q) = Rᵀ for our
    # cov = Σ d sᵀ convention; transpose to return the d ≈ R s rotation.
    return jnp.swapaxes(quat_to_rotation(q), -1, -2)


def quat_to_rotation(q):
    """(…,4) unit quaternion [w, x, y, z] -> (…,3,3) rotation."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    r1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    r2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([r0, r1, r2], axis=-2)


def _inv3(A, eps: float = 0.0):
    """Analytic (…,3,3) inverse via the adjugate — fusable, no custom call."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], axis=-2)
    return adj / det[..., None, None]


def _chol_unrolled(A):
    """Fused lower-Cholesky of a small SPD (…,n,n) matrix, column-unrolled at
    trace time: every op is an elementwise/small-contraction over the batch
    dims, so the whole factorization fuses into the surrounding program — no
    LAPACK-style custom call, with the custom call's backward stability
    (unlike adjugate/Schur-block inversion, which loses ~cond·eps and fell
    apart on the cond≈1e6 shifted DLT normal matrices the RANSAC solvers
    feed this). The sqrt argument is clamped so a (numerically) semidefinite
    input yields a finite factor rather than NaN."""
    n = A.shape[-1]
    L = jnp.zeros_like(A)
    for j in range(n):
        if j:
            c = A[..., j:, j] - jnp.einsum(
                "...ik,...k->...i", L[..., j:, :j], L[..., j, :j])
        else:
            c = A[..., :, 0]
        d = jnp.sqrt(jnp.maximum(c[..., 0], 1e-30))
        col = c / d[..., None]
        col = col.at[..., 0].set(d)
        L = L.at[..., j:, j].set(col)
    return L


def _tri_solve_unrolled(L, B, lower: bool):
    """Solve L X = B (or Lᵀ X = B with lower=False) by unrolled substitution.
    L (…,n,n) lower-triangular, B (…,n,m)."""
    n = L.shape[-1]
    order = range(n) if lower else range(n - 1, -1, -1)
    xs = {}
    for i in order:
        acc = B[..., i, :]
        ks = range(i) if lower else range(i + 1, n)
        for k in ks:
            lik = L[..., i, k] if lower else L[..., k, i]
            acc = acc - lik[..., None] * xs[k]
        xs[i] = acc / L[..., i, i, None]
    return jnp.stack([xs[i] for i in range(n)], axis=-2)


def inv_spd(A):
    """Fused inverse of a small symmetric positive-definite (…,n,n) matrix
    via column-unrolled Cholesky + unrolled triangular solves — numerically
    equivalent to cho_factor/cho_solve but with zero custom calls, so it
    fuses into vmapped RANSAC hypothesis batches and the per-landmark 6x6
    blocks of the BA Schur step (ROOFLINE r4: the batched 12x12/9x9 Cholesky
    custom calls cost 0.45 ms/frame in the cascade alone). n=3 uses the
    analytic adjugate."""
    n = A.shape[-1]
    if n == 3:
        return _inv3(A)
    L = _chol_unrolled(A)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    Y = _tri_solve_unrolled(L, eye, lower=True)
    return _tri_solve_unrolled(L, Y, lower=False)


def solve_spd(A, b):
    """Fused solve A x = b for small SPD A (…,n,n), b (…,n) or (…,n,m) via
    the unrolled Cholesky — no custom call."""
    n = A.shape[-1]
    squeeze = b.ndim == A.ndim - 1
    if squeeze:
        b = b[..., None]
    if n == 3:
        x = _inv3(A) @ b
    else:
        L = _chol_unrolled(A)
        x = _tri_solve_unrolled(L, _tri_solve_unrolled(L, b, lower=True),
                                lower=False)
    return x[..., 0] if squeeze else x


def smallest_eigvec_3(A, iters: int = 6, shift: float = 1e-4):
    """Smallest eigenvector of a symmetric PSD (…,3,3) matrix by shifted
    inverse iteration with the ANALYTIC 3x3 inverse (no Cholesky custom
    call). Same separation rationale as `pnp.py:_smallest_eigvec_12` — the
    callers' smallest eigenvalue is (near-)zero and well split (FᵀF of an
    eight-point F has λ₃ ≈ 0; generic unseparated spectra converge slowly
    and belong to degenerate hypotheses that score themselves out).

    Two ORTHOGONAL deterministic non-symmetric seeds run side by side and a
    Rayleigh-quotient vote picks the winner: a single fixed start can be
    (near-)exactly orthogonal to the target eigenvector (e.g. the symmetric
    (1,1,1)/√3 vs v₃ = (1,-1,0)/√2 under axis-symmetric motion), in which
    case inverse iteration never recovers the lost component — but no 3-vector
    is orthogonal to both seeds, so at least one converges."""
    tr = A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]
    scale = jnp.maximum(tr / 3.0, 1e-20)[..., None, None]
    eye = jnp.eye(3, dtype=A.dtype)
    An = A / scale
    Ainv = _inv3(An + shift * eye)
    # orthonormal pair, neither aligned with any symmetry axis
    V = jnp.asarray([[0.36, 0.48], [0.48, 0.64], [0.80, -0.60]], A.dtype)
    V = jnp.broadcast_to(V, A.shape[:-2] + (3, 2))
    for _ in range(iters):
        V = Ainv @ V
        V = V / jnp.maximum(jnp.sqrt(jnp.sum(V * V, -2, keepdims=True)), 1e-30)
    # Rayleigh quotients under the scaled A: smaller = closer to v₃
    r = jnp.einsum("...ik,...ij,...jk->...k", V, An, V)
    pick = jax.nn.one_hot(jnp.argmin(r, axis=-1), 2, dtype=A.dtype)
    return jnp.einsum("...ik,...k->...i", V, pick)


def project_rank2(F):
    """Remove the smallest singular triplet of a (…,3,3) matrix:
    F' = F(I − v₃v₃ᵀ) with v₃ the smallest right-singular vector — the
    rank-2 projection the eight-point algorithm needs, without an SVD."""
    FtF = jnp.swapaxes(F, -1, -2) @ F
    v3 = smallest_eigvec_3(FtF)
    return F - (F @ v3[..., None]) @ v3[..., None, :]
