"""Bundle adjustment: damped Gauss-Newton with Schur-complement reduction.

This replaces the reference's Ceres back-end (`optimization/
local_bundle_adjustment.cpp:184-417`) feature-for-feature, TPU-shaped:

- reprojection residual (2 per obs, 6-dof pose + 3-dof point)   ≡ the AutoDiff
  functor at `local_bundle_adjustment.cpp:22-62` — here with ANALYTIC
  Jacobians (same math, no tape)
- Huber robust loss                                             ≡ `:307-340`
- gauge fixing via mask (fixed keyframes)                       ≡ SetParameterBlockConstant `:342-347`
- motion-only mode (landmarks frozen, pose-only)                ≡ SubsetManifold `:357-377`
- SPARSE_SCHUR                                                  ≡ `:379-387`:
  landmark (3x3) blocks eliminated in closed form, reduced camera system
  solved dense — the camera count in a local window is tiny (≤64), so the
  reduced system is a (6K, 6K) Cholesky solve, pure MXU food
- Levenberg-Marquardt damping with accept/reject                ≡ LM in `:379`

Representation: everything fixed-capacity and masked (invalid keyframes /
landmarks / observations contribute zero), so the optimizer jits once and is
reusable every keyframe and shardable with shard_map (see parallel/dist_ba.py:
V/W blocks are per-landmark → landmark-sharded; U, S, g are psum-reduced).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.lie import so3_exp, so3_hat


class BAProblem(NamedTuple):
    """Masked BA problem. K keyframes, M landmarks, O observations."""

    # keyframe poses, world->cam
    R: jnp.ndarray          # (K, 3, 3)
    t: jnp.ndarray          # (K, 3)
    kf_valid: jnp.ndarray   # (K,) bool
    kf_fixed: jnp.ndarray   # (K,) bool — gauge
    # landmarks
    xyz: jnp.ndarray        # (M, 3)
    lm_valid: jnp.ndarray   # (M,) bool
    # observations; obs_cam: 0 = left, 1 = right (through the rig extrinsics).
    # STEREO observations are what anchor metric scale in a window whose gauge
    # fixes only one keyframe — left-only BA is monocular and scale-drifts.
    obs_kf: jnp.ndarray     # (O,) int32
    obs_lm: jnp.ndarray     # (O,) int32
    obs_uv: jnp.ndarray     # (O, 2)
    obs_cam: jnp.ndarray    # (O,) int32
    obs_valid: jnp.ndarray  # (O,) bool
    # intrinsics (left camera / right camera) + stereo extrinsics T_rl
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    fx_r: jnp.ndarray
    fy_r: jnp.ndarray
    cx_r: jnp.ndarray
    cy_r: jnp.ndarray
    R_rl: jnp.ndarray       # (3,3)
    t_rl: jnp.ndarray       # (3,)


def make_ba_problem(K, M, O, fx, fy, cx, cy, fx_r=None, fy_r=None, cx_r=None,
                    cy_r=None, R_rl=None, t_rl=None):
    """Empty fixed-capacity problem. Defaults: right camera = left camera,
    identity extrinsics (obs_cam==0 everywhere reproduces monocular BA)."""
    return BAProblem(
        R=jnp.tile(jnp.eye(3, dtype=jnp.float32), (K, 1, 1)),
        t=jnp.zeros((K, 3), jnp.float32),
        kf_valid=jnp.zeros(K, bool),
        kf_fixed=jnp.zeros(K, bool),
        xyz=jnp.zeros((M, 3), jnp.float32),
        lm_valid=jnp.zeros(M, bool),
        obs_kf=jnp.zeros(O, jnp.int32),
        obs_lm=jnp.zeros(O, jnp.int32),
        obs_uv=jnp.zeros((O, 2), jnp.float32),
        obs_cam=jnp.zeros(O, jnp.int32),
        obs_valid=jnp.zeros(O, bool),
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        cx=jnp.float32(cx), cy=jnp.float32(cy),
        fx_r=jnp.float32(fx if fx_r is None else fx_r),
        fy_r=jnp.float32(fy if fy_r is None else fy_r),
        cx_r=jnp.float32(cx if cx_r is None else cx_r),
        cy_r=jnp.float32(cy if cy_r is None else cy_r),
        R_rl=jnp.eye(3, dtype=jnp.float32) if R_rl is None else jnp.asarray(R_rl),
        t_rl=jnp.zeros(3, jnp.float32) if t_rl is None else jnp.asarray(t_rl),
    )


def _residuals_and_weights(p: BAProblem, R, t, xyz, huber_delta: float):
    """Per-observation residual (O, 2), robust weight (O,), validity (O,).

    Also returns xc0 (the LEFT-camera-frame point — the pose-Jacobian pivot)
    and the per-obs chain rotation C = (cam==1 ? R_rl : I) @ Rk for the
    landmark Jacobian, plus the per-obs projection intrinsics."""
    kf = jnp.clip(p.obs_kf, 0, R.shape[0] - 1)
    lm = jnp.clip(p.obs_lm, 0, xyz.shape[0] - 1)
    Rk = R[kf]
    tk = t[kf]
    X = xyz[lm]
    xc0 = jnp.einsum("oij,oj->oi", Rk, X) + tk        # left-camera frame
    is_r = (p.obs_cam == 1)
    xc = jnp.where(is_r[:, None], xc0 @ p.R_rl.T + p.t_rl, xc0)
    fx = jnp.where(is_r, p.fx_r, p.fx)
    fy = jnp.where(is_r, p.fy_r, p.fy)
    cx = jnp.where(is_r, p.cx_r, p.cx)
    cy = jnp.where(is_r, p.cy_r, p.cy)
    z = xc[:, 2]
    # cheirality gate z > 1e-3 ≡ observation harvest gate (`:241-281`)
    good = p.obs_valid & (z > 1e-3)
    z_safe = jnp.where(jnp.abs(z) < 1e-3, 1e-3, z)
    u = fx * xc[:, 0] / z_safe + cx
    v = fy * xc[:, 1] / z_safe + cy
    r = jnp.stack([u - p.obs_uv[:, 0], v - p.obs_uv[:, 1]], axis=-1)
    rn = jnp.linalg.norm(r, axis=-1)
    w_huber = jnp.where(rn <= huber_delta, 1.0, huber_delta / jnp.maximum(rn, 1e-12))
    w = jnp.where(good, w_huber, 0.0)
    return r, w, good, xc, Rk, xc0, is_r, (fx, fy)


def ba_cost(p: BAProblem, R=None, t=None, xyz=None, huber_delta: float = 1.0):
    """Total robust cost + RMSE over valid observations (the before/after
    numbers the reference logs, `local_bundle_adjustment.cpp:114-176`)."""
    R = p.R if R is None else R
    t = p.t if t is None else t
    xyz = p.xyz if xyz is None else xyz
    r, w, good, *_ = _residuals_and_weights(p, R, t, xyz, huber_delta)
    r2 = jnp.sum(r * r, axis=-1)
    # Huber rho
    delta = huber_delta
    rn = jnp.sqrt(jnp.maximum(r2, 1e-18))
    rho = jnp.where(rn <= delta, 0.5 * r2, delta * (rn - 0.5 * delta))
    cost = jnp.sum(jnp.where(good, rho, 0.0))
    n = jnp.maximum(jnp.sum(good), 1)
    rmse = jnp.sqrt(jnp.sum(jnp.where(good, r2, 0.0)) / n)
    return cost, rmse


def _build_blocks(p: BAProblem, R, t, xyz, huber_delta: float):
    """Assemble the sparse normal-equation blocks.

    Returns U (K,6,6), g_p (K,6), V (M,3,3), g_l (M,3), A (M,K,6,3) with
    A[m,k] = sum over obs(k,m) of J_p^T W J_l (the off-diagonal W blocks
    aggregated per (landmark, keyframe) pair), and the total cost.
    """
    K = R.shape[0]
    M = xyz.shape[0]
    r, w, good, xc, Rk, xc0, is_r, (fx, fy) = _residuals_and_weights(p, R, t, xyz, huber_delta)
    kf = jnp.clip(p.obs_kf, 0, K - 1)
    lm = jnp.clip(p.obs_lm, 0, M - 1)

    z = jnp.where(jnp.abs(xc[:, 2]) < 1e-3, 1e-3, xc[:, 2])
    inv_z = 1.0 / z
    x_, y_ = xc[:, 0], xc[:, 1]
    # d(uv)/d(xc)  (O, 2, 3) with per-observation intrinsics
    zeros = jnp.zeros_like(z)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * x_ * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z, -fy * y_ * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    # chain rotation: xc = C_chain xc0 + const with C_chain = R_rl for right obs
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), xc.shape[:1] + (3, 3))
    C_chain = jnp.where(is_r[:, None, None], jnp.broadcast_to(p.R_rl, eye.shape), eye)
    # pose: left-multiplicative increment on the LEFT-camera pose:
    # xc0' = exp(w) xc0 + dt  =>  dxc/dxi = C_chain [I, -hat(xc0)]
    J_pose = C_chain @ jnp.concatenate([eye, -so3_hat(xc0)], axis=-1)  # (O, 3, 6)
    Jp = J_proj @ J_pose        # (O, 2, 6)
    Jl = J_proj @ (C_chain @ Rk)  # (O, 2, 3)  d(uv)/dX

    Jp_w = Jp * w[:, None, None]
    Jl_w = Jl * w[:, None, None]

    # segment-sum into per-keyframe / per-landmark blocks
    U = jnp.zeros((K, 6, 6), R.dtype).at[kf].add(jnp.einsum("oai,oaj->oij", Jp_w, Jp))
    g_p = jnp.zeros((K, 6), R.dtype).at[kf].add(-jnp.einsum("oai,oa->oi", Jp_w, r))
    V = jnp.zeros((M, 3, 3), R.dtype).at[lm].add(jnp.einsum("oai,oaj->oij", Jl_w, Jl))
    g_l = jnp.zeros((M, 3), R.dtype).at[lm].add(-jnp.einsum("oai,oa->oi", Jl_w, r))
    # W blocks aggregated per (landmark, keyframe): scatter into (M, K, 6, 3)
    Wb = jnp.einsum("oai,oaj->oij", Jp_w, Jl)  # (O, 6, 3)
    A = jnp.zeros((M, K, 6, 3), R.dtype).at[lm, kf].add(Wb)
    return U, g_p, V, g_l, A


def _inv3x3(V):
    """Batched closed-form 3x3 inverse via adjugate (M, 3, 3)."""
    a, b, c = V[..., 0, 0], V[..., 0, 1], V[..., 0, 2]
    d, e, f = V[..., 1, 0], V[..., 1, 1], V[..., 1, 2]
    g, h, i = V[..., 2, 0], V[..., 2, 1], V[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
            jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def _schur_reduce(U, g_p, V, g_l, A, lm_active, lam):
    """Eliminate landmarks; return dense reduced camera system (6K,6K), rhs."""
    K = U.shape[0]
    # damp V and invert (inactive landmarks get identity — their A is zero)
    Vd = V + lam * jnp.eye(3, dtype=V.dtype)[None]
    Vd = jnp.where(lm_active[:, None, None], Vd, jnp.eye(3, dtype=V.dtype)[None])
    Vinv = _inv3x3(Vd)
    B = jnp.einsum("mkab,mbc->mkac", A, Vinv)          # (M, K, 6, 3)
    S_off = jnp.einsum("mkac,mldc->kald", B, A)        # (K,6,K,6)
    g_off = jnp.einsum("mkac,mc->ka", B, g_l)          # (K,6)
    Ud = U + lam * jnp.eye(6, dtype=U.dtype)[None]
    S = jnp.zeros((K, 6, K, 6), U.dtype)
    ii = jnp.arange(K)
    S = S.at[ii, :, ii, :].set(Ud)
    S = S - S_off
    rhs = g_p - g_off
    return S.reshape(K * 6, K * 6), rhs.reshape(K * 6), Vinv, B


def _apply_gauge(S, rhs, free_mask6):
    """Zero rows/cols of fixed/invalid pose parameters, unit diagonal."""
    m = free_mask6.astype(S.dtype)
    S = S * m[:, None] * m[None, :]
    S = S + jnp.diag(1.0 - m)
    rhs = rhs * m
    return S, rhs


def _obs_jacobians(p: BAProblem, R, t, xyz, huber_delta: float):
    """Per-observation residuals + analytic Jacobians WITHOUT aggregating the
    dense (M, K, 6, 3) off-diagonal block tensor — the memory wall of the
    dense Schur path at full-map scale (K=64, M=32k → 151 MB for A alone).

    Returns (r (O,2), w (O,), kf, lm, Jp (O,2,6), Jl (O,2,3))."""
    K = R.shape[0]
    M = xyz.shape[0]
    r, w, good, xc, Rk, xc0, is_r, (fx, fy) = _residuals_and_weights(
        p, R, t, xyz, huber_delta)
    kf = jnp.clip(p.obs_kf, 0, K - 1)
    lm = jnp.clip(p.obs_lm, 0, M - 1)
    z = jnp.where(jnp.abs(xc[:, 2]) < 1e-3, 1e-3, xc[:, 2])
    inv_z = 1.0 / z
    x_, y_ = xc[:, 0], xc[:, 1]
    zeros = jnp.zeros_like(z)
    J_proj = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * x_ * inv_z * inv_z], -1),
            jnp.stack([zeros, fy * inv_z, -fy * y_ * inv_z * inv_z], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), xc.shape[:1] + (3, 3))
    C_chain = jnp.where(is_r[:, None, None], jnp.broadcast_to(p.R_rl, eye.shape), eye)
    J_pose = C_chain @ jnp.concatenate([eye, -so3_hat(xc0)], axis=-1)
    Jp = J_proj @ J_pose
    Jl = J_proj @ (C_chain @ Rk)
    return r, w, kf, lm, Jp, Jl


def _inv6x6_chol(U):
    """Batched (K,6,6) SPD inverse (Jacobi preconditioner) via the fused
    blocked-Schur `geometry/polar.py:inv_spd` — the batched Cholesky +
    per-block cho_solve custom calls it replaces were latency-bound."""
    from zenslam_tpu.geometry.polar import inv_spd
    return inv_spd(U + 1e-8 * jnp.eye(6, dtype=U.dtype)[None])


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "cg_iters", "refine_landmarks"),
)
def bundle_adjust_cg(
    p: BAProblem,
    iterations: int = 10,
    cg_iters: int = 40,
    huber_delta: float = 1.0,
    refine_landmarks: bool = True,
    init_lambda: float = 1e-3,
):
    """MATRIX-FREE LM-Schur BA for large windows / full-map refinement
    (BASELINE config[2]; SURVEY.md §7 risk "sparse Schur at scale").

    The dense path (`bundle_adjust`) materializes the (M, K, 6, 3) W-block
    tensor and a (6K, 6K) reduced system — fine for the 8-KF sliding window,
    a memory/compute wall at K=64, M=32k, O=128k. Here the reduced camera
    system S = U+λ − Wᵀ(V+λ)⁻¹W is applied as an OPERATOR: each S·v is two
    observation-wise passes (scatter-adds over O) plus a batched 3x3 solve —
    no W storage at all — and solved by Jacobi-(block-U⁻¹)-preconditioned
    conjugate gradients. Landmark back-substitution is the same obs-pass.

    Same contract as bundle_adjust (returns R/t/xyz/rmse/cost/n_accepted).
    """
    K = p.R.shape[0]
    M = p.xyz.shape[0]
    cost0, rmse0 = ba_cost(p, huber_delta=huber_delta)
    free_kf = p.kf_valid & (~p.kf_fixed)
    fmask = free_kf[:, None].astype(p.R.dtype)

    def step(carry, _):
        R, t, xyz, lam, cost = carry
        r, w, kf, lm, Jp, Jl = _obs_jacobians(p, R, t, xyz, huber_delta)
        Jp_w = Jp * w[:, None, None]
        Jl_w = Jl * w[:, None, None]
        U = jnp.zeros((K, 6, 6), R.dtype).at[kf].add(
            jnp.einsum("oai,oaj->oij", Jp_w, Jp))
        g_p = jnp.zeros((K, 6), R.dtype).at[kf].add(
            -jnp.einsum("oai,oa->oi", Jp_w, r))
        V = jnp.zeros((M, 3, 3), R.dtype).at[lm].add(
            jnp.einsum("oai,oaj->oij", Jl_w, Jl))
        g_l = jnp.zeros((M, 3), R.dtype).at[lm].add(
            -jnp.einsum("oai,oa->oi", Jl_w, r))
        lm_active = p.lm_valid if refine_landmarks else jnp.zeros_like(p.lm_valid)
        Vd = V + lam * jnp.eye(3, dtype=V.dtype)[None]
        Vd = jnp.where(lm_active[:, None, None], Vd, jnp.eye(3, dtype=V.dtype)[None])
        Vinv = _inv3x3(Vd)
        Ud = U + lam * jnp.eye(6, dtype=U.dtype)[None]

        def lm_pass(v_pose):
            """(K,6) -> (M,3): u = V⁻¹ Σ_obs Jlᵀ w Jp v  (one obs pass)."""
            Jpv = jnp.einsum("oab,ob->oa", Jp, v_pose[kf])
            s = jnp.zeros((M, 3), R.dtype).at[lm].add(
                jnp.einsum("oab,oa->ob", Jl_w, Jpv))
            return jnp.einsum("mbc,mc->mb", Vinv, s) * lm_active[:, None]

        def off_to_pose(u_lm):
            """(M,3) -> (K,6): Σ_obs Jpᵀ w Jl u  (one obs pass)."""
            Jlu = jnp.einsum("oab,ob->oa", Jl, u_lm[lm])
            return jnp.zeros((K, 6), R.dtype).at[kf].add(
                jnp.einsum("oab,oa->ob", Jp_w, Jlu))

        def S_matvec(v):
            v = v * fmask
            y = jnp.einsum("kab,kb->ka", Ud, v) - off_to_pose(lm_pass(v))
            # identity on fixed/invalid rows keeps CG well-posed
            return jnp.where(fmask > 0, y, v)

        # rhs = g_p − Wᵀ V⁻¹ g_l (observation-wise)
        b_lm = jnp.einsum("mbc,mc->mb", Vinv, g_l) * lm_active[:, None]
        rhs = (g_p - off_to_pose(b_lm)) * fmask

        # Jacobi (block-diag U⁻¹) preconditioned CG
        Minv = _inv6x6_chol(Ud)
        precon = lambda x: jnp.einsum("kab,kb->ka", Minv, x) * fmask

        def cg_body(_, st):
            x, rr, z, pdir, rz = st
            Ap = S_matvec(pdir)
            denom = jnp.sum(pdir * Ap)
            alpha = rz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
            x = x + alpha * pdir
            rr = rr - alpha * Ap
            z = precon(rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            pdir = z + beta * pdir
            return x, rr, z, pdir, rz_new

        x0 = jnp.zeros((K, 6), R.dtype)
        z0 = precon(rhs)
        st = (x0, rhs, z0, z0, jnp.sum(rhs * z0))
        x, *_ = jax.lax.fori_loop(0, cg_iters, cg_body, st)
        d_pose = jnp.where(jnp.isfinite(x), x, 0.0) * fmask

        # landmark back-substitution: dX = V⁻¹ (g_l − Σ Jlᵀ w Jp d_pose)
        if refine_landmarks:
            Jpd = jnp.einsum("oab,ob->oa", Jp, d_pose[kf])
            s = jnp.zeros((M, 3), R.dtype).at[lm].add(
                jnp.einsum("oab,oa->ob", Jl_w, Jpd))
            d_lm = jnp.einsum("mbc,mc->mb", Vinv, g_l - s) * lm_active[:, None]
        else:
            d_lm = jnp.zeros_like(xyz)

        dR = so3_exp(d_pose[:, 3:])
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + d_pose[:, :3]
        xyz_new = xyz + d_lm
        new_cost, _ = ba_cost(p, R_new, t_new, xyz_new, huber_delta)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xyz = jnp.where(accept, xyz_new, xyz)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9),
                        jnp.minimum(lam * 4.0, 1e3))
        return (R, t, xyz, lam, cost), accept

    (R, t, xyz, lam, cost), accepts = jax.lax.scan(
        step, (p.R, p.t, p.xyz, jnp.float32(init_lambda), cost0),
        None, length=iterations)
    _, rmse1 = ba_cost(p, R, t, xyz, huber_delta=huber_delta)
    return {
        "R": R, "t": t, "xyz": xyz,
        "rmse_before": rmse0, "rmse_after": rmse1,
        "cost_before": cost0, "cost_after": cost,
        "n_accepted": jnp.sum(accepts.astype(jnp.int32)),
    }


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "refine_landmarks", "trim_threshold"),
)
def bundle_adjust(
    p: BAProblem,
    iterations: int = 15,
    huber_delta: float = 1.0,
    refine_landmarks: bool = True,
    init_lambda: float = 1e-3,
    trim_threshold: float | None = None,
):
    """LM-damped Gauss-Newton with Schur elimination.

    Returns dict with optimized R, t, xyz, rmse_before/after, accepted count.
    Motion-only mode (refine_landmarks=False) freezes landmarks entirely ≡ the
    reference's constant-landmark mode (its rotation-freeze SubsetManifold
    variant is subsumed by kf_fixed granularity).

    ``trim_threshold``: optional two-phase robust pass — after the first half
    of the iterations, observations with residual above the threshold (px)
    are masked out and the second half re-converges on the survivors. Huber
    alone plateaus at a contaminated optimum under gross outliers; trimming
    is the standard fix (the pipeline's RANSAC-gated observations rarely need
    it, loop-closure-merged maps do).
    """
    if trim_threshold is not None:
        first = bundle_adjust(p, iterations=iterations // 2,
                              huber_delta=huber_delta,
                              refine_landmarks=refine_landmarks,
                              init_lambda=init_lambda, trim_threshold=None)
        r, _, good, *_ = _residuals_and_weights(
            p, first["R"], first["t"], first["xyz"], huber_delta)
        keep = good & (jnp.linalg.norm(r, axis=-1) < trim_threshold)
        p = p._replace(obs_valid=keep, R=first["R"], t=first["t"], xyz=first["xyz"])
        second = bundle_adjust(p, iterations=iterations - iterations // 2,
                               huber_delta=huber_delta,
                               refine_landmarks=refine_landmarks,
                               init_lambda=init_lambda, trim_threshold=None)
        return dict(second, rmse_before=first["rmse_before"],
                    n_trimmed=jnp.sum(good) - jnp.sum(keep))

    K = p.R.shape[0]
    cost0, rmse0 = ba_cost(p, huber_delta=huber_delta)

    free_kf = p.kf_valid & (~p.kf_fixed)
    free_mask6 = jnp.repeat(free_kf, 6)

    def step(carry, _):
        R, t, xyz, lam, cost = carry
        U, g_p, V, g_l, A = _build_blocks(p, R, t, xyz, huber_delta)
        lm_active = p.lm_valid if refine_landmarks else jnp.zeros_like(p.lm_valid)
        if refine_landmarks:
            S, rhs, Vinv, B = _schur_reduce(U, g_p, V, g_l, A, lm_active, lam)
        else:
            Ud = U + lam * jnp.eye(6, dtype=U.dtype)[None]
            ii = jnp.arange(K)
            S = jnp.zeros((K, 6, K, 6), U.dtype).at[ii, :, ii, :].set(Ud).reshape(K * 6, K * 6)
            rhs = g_p.reshape(K * 6)
            Vinv = _inv3x3(jnp.where(p.lm_valid[:, None, None], V, 0.0) + jnp.eye(3, dtype=V.dtype)[None])
            B = jnp.zeros_like(A)
        S, rhs = _apply_gauge(S, rhs, free_mask6)
        # dense solve (reduced camera system): Cholesky with jitter fallback
        L = jnp.linalg.cholesky(S + 1e-8 * jnp.eye(S.shape[0], dtype=S.dtype))
        dx = jax.scipy.linalg.cho_solve((L, True), rhs)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        d_pose = dx.reshape(K, 6) * free_kf[:, None]
        # landmark back-substitution: dX = Vinv (g_l - sum_k A^T d_pose)
        if refine_landmarks:
            At_dp = jnp.einsum("mkab,ka->mb", A, d_pose)
            d_lm = jnp.einsum("mbc,mc->mb", Vinv, g_l - At_dp)
            d_lm = d_lm * p.lm_valid[:, None]
        else:
            d_lm = jnp.zeros_like(xyz)
        # apply: left-multiplicative pose update
        dR = so3_exp(d_pose[:, 3:])
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + d_pose[:, :3]
        xyz_new = xyz + d_lm
        new_cost, _ = ba_cost(p, R_new, t_new, xyz_new, huber_delta)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xyz = jnp.where(accept, xyz_new, xyz)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e3))
        return (R, t, xyz, lam, cost), accept

    (R, t, xyz, lam, cost), accepts = jax.lax.scan(
        step, (p.R, p.t, p.xyz, jnp.float32(init_lambda), cost0), None, length=iterations
    )
    _, rmse1 = ba_cost(p, R, t, xyz, huber_delta=huber_delta)
    return {
        "R": R, "t": t, "xyz": xyz,
        "rmse_before": rmse0, "rmse_after": rmse1,
        "cost_before": cost0, "cost_after": cost,
        "n_accepted": jnp.sum(accepts.astype(jnp.int32)),
    }
