"""SO(3)/SE(3) Lie-group operations, pure JAX, vmappable, float32-first.

Parity targets in the reference (see SURVEY.md citations):
- Rodrigues exp/log      ≡ cv::Rodrigues usage (`zenslam_core/source/utils/utils.cpp:98-117`)
- pose compose/inverse   ≡ cv::Affine3d algebra used throughout `slam_thread.cpp`
- SLERP                  ≡ groundtruth interpolation (`io/groundtruth.cpp:7-51`)

All functions take/return plain jnp arrays so they compose with vmap/jit/scan.
Rotations are 3x3 matrices; poses are (R, t) tuples or 4x4 homogeneous matrices
(helpers for both). Tangent vectors are 6-vectors [rho, phi] (translation first).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def so3_hat(w):
    """3-vector -> skew-symmetric matrix. Batched over leading dims."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_vee(W):
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x, stable at 0."""
    return jnp.where(jnp.abs(x) < 1e-5, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < 1e-5, 1.0, x))


def so3_exp(w):
    """Rodrigues formula: axis-angle 3-vector -> rotation matrix.

    Taylor-stable near 0 so it is safe under autodiff (grad of where-guarded).
    """
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = so3_hat(w)
    W2 = W @ W
    a = _sinc(theta)
    # (1 - cos t)/t^2, stable near 0
    b = jnp.where(theta2 < 1e-10, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a[..., None, None] * W + b[..., None, None] * W2


def so3_log(R):
    """Rotation matrix -> axis-angle 3-vector (angle in [0, pi])."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    # generic branch: theta / (2 sin theta) * vee(R - R^T)
    sin_t = jnp.sin(theta)
    w_generic = so3_vee(R - jnp.swapaxes(R, -1, -2))
    small = theta < 1e-4
    scale_generic = jnp.where(small, 0.5 + theta * theta / 12.0, theta / (2.0 * jnp.where(small, 1.0, sin_t) + _EPS))
    # near pi: sin(theta) -> 0, use diagonal extraction
    near_pi = theta > jnp.pi - 1e-3
    # axis from largest diagonal element of (R + I)/2
    A = 0.5 * (R + jnp.swapaxes(R, -1, -2))
    diag = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_t[..., None]) / jnp.clip(1.0 - cos_t[..., None], _EPS, None), 0.0, None)
    axis = jnp.sqrt(axis_sq)
    # fix signs using off-diagonal sums: sign of axis_i from row of (R - R^T) if usable,
    # else choose sign so that off-diagonal products match
    k = jnp.argmax(axis, axis=-1)
    offdiag = jnp.stack(
        [A[..., 0, 1] + A[..., 1, 0], A[..., 0, 2] + A[..., 2, 0], A[..., 1, 2] + A[..., 2, 1]], axis=-1
    )  # (xy, xz, yz) * 2 components of outer product
    def _signed_axis(axis, offdiag, k):
        # use the largest component as positive; infer the others' signs from outer products
        ax, ay, az = axis[0], axis[1], axis[2]
        sxy = jnp.sign(offdiag[0]) ; sxz = jnp.sign(offdiag[1]) ; syz = jnp.sign(offdiag[2])
        sxy = jnp.where(sxy == 0, 1.0, sxy); sxz = jnp.where(sxz == 0, 1.0, sxz); syz = jnp.where(syz == 0, 1.0, syz)
        branches = [
            jnp.stack([ax, ay * sxy, az * sxz]),
            jnp.stack([ax * sxy, ay, az * syz]),
            jnp.stack([ax * sxz, ay * syz, az]),
        ]
        return jax.lax.switch(k, [lambda b=b: b for b in branches])
    signed = _signed_axis(axis, offdiag, k) if axis.ndim == 1 else jax.vmap(_signed_axis)(
        axis.reshape(-1, 3), offdiag.reshape(-1, 3), k.reshape(-1)
    ).reshape(axis.shape)
    w_pi = signed * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, scale_generic[..., None] * w_generic)


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): so3_exp(w + dw) ~ so3_exp(J_l dw) so3_exp(w)."""
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = so3_hat(w)
    W2 = W @ W
    b = jnp.where(theta2 < 1e-10, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / (theta2 + _EPS * _EPS))
    c = jnp.where(
        theta2 < 1e-10,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / (theta2 * theta + _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b[..., None, None] * W + c[..., None, None] * W2


def so3_left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    W = so3_hat(w)
    W2 = W @ W
    half_theta = 0.5 * theta
    cot = jnp.where(
        theta2 < 1e-10,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / (jnp.sin(half_theta) + _EPS)) / (theta2 + _EPS * _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - 0.5 * W + cot[..., None, None] * W2


def se3_identity(dtype=jnp.float32):
    return jnp.eye(3, dtype=dtype), jnp.zeros(3, dtype=dtype)


def se3_exp(xi):
    """6-vector [rho, phi] -> (R, t). t = J_l(phi) rho."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", so3_left_jacobian(phi), rho)
    return R, t


def se3_log(R, t):
    phi = so3_log(R)
    rho = jnp.einsum("...ij,...j->...i", so3_left_jacobian_inv(phi), t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) ∘ (Rb,tb): x -> Ra (Rb x + tb) + ta."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_apply(R, t, x):
    return jnp.einsum("...ij,...j->...i", R, x) + t


def so3_orthonormalize(R):
    """Project a near-rotation onto SO(3) (symmetric orthogonalization).

    Two Newton steps of R ← R·(3I − RᵀR)/2 — error O(e³) per step, exact
    enough for f32 drift. Load-bearing: `se3_inverse` uses the transpose,
    which is only the inverse for EXACT rotations; without periodic
    re-orthonormalization the motion-model compose chain R_rel = R·R_prevᵀ
    squares any orthogonality error every frame (det grows (1+e)² — observed
    blowing up a trajectory in ~10 frames once a f32 PnP solution carried
    e≈1e-2)."""
    eye = jnp.eye(3, dtype=R.dtype)
    for _ in range(2):
        R = R @ (1.5 * eye - 0.5 * (jnp.swapaxes(R, -1, -2) @ R))
    return R


def rotation_angle(R):
    """Rotation angle in radians of a rotation matrix."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))


def quat_to_rotmat(q):
    """Quaternion (w, x, y, z) -> rotation matrix. Normalizes input."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R):
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0. Shepperd's method, branch-free."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions (unnormalized), one per pivot
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    k = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, k[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.sign(q[..., :1] + _EPS)


def quat_slerp(q0, q1, alpha):
    """Spherical linear interpolation; alpha in [0,1]. Handles double cover."""
    dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(dot < 0, -q1, q1)
    dot = jnp.abs(dot)
    theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    lerp = (1 - alpha) * q0 + alpha * q1
    w0 = jnp.sin((1 - alpha) * theta) / jnp.where(sin_t < 1e-6, 1.0, sin_t)
    w1 = jnp.sin(alpha * theta) / jnp.where(sin_t < 1e-6, 1.0, sin_t)
    slerp = w0 * q0 + w1 * q1
    out = jnp.where(sin_t < 1e-6, lerp, slerp)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
