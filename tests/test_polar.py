"""geometry/polar.py must agree with the SVD route it replaces."""

import jax.numpy as jnp
import numpy as np

from zenslam_tpu.geometry.polar import (
    polar_so3,
    project_rank2,
    rotation_from_cov,
    smallest_eigvec_3,
)


def _rand_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


class TestPolarSO3:
    def test_recovers_scaled_rotation(self):
        rng = np.random.default_rng(0)
        Ms, Rs, ss = [], [], []
        for _ in range(64):
            R = _rand_rotation(rng)
            s = rng.uniform(0.2, 5.0)
            M = s * R + rng.normal(scale=0.01 * s, size=(3, 3))
            Ms.append(M); Rs.append(R); ss.append(s)
        Q, sc = polar_so3(jnp.asarray(np.stack(Ms), jnp.float32))
        Q, sc = np.asarray(Q), np.asarray(sc)
        for i in range(64):
            # orthogonal, proper, near the true rotation
            np.testing.assert_allclose(Q[i] @ Q[i].T, np.eye(3), atol=1e-5)
            assert np.linalg.det(Q[i]) > 0.9
            assert np.abs(Q[i] - Rs[i]).max() < 0.02
            assert abs(sc[i] - ss[i]) / ss[i] < 0.02

    def test_matches_svd_polar(self):
        rng = np.random.default_rng(1)
        M = rng.normal(size=(32, 3, 3))
        M += 3 * np.eye(3)  # keep det > 0 / well-conditioned
        Q, _ = polar_so3(jnp.asarray(M, jnp.float32))
        U, _, Vt = np.linalg.svd(M)
        Qref = U @ Vt
        np.testing.assert_allclose(np.asarray(Q), Qref, atol=2e-4)


class TestRotationFromCov:
    def test_matches_umeyama_svd_full_rank(self):
        rng = np.random.default_rng(2)
        for _ in range(16):
            R = _rand_rotation(rng)
            src = rng.normal(size=(12, 3))
            dst = src @ R.T + rng.normal(scale=0.01, size=(12, 3))
            cov = dst.T @ src / 12
            Rq = np.asarray(rotation_from_cov(jnp.asarray(cov, jnp.float32)))
            U, _, Vt = np.linalg.svd(cov)
            D = np.diag([1.0, 1.0, np.linalg.det(U @ Vt)])
            Rs = U @ D @ Vt
            assert np.abs(Rq - Rs).max() < 5e-3
            assert np.linalg.det(Rq) > 0.99

    def test_rank2_three_point_sample(self):
        """3-point minimal samples give rank-2 covariances; the quaternion
        route must still produce the correct proper rotation."""
        rng = np.random.default_rng(3)
        for _ in range(16):
            R = _rand_rotation(rng)
            src = rng.normal(size=(3, 3))
            dst = src @ R.T
            sc = src - src.mean(0)
            dc = dst - dst.mean(0)
            cov = dc.T @ sc / 3
            assert np.linalg.matrix_rank(cov) <= 2
            Rq = np.asarray(rotation_from_cov(jnp.asarray(cov, jnp.float32)))
            np.testing.assert_allclose(Rq @ sc.T, dc.T, atol=2e-3)
            assert np.linalg.det(Rq) > 0.99


def _near_rank2(rng, n, sigma3=0.01):
    """Matrices like the eight-point output: σ₃ « σ₂ (exact data → σ₃ = 0)."""
    U, _, Vt = np.linalg.svd(rng.normal(size=(n, 3, 3)))
    S = np.stack([rng.uniform(0.8, 1.2, n), rng.uniform(0.4, 0.8, n),
                  rng.uniform(0, sigma3, n)], axis=-1)
    return U @ (S[..., None] * Vt)


class TestRank2:
    def test_smallest_eigvec(self):
        rng = np.random.default_rng(4)
        F = _near_rank2(rng, 16)
        A = np.einsum("nji,njk->nik", F, F)  # FᵀF, λ₃ ≈ 0
        v = np.asarray(smallest_eigvec_3(jnp.asarray(A, jnp.float32)))
        w, V = np.linalg.eigh(A)
        for i in range(16):
            cosang = abs(v[i] @ V[i, :, 0])
            assert cosang > 0.999

    def test_project_rank2_matches_svd(self):
        rng = np.random.default_rng(5)
        F = _near_rank2(rng, 16)
        Fp = np.asarray(project_rank2(jnp.asarray(F, jnp.float32)))
        U, S, Vt = np.linalg.svd(F)
        S[:, 2] = 0.0
        Fref = U @ (S[..., None] * Vt)
        np.testing.assert_allclose(Fp, Fref, atol=1e-3)
        # exact rank drop
        s = np.linalg.svd(Fp, compute_uv=False)
        assert s[:, 2].max() < 2e-3 * s[:, 0].min()


class TestInvSpd:
    """inv_spd / solve_spd must agree with np.linalg.inv on SPD batches of
    every supported size, including the ill-conditioned trace-normalized +
    1e-5-shifted matrices the DLT eigvec solvers feed it."""

    def _spd(self, rng, batch, n, cond=1e4):
        Q, _ = np.linalg.qr(rng.normal(size=(batch, n, n)))
        # log-uniform spectrum spanning the requested condition number
        lam = np.exp(rng.uniform(0, np.log(cond), size=(batch, n)))
        lam /= lam.max(-1, keepdims=True)
        return np.einsum("bik,bk,bjk->bij", Q, lam, Q)

    def test_matches_numpy_all_sizes(self):
        from zenslam_tpu.geometry.polar import inv_spd
        rng = np.random.default_rng(7)
        for n in (3, 6, 9, 12):
            A = self._spd(rng, 32, n, cond=1e3)
            Ai = np.asarray(inv_spd(jnp.asarray(A, jnp.float32)))
            eye = np.broadcast_to(np.eye(n), A.shape)
            resid = np.abs(A @ Ai - eye).max()
            assert resid < 5e-3, (n, resid)

    def test_inverse_iteration_conditioning(self):
        # the pnp/epipolar usage: normalized ATA + 1e-5 shift, then power
        # iteration on the inverse must still find the smallest eigvec
        from zenslam_tpu.geometry.polar import inv_spd
        rng = np.random.default_rng(8)
        for n in (9, 12):
            A = self._spd(rng, 16, n, cond=1.0)
            # construct a near-null direction: λ_min ≈ 0, rest O(1)
            w, V = np.linalg.eigh(A)
            w[:, 0] = 1e-7
            A = np.einsum("bik,bk,bjk->bij", V, w, V)
            tr = np.trace(A, axis1=-2, axis2=-1)
            An = A / (tr[:, None, None] / n) + 1e-5 * np.eye(n)
            Ai = np.asarray(inv_spd(jnp.asarray(An, jnp.float32)))
            v = np.ones((16, n)) / np.sqrt(n)
            for _ in range(6):
                v = np.einsum("bij,bj->bi", Ai, v)
                v /= np.linalg.norm(v, axis=-1, keepdims=True)
            cos = np.abs(np.einsum("bi,bi->b", v, V[:, :, 0]))
            assert cos.min() > 0.99

    def test_solve_spd(self):
        from zenslam_tpu.geometry.polar import solve_spd
        rng = np.random.default_rng(9)
        A = self._spd(rng, 8, 6, cond=1e3)
        b = rng.normal(size=(8, 6))
        x = np.asarray(solve_spd(jnp.asarray(A, jnp.float32),
                                 jnp.asarray(b, jnp.float32)))
        ref = np.linalg.solve(A, b[..., None])[..., 0]
        np.testing.assert_allclose(x, ref, rtol=2e-2, atol=2e-2)
