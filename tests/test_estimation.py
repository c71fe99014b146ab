"""Estimation-layer tests: PnP, rigid, F/E, cascade, fusion
(SURVEY.md §7 phase 4 test gate; mirrors the reference's synthetic
generate→perturb→estimate→assert pattern)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.geometry import so3_exp, se3_apply, rotation_angle, PinholeCamera, project
from zenslam_tpu.estimation import (
    pnp_dlt,
    solve_pnp_ransac,
    umeyama,
    solve_rigid_ransac,
    solve_fundamental_ransac,
    solve_essential_ransac,
    recover_pose_from_essential,
    estimate_pose_cascade,
    fuse_poses,
    PoseCandidate,
)
from zenslam_tpu.estimation.epipolar import essential_8pt
from tests.test_geometry import make_test_rig


def scene(rng, n=128, noise=0.0, outlier_frac=0.0):
    """World points + GT pose + pixel observations with optional corruption."""
    cam = make_test_rig().left
    K = cam.K
    X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(3, 12, n)], -1).astype(np.float32)
    w = rng.normal(0, 0.2, 3).astype(np.float32)
    R = so3_exp(jnp.asarray(w))
    t = jnp.asarray(rng.normal(0, 0.3, 3).astype(np.float32))
    uv = np.asarray(project(cam, se3_apply(R, t, jnp.asarray(X))))
    if noise:
        uv = uv + rng.normal(0, noise, uv.shape).astype(np.float32)
    n_out = int(outlier_frac * n)
    if n_out:
        sel = rng.choice(n, n_out, replace=False)
        uv[sel] = rng.uniform(0, 600, (n_out, 2)).astype(np.float32)
    return cam, K, jnp.asarray(X), R, t, jnp.asarray(uv)


class TestPnP:
    def test_dlt_exact(self, rng):
        cam, K, X, R, t, uv = scene(rng, n=32)
        xn = jnp.stack([(uv[:, 0] - cam.cx) / cam.fx, (uv[:, 1] - cam.cy) / cam.fy], -1)
        Rh, th = pnp_dlt(X[:12], xn[:12])
        assert float(rotation_angle(Rh @ R.T)) < 1e-3
        np.testing.assert_allclose(np.asarray(th), np.asarray(t), atol=5e-3)

    def test_ransac_with_outliers(self, rng):
        cam, K, X, R, t, uv = scene(rng, n=128, noise=0.5, outlier_frac=0.3)
        res = solve_pnp_ransac(jax.random.PRNGKey(0), K, X, uv, jnp.ones(128, bool),
                               threshold=3.0, iters=256)
        assert bool(res["ok"])
        assert int(res["n_inliers"]) > 70
        assert float(rotation_angle(res["R"] @ R.T)) < 0.01
        np.testing.assert_allclose(np.asarray(res["t"]), np.asarray(t), atol=0.03)

    def test_ransac_respects_mask(self, rng):
        cam, K, X, R, t, uv = scene(rng, n=64)
        # corrupt ALL masked-out entries: they must not affect the solution
        uv_bad = uv.at[32:].set(5000.0)
        valid = jnp.arange(64) < 32
        res = solve_pnp_ransac(jax.random.PRNGKey(1), K, X, uv_bad, valid, iters=128)
        assert bool(res["ok"])
        assert float(rotation_angle(res["R"] @ R.T)) < 0.01
        assert not bool(res["inliers"][32:].any())

    def test_few_points_not_ok(self, rng):
        cam, K, X, R, t, uv = scene(rng, n=16)
        valid = jnp.arange(16) < 3  # below the 4-inlier floor
        res = solve_pnp_ransac(jax.random.PRNGKey(2), K, X, uv, valid, iters=64)
        assert not bool(res["ok"])


class TestRigid:
    def test_umeyama_exact(self, rng):
        src = jnp.asarray(rng.normal(0, 2, (32, 3)).astype(np.float32))
        R = so3_exp(jnp.asarray(rng.normal(0, 0.5, 3).astype(np.float32)))
        t = jnp.asarray(rng.normal(0, 1, 3).astype(np.float32))
        dst = src @ R.T + t
        Rh, th, s = umeyama(src, dst)
        # f32 arccos near identity quantizes at ~1e-3 rad
        assert float(rotation_angle(Rh @ R.T)) < 2e-3
        np.testing.assert_allclose(np.asarray(th), np.asarray(t), atol=1e-4)
        assert abs(float(s) - 1.0) < 1e-5

    def test_ransac_with_outliers(self, rng):
        src = rng.normal(0, 2, (100, 3)).astype(np.float32)
        R = so3_exp(jnp.asarray(rng.normal(0, 0.5, 3).astype(np.float32)))
        t = jnp.asarray(rng.normal(0, 1, 3).astype(np.float32))
        dst = np.array(jnp.asarray(src) @ R.T + t)
        dst[:30] += rng.normal(0, 2.0, (30, 3)).astype(np.float32)  # outliers
        dst[30:] += rng.normal(0, 0.005, (70, 3)).astype(np.float32)  # mild noise
        res = solve_rigid_ransac(jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(dst),
                                 jnp.ones(100, bool), threshold=0.05, iters=256)
        assert bool(res["ok"]) and int(res["n_inliers"]) >= 60
        assert float(rotation_angle(res["R"] @ R.T)) < 0.01
        np.testing.assert_allclose(np.asarray(res["t"]), np.asarray(t), atol=0.02)


class TestEpipolar:
    def _two_view(self, rng, n=128, noise=0.0, outlier_frac=0.0):
        cam = make_test_rig().left
        K = cam.K
        X = np.stack([rng.uniform(-3, 3, n), rng.uniform(-2, 2, n), rng.uniform(4, 12, n)], -1).astype(np.float32)
        Rab = so3_exp(jnp.asarray([0.03, -0.05, 0.02], dtype=jnp.float32))
        tab = jnp.asarray([0.3, 0.05, 0.1], dtype=jnp.float32)  # frame a -> frame b
        Xa = jnp.asarray(X)
        pa = np.asarray(project(cam, Xa))
        pb = np.asarray(project(cam, se3_apply(Rab, tab, Xa)))
        if noise:
            pa = pa + rng.normal(0, noise, pa.shape).astype(np.float32)
            pb = pb + rng.normal(0, noise, pb.shape).astype(np.float32)
        n_out = int(outlier_frac * n)
        if n_out:
            sel = rng.choice(n, n_out, replace=False)
            pb[sel] += rng.uniform(20, 80, (n_out, 2)).astype(np.float32)
        return K, Rab, tab, jnp.asarray(pa), jnp.asarray(pb), Xa

    def test_fundamental_ransac(self, rng):
        K, Rab, tab, pa, pb, _ = self._two_view(rng, noise=0.3, outlier_frac=0.25)
        res = solve_fundamental_ransac(jax.random.PRNGKey(0), pa, pb, jnp.ones(128, bool),
                                       threshold=2.0, iters=256)
        assert bool(res["ok"])
        assert int(res["n_inliers"]) > 80

    def test_essential_recover_pose(self, rng):
        K, Rab, tab, pa, pb, Xa = self._two_view(rng, noise=0.2)
        res = solve_essential_ransac(jax.random.PRNGKey(0), K, pa, pb, jnp.ones(128, bool),
                                     threshold=1.5, iters=256)
        assert bool(res["ok"])
        R, t, n_good = recover_pose_from_essential(res["E"], K, pa, pb, res["inliers"])
        assert float(rotation_angle(R @ Rab.T)) < 0.02
        # translation up to scale
        t_dir = np.asarray(t) / np.linalg.norm(np.asarray(t))
        t_gt = np.asarray(tab) / np.linalg.norm(np.asarray(tab))
        assert abs(float(np.dot(t_dir, t_gt))) > 0.99
        assert int(n_good) > 100

    def test_essential_8pt_epipolar_constraint(self, rng):
        K, Rab, tab, pa, pb, _ = self._two_view(rng)
        fx, cx, cy = K[0, 0], K[0, 2], K[1, 2]
        na = (pa - jnp.array([cx, cy])) / fx
        nb = (pb - jnp.array([cx, cy])) / fx
        E = essential_8pt(na, nb)
        ones = jnp.ones((128, 1))
        qa = jnp.concatenate([na, ones], -1)
        qb = jnp.concatenate([nb, ones], -1)
        resid = jnp.abs(jnp.sum(qb * (qa @ E.T), axis=-1))
        # f32 eigh of the squared system: algebraic residual ~1e-4..1e-3 is
        # expected; what matters downstream (pose recovery) is tested above
        assert float(jnp.median(resid)) < 1e-3
        assert float(jnp.max(resid)) < 5e-3


class TestCascade:
    def test_prefers_pnp_cam0(self, rng):
        rig = make_test_rig()
        cam, K, X, R, t, uv = scene(rng, n=128, noise=0.3)
        dummyX = jnp.zeros((16, 3))
        dummyU = jnp.zeros((16, 2))
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            X, uv, jnp.ones(128, bool),
            dummyX, dummyU, jnp.zeros(16, bool),
            dummyX, dummyX, jnp.zeros(16, bool),
            jnp.eye(3), jnp.zeros(3),
        )
        assert bool(est.ok) and int(est.method) == 0
        assert float(rotation_angle(est.R @ R.T)) < 0.01
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(t), atol=0.03)

    def test_falls_back_to_rigid(self, rng):
        rig = make_test_rig()
        # no 2D correspondences at all; only 3D-3D
        src = rng.normal(0, 2, (64, 3)).astype(np.float32) + np.array([0, 0, 6], np.float32)
        R_corr = so3_exp(jnp.asarray([0.01, 0.02, -0.01], dtype=jnp.float32))
        t_corr = jnp.asarray([0.05, -0.02, 0.1], dtype=jnp.float32)
        dst = jnp.asarray(src) @ R_corr.T + t_corr
        dummyX = jnp.zeros((8, 3)); dummyU = jnp.zeros((8, 2))
        R_pred, t_pred = jnp.eye(3), jnp.zeros(3)
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyU, jnp.zeros(8, bool),
            jnp.asarray(src), dst, jnp.ones(64, bool),
            R_pred, t_pred,
        )
        assert bool(est.ok) and int(est.method) == 2

    def test_total_failure_gives_prediction(self, rng):
        rig = make_test_rig()
        dummyX = jnp.zeros((8, 3)); dummyU = jnp.zeros((8, 2))
        R_pred = so3_exp(jnp.asarray([0.1, 0.0, 0.0], dtype=jnp.float32))
        t_pred = jnp.asarray([1.0, 2.0, 3.0], dtype=jnp.float32)
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyX, jnp.zeros(8, bool),
            R_pred, t_pred,
        )
        assert not bool(est.ok) and int(est.method) == 4
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(t_pred))

    def test_essential_2d2d_rescues_starved_frame(self, rng):
        """PnP (both cams) and rigid starved; the 2D-2D essential fallback
        with median-norm scale recovery must produce the metric pose
        (cascade method 3 ≡ `point_estimator.cpp:233-296`)."""
        rig = make_test_rig()
        cam = rig.left
        n = 128
        X_prev_cam = np.stack([
            rng.uniform(-3, 3, n), rng.uniform(-2, 2, n),
            rng.uniform(4, 12, n)], -1).astype(np.float32)
        # relative motion prev -> cur with REAL translation magnitude
        R_cp = so3_exp(jnp.asarray([0.02, -0.04, 0.01], dtype=jnp.float32))
        t_cp = jnp.asarray([0.25, 0.05, -0.1], dtype=jnp.float32)
        Xp = jnp.asarray(X_prev_cam)
        pa = project(cam, Xp)
        pb = project(cam, se3_apply(R_cp, t_cp, Xp))
        pa = pa + jnp.asarray(rng.normal(0, 0.2, (n, 2)).astype(np.float32))
        pb = pb + jnp.asarray(rng.normal(0, 0.2, (n, 2)).astype(np.float32))
        # previous world->cam pose (non-trivial)
        R_prev = so3_exp(jnp.asarray([0.1, 0.2, -0.05], dtype=jnp.float32))
        t_prev = jnp.asarray([0.3, -0.1, 0.4], dtype=jnp.float32)
        # only half the tracks carry a prior landmark (scale samples)
        has3d = jnp.arange(n) % 2 == 0
        dummyX = jnp.zeros((8, 3)); dummyU = jnp.zeros((8, 2))
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyX, jnp.zeros(8, bool),
            R_prev, t_prev,
            p2a=pa, p2b=pb, valid2=jnp.ones(n, bool),
            X2_prev_cam=Xp, has3d2=has3d,
            R_prev=R_prev, t_prev=t_prev,
        )
        assert bool(est.ok) and int(est.method) == 3
        # expected T_cur_w = T_cur_prev ∘ T_prev_w
        from zenslam_tpu.geometry.lie import se3_compose
        R_gt, t_gt = se3_compose(R_cp, t_cp, R_prev, t_prev)
        assert float(rotation_angle(est.R @ R_gt.T)) < 0.01
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(t_gt),
                                   atol=0.05)


class TestFusedCascade:
    def test_fused_cascade_accurate_on_pnp(self, rng):
        """fuse=True (≡ wiring `pose_fusion.cpp:154-288` into the live
        cascade) must not degrade the clean single-method case."""
        rig = make_test_rig()
        cam, K, X, R, t, uv = scene(rng, n=128, noise=0.3)
        dummyX = jnp.zeros((16, 3))
        dummyU = jnp.zeros((16, 2))
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            X, uv, jnp.ones(128, bool),
            dummyX, dummyU, jnp.zeros(16, bool),
            dummyX, dummyX, jnp.zeros(16, bool),
            jnp.eye(3), jnp.zeros(3),
            fuse=True,
        )
        assert bool(est.ok) and int(est.method) == 0
        assert float(rotation_angle(est.R @ R.T)) < 0.01
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(t), atol=0.03)

    def test_fused_cascade_blends_two_methods(self, rng):
        """When PnP and rigid BOTH succeed, the fused translation must sit
        within the candidate spread and stay near ground truth."""
        rig = make_test_rig()
        cam, K, X, R, t, uv = scene(rng, n=128, noise=0.3)
        # 3D-3D: world points under GT correction (identity correction since
        # src was produced with the predicted pose == GT here)
        src = np.asarray(X) + np.random.default_rng(5).normal(0, 0.003, X.shape).astype(np.float32)
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            X, uv, jnp.ones(128, bool),
            jnp.zeros((16, 3)), jnp.zeros((16, 2)), jnp.zeros(16, bool),
            jnp.asarray(src), X, jnp.ones(128, bool),
            R, t,  # prediction == GT, so the rigid branch corrects ~identity
            fuse=True,
        )
        assert bool(est.ok)
        np.testing.assert_allclose(np.asarray(est.t), np.asarray(t), atol=0.05)
        assert float(rotation_angle(est.R @ R.T)) < 0.02


class TestFusion:
    def test_weighted_fusion_tracks_best(self):
        R_good = so3_exp(jnp.asarray([0.0, 0.0, 0.1], dtype=jnp.float32))
        t_good = jnp.asarray([1.0, 0.0, 0.0], dtype=jnp.float32)
        R_bad = so3_exp(jnp.asarray([0.5, 0.5, 0.0], dtype=jnp.float32))
        t_bad = jnp.asarray([5.0, 5.0, 5.0], dtype=jnp.float32)
        cands = PoseCandidate(
            R=jnp.stack([R_good, R_bad]),
            t=jnp.stack([t_good, t_bad]),
            inlier_ratio=jnp.asarray([0.9, 0.1]),
            mean_err=jnp.asarray([0.5, 10.0]),
            n_inliers=jnp.asarray([80, 5]),
            is_line=jnp.asarray([False, False]),
            valid=jnp.asarray([True, True]),
        )
        R, t, conf, cov, best = fuse_poses(cands)
        assert int(best) == 0
        assert float(rotation_angle(R @ R_good.T)) < 1e-5
        assert np.linalg.norm(np.asarray(t) - np.asarray(t_good)) < 0.5
        assert float(conf) > 0.3
        # covariance shrinks with confidence
        assert np.asarray(cov).shape == (6,)

    def test_invalid_candidates_ignored(self):
        R = jnp.stack([jnp.eye(3)] * 2)
        t = jnp.stack([jnp.zeros(3), jnp.full(3, 9.0)])
        cands = PoseCandidate(
            R=R, t=t,
            inlier_ratio=jnp.asarray([0.5, 0.99]),
            mean_err=jnp.asarray([1.0, 0.01]),
            n_inliers=jnp.asarray([50, 100]),
            is_line=jnp.asarray([False, False]),
            valid=jnp.asarray([True, False]),
        )
        _, t_f, conf, _, _ = fuse_poses(cands)
        np.testing.assert_allclose(np.asarray(t_f), 0.0, atol=1e-5)

    def test_nan_invalid_candidate_does_not_poison(self):
        """A FAILED solver can emit NaN R/t/err; weight 0 alone is not
        enough (0·NaN = NaN). The fused pose must stay finite and track the
        valid candidate (ADVICE r2: cascade.py:162)."""
        cands = PoseCandidate(
            R=jnp.stack([jnp.eye(3), jnp.full((3, 3), jnp.nan)]),
            t=jnp.stack([jnp.ones(3), jnp.full(3, jnp.nan)]),
            inlier_ratio=jnp.asarray([0.9, 0.0]),
            mean_err=jnp.asarray([0.5, jnp.nan]),
            n_inliers=jnp.asarray([80, 0]),
            is_line=jnp.asarray([False, False]),
            valid=jnp.asarray([True, False]),
        )
        R, t, conf, _, best = fuse_poses(cands)
        assert np.all(np.isfinite(np.asarray(t)))
        assert np.all(np.isfinite(np.asarray(R)))
        np.testing.assert_allclose(np.asarray(t), 1.0, atol=1e-5)
        assert int(best) == 0

    def test_mixed_unit_err_scales(self):
        """Per-candidate err_scale vector: a meters-unit candidate with
        mean_err 0.05 m under scale 0.1 must not be over-weighted against a
        pixel-unit candidate at 1.0 px under scale 3.0 (ADVICE r2:
        cascade.py:168)."""
        t_px = jnp.asarray([1.0, 0.0, 0.0])
        t_m = jnp.asarray([1.3, 0.0, 0.0])
        cands = PoseCandidate(
            R=jnp.stack([jnp.eye(3)] * 2),
            t=jnp.stack([t_px, t_m]),
            inlier_ratio=jnp.asarray([0.8, 0.8]),
            mean_err=jnp.asarray([1.0, 0.05]),   # px vs m — same quality-ish
            n_inliers=jnp.asarray([60, 60]),
            is_line=jnp.asarray([False, False]),
            valid=jnp.asarray([True, True]),
        )
        # scalar scale 2.0: the 0.05 'err' looks near-perfect -> pulled to t_m
        _, t_scalar, _, _, _ = fuse_poses(cands)
        # per-method scales: comparable weights -> blend sits between
        _, t_vec, _, _, _ = fuse_poses(
            cands, err_scale=jnp.asarray([3.0, 0.1], jnp.float32))
        d_scalar = abs(float(t_scalar[0]) - 1.3)
        d_vec = abs(float(t_vec[0]) - 1.3)
        assert d_vec > d_scalar  # vector scales stop the 3D-3D over-weighting


class TestEigensolvers:
    """Direct coverage of the custom smallest-eigenvector solvers (they
    replace jnp.linalg.eigh custom calls on the hot path)."""

    def test_smallest_eigvec_12_matches_eigh(self):
        """On DLT-like spectra (near-null smallest eigenvector — the
        documented contract: exact-data smallest eig is 0) the inverse
        iteration must agree with eigh up to sign."""
        from zenslam_tpu.estimation.pnp import _smallest_eigvec_12
        rng = np.random.default_rng(3)
        for _ in range(20):
            Q, _ = np.linalg.qr(rng.normal(size=(12, 12)))
            lam = np.sort(rng.uniform(0.3, 3.0, 12))
            lam[0] = rng.uniform(0.0, 0.01)  # near-null DLT direction
            ATA = jnp.asarray((Q * lam) @ Q.T, jnp.float32)
            v = np.asarray(_smallest_eigvec_12(ATA))
            w, V = np.linalg.eigh(np.asarray(ATA))
            ref = V[:, 0]
            err = min(np.linalg.norm(v - ref), np.linalg.norm(v + ref))
            assert err < 5e-2, (err, w[:2])
            # Rayleigh quotient near the smallest eigenvalue
            rq = float(v @ np.asarray(ATA) @ v)
            assert rq <= w[0] + 1e-2 * (w[-1] - w[0]) + 1e-6

    def test_smallest_eigvec_12_random_gram_rayleigh(self):
        """On arbitrary full-rank Gram matrices (no spectral gap guarantee)
        the solver must still return a finite unit vector with a small
        Rayleigh quotient — the graceful-degradation contract."""
        from zenslam_tpu.estimation.pnp import _smallest_eigvec_12
        rng = np.random.default_rng(4)
        for _ in range(10):
            B = rng.normal(size=(14, 12)).astype(np.float32)
            ATA = jnp.asarray(B.T @ B)
            v = np.asarray(_smallest_eigvec_12(ATA))
            assert np.all(np.isfinite(v))
            assert abs(np.linalg.norm(v) - 1.0) < 1e-3
            w = np.linalg.eigvalsh(np.asarray(ATA))
            rq = float(v @ np.asarray(ATA) @ v)
            assert rq <= w[0] + 0.2 * (w[-1] - w[0])

    def test_smallest_eigvec_12_coplanar_samples(self):
        """Rank-deficient ATA from coplanar 3D points must stay finite and
        keep a near-zero Rayleigh quotient."""
        from zenslam_tpu.estimation.pnp import _smallest_eigvec_12
        rng = np.random.default_rng(5)
        X = np.concatenate([rng.normal(size=(6, 2)), np.zeros((6, 1))], -1)
        xn = rng.normal(scale=0.2, size=(6, 2))
        rows = []
        for (x, y, z), (u, v) in zip(X, xn):
            rows.append([x, y, z, 1, 0, 0, 0, 0, -u * x, -u * y, -u * z, -u])
            rows.append([0, 0, 0, 0, x, y, z, 1, -v * x, -v * y, -v * z, -v])
        A = np.asarray(rows, np.float32)
        ATA = jnp.asarray(A.T @ A)
        vec = np.asarray(_smallest_eigvec_12(ATA))
        assert np.all(np.isfinite(vec))
        w = np.linalg.eigvalsh(np.asarray(ATA))
        rq = float(vec @ np.asarray(ATA) @ vec)
        assert rq <= w[0] + 1e-3 * max(w[-1], 1.0)

    def test_pnp_dlt_minimal_six_points(self):
        """Exact-data 6-point PnP via the custom eigensolver recovers pose."""
        from zenslam_tpu.estimation.pnp import pnp_dlt
        from zenslam_tpu.geometry.lie import so3_exp
        rng = np.random.default_rng(8)
        R = np.asarray(so3_exp(jnp.asarray([0.2, -0.1, 0.3], jnp.float32)))
        t = np.array([0.1, -0.2, 0.5], np.float32)
        X = rng.uniform(-1, 1, (6, 3)).astype(np.float32) + [0, 0, 4]
        xc = X @ R.T + t
        xn = xc[:, :2] / xc[:, 2:3]
        R_est, t_est = pnp_dlt(jnp.asarray(X), jnp.asarray(xn))
        # minimal 6-point DLT in f32 is conditioning-limited; the bound
        # guards the eigensolver path, not DLT precision
        assert np.linalg.norm(np.asarray(R_est) - R) < 2e-2
        assert np.linalg.norm(np.asarray(t_est) - t) < 5e-2

    def test_smallest_eigvec_4_matches_eigh(self):
        """DLT-like spectra (near-null smallest direction, the solver's
        contract) — batched agreement with eigh up to sign."""
        from zenslam_tpu.geometry.triangulate import _smallest_eigvec_4
        rng = np.random.default_rng(11)
        mats = []
        for _ in range(64):
            Q, _ = np.linalg.qr(rng.normal(size=(4, 4)))
            lam = np.sort(rng.uniform(0.3, 3.0, 4))
            lam[0] = rng.uniform(0.0, 0.01)
            mats.append((Q * lam) @ Q.T)
        ATA = jnp.asarray(np.stack(mats), jnp.float32)
        v = np.asarray(_smallest_eigvec_4(ATA))
        for i in range(64):
            w, V = np.linalg.eigh(np.asarray(ATA[i]))
            ref = V[:, 0]
            err = min(np.linalg.norm(v[i] - ref), np.linalg.norm(v[i] + ref))
            assert err < 5e-2, (i, err)


class TestInertialFusionWeight:
    """The preintegration covariance doing work (r3 verdict task 4): the
    inertial prediction joins pose fusion as a candidate weighted by its
    propagated position uncertainty — a well-calibrated IMU pulls the fused
    pose toward the prediction, inflated Allan densities neutralize it."""

    def _fused_t(self, rng, sigma_p):
        cam, K, X, R, t, uv = scene(rng, n=128, noise=0.5)
        rig = make_test_rig()
        dummyX = jnp.zeros((8, 3))
        dummyU = jnp.zeros((8, 2))
        t_pred = t + jnp.asarray([0.05, 0.0, 0.0])
        est = estimate_pose_cascade(
            jax.random.PRNGKey(0), rig,
            X, uv, jnp.ones(128, bool),
            dummyX, dummyU, jnp.zeros(8, bool),
            dummyX, dummyX, jnp.zeros(8, bool),
            R, t_pred, fuse=True,
            pred_sigma_p=jnp.asarray(sigma_p, jnp.float32))
        return np.asarray(est.t), np.asarray(t), np.asarray(t_pred)

    def test_tight_covariance_pulls_toward_prediction(self):
        rng = np.random.default_rng(5)
        t_good, t_gt, t_pred = self._fused_t(rng, 1e-4)
        rng = np.random.default_rng(5)
        t_bad, _, _ = self._fused_t(rng, 10.0)
        d_good = np.linalg.norm(t_good - t_pred)
        d_bad = np.linalg.norm(t_bad - t_pred)
        assert d_good < d_bad, (d_good, d_bad)

    def test_inflated_noise_neutralizes_inertial(self):
        rng = np.random.default_rng(6)
        t_bad, t_gt, _ = self._fused_t(rng, 10.0)
        np.testing.assert_allclose(t_bad, t_gt, atol=0.02)

    def test_noise_densities_inflate_covariance(self):
        """Configured Allan densities flow into the 9x9 covariance."""
        from zenslam_tpu.imu.preintegration import ImuNoise, preintegrate
        rng = np.random.default_rng(7)
        T = 20
        gyro = jnp.asarray(rng.normal(0, 0.1, (T, 3)), jnp.float32)
        accel = jnp.asarray(rng.normal(0, 1.0, (T, 3)) + [0, -9.81, 0],
                            jnp.float32)
        dts = jnp.full((T,), 0.005, jnp.float32)
        mask = jnp.ones((T,), bool)
        c_lo = preintegrate(gyro, accel, dts, mask, noise=ImuNoise()).cov
        c_hi = preintegrate(gyro, accel, dts, mask,
                            noise=ImuNoise(gyro_noise=1.6e-2,
                                           accel_noise=2.8e-1)).cov
        assert float(jnp.trace(c_hi)) > 1e3 * float(jnp.trace(c_lo))
