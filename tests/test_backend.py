"""Back-end tests, mirroring the reference's Catch2 suite (SURVEY.md §4):
LBA synthetic 2-KF / 6-KF window / large landmark set / motion-only
(`zenslam_tests.cpp:306-690`), BoW vocabulary + database (`:724-795`),
plus pose-graph and covisibility tests the reference lacks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.geometry import so3_exp, se3_apply, se3_inverse, se3_compose, rotation_angle
from zenslam_tpu.backend import (
    BAProblem,
    make_ba_problem,
    bundle_adjust,
    ba_cost,
    optimize_pose_graph,
    PoseGraph,
    kf_db_init,
    kf_db_add,
    covisibility,
    build_vocabulary,
    descriptors_to_bow,
    bow_db_init,
    bow_db_add,
    bow_db_query,
)

FX, FY, CX, CY = 400.0, 400.0, 320.0, 240.0


def synth_ba_problem(rng, n_kf=2, n_lm=30, K_cap=8, M_cap=64, pose_noise=0.05,
                     lm_noise=0.05, pix_noise=0.0, n_fixed=1):
    """GT scene -> project -> perturb; returns (problem, gt poses, gt lms).
    ≡ the synthetic LBA fixtures (`zenslam_tests.cpp:306-499`)."""
    X_gt = np.stack([rng.uniform(-3, 3, n_lm), rng.uniform(-2, 2, n_lm),
                     rng.uniform(4, 10, n_lm)], -1).astype(np.float32)
    R_gt, t_gt = [], []
    obs_kf, obs_lm, obs_uv = [], [], []
    for k in range(n_kf):
        w = rng.normal(0, 0.05, 3).astype(np.float32)
        R = np.asarray(so3_exp(jnp.asarray(w)))
        t = np.array([0.3 * k, 0, 0], np.float32) + rng.normal(0, 0.02, 3).astype(np.float32)
        R_gt.append(R); t_gt.append(t)
        xc = X_gt @ R.T + t
        u = FX * xc[:, 0] / xc[:, 2] + CX
        v = FY * xc[:, 1] / xc[:, 2] + CY
        for m in range(n_lm):
            uv = np.array([u[m], v[m]], np.float32)
            if pix_noise:
                uv = uv + rng.normal(0, pix_noise, 2).astype(np.float32)
            obs_kf.append(k); obs_lm.append(m); obs_uv.append(uv)
    O_cap = max(len(obs_kf), 1)
    p = make_ba_problem(K_cap, M_cap, O_cap, FX, FY, CX, CY)
    # perturb non-fixed poses and all landmarks
    R_init = np.stack(R_gt); t_init = np.stack(t_gt)
    for k in range(n_fixed, n_kf):
        dw = rng.normal(0, pose_noise, 3).astype(np.float32)
        dt = rng.normal(0, pose_noise, 3).astype(np.float32)
        dR = np.asarray(so3_exp(jnp.asarray(dw)))
        R_init[k] = dR @ R_init[k]
        t_init[k] = dR @ t_init[k] + dt
    X_init = X_gt + rng.normal(0, lm_noise, X_gt.shape).astype(np.float32)
    p = p._replace(
        R=p.R.at[:n_kf].set(jnp.asarray(R_init)),
        t=p.t.at[:n_kf].set(jnp.asarray(t_init)),
        kf_valid=p.kf_valid.at[:n_kf].set(True),
        kf_fixed=p.kf_fixed.at[:n_fixed].set(True),
        xyz=p.xyz.at[:n_lm].set(jnp.asarray(X_init)),
        lm_valid=p.lm_valid.at[:n_lm].set(True),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(np.stack(obs_uv)),
        obs_valid=jnp.ones(O_cap, bool),
    )
    return p, np.stack(R_gt), np.stack(t_gt), X_gt


class TestBundleAdjustment:
    def test_two_keyframe_convergence(self, rng):
        """≡ LBA synthetic 2-KF test (`zenslam_tests.cpp:306-395`): pose error
        < 3 cm after optimization, RMSE drops."""
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=2, n_lm=30)
        res = bundle_adjust(p, iterations=15)
        assert float(res["rmse_after"]) < float(res["rmse_before"]) / 10
        # pose 1 recovered
        err_t = np.linalg.norm(np.asarray(res["t"][1]) - t_gt[1])
        err_r = float(rotation_angle(res["R"][1] @ jnp.asarray(R_gt[1]).T))
        assert err_t < 0.03 and err_r < 0.01

    def test_six_keyframe_window(self, rng):
        """≡ 6-KF window test (`zenslam_tests.cpp:397-499`)."""
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=6, n_lm=80, M_cap=128,
                                               pose_noise=0.03, pix_noise=0.3)
        res = bundle_adjust(p, iterations=20)
        assert float(res["rmse_after"]) < 1.0  # down to pixel-noise level
        for k in range(1, 6):
            assert np.linalg.norm(np.asarray(res["t"][k]) - t_gt[k]) < 0.05

    def test_large_landmark_set(self, rng):
        """≡ 500-landmark scaling test (`zenslam_tests.cpp:500-589`)."""
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=4, n_lm=500, M_cap=512,
                                               K_cap=8, pose_noise=0.04)
        res = bundle_adjust(p, iterations=15)
        assert float(res["rmse_after"]) < float(res["rmse_before"]) / 10
        lm_err = np.linalg.norm(np.asarray(res["xyz"][:500]) - X_gt, axis=-1)
        assert np.median(lm_err) < 0.02

    def test_dense_vs_cg_agree_on_window(self, rng):
        """Dense Schur and matrix-free CG land on the same optimum for a
        well-posed 8-KF window (dense co-observation, two fixed KFs pinning
        gauge + scale) — the agreement assert that the monocular BAL subsets
        can't support (internal gauge islands)."""
        from zenslam_tpu.backend.ba import bundle_adjust_cg

        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=8, n_lm=120, K_cap=8,
                                               M_cap=128, pose_noise=0.03,
                                               n_fixed=2)
        dense = bundle_adjust(p, iterations=15)
        cg = bundle_adjust_cg(p, iterations=15, cg_iters=80)
        assert float(dense["rmse_after"]) < 0.02
        assert float(cg["rmse_after"]) < 0.02
        for k in range(2, 8):
            assert np.linalg.norm(np.asarray(dense["t"][k])
                                  - np.asarray(cg["t"][k])) < 2e-3

    def test_motion_only_landmarks_untouched(self, rng):
        """≡ motion-only test (`zenslam_tests.cpp:591-690`): landmarks
        bit-exact unchanged while pose improves."""
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=2, n_lm=40, lm_noise=0.0)
        res = bundle_adjust(p, iterations=15, refine_landmarks=False)
        np.testing.assert_array_equal(np.asarray(res["xyz"]), np.asarray(p.xyz))
        assert float(res["rmse_after"]) < float(res["rmse_before"]) / 5

    def test_gauge_fixed_kf_untouched(self, rng):
        p, R_gt, t_gt, _ = synth_ba_problem(rng, n_kf=3, n_lm=50)
        res = bundle_adjust(p, iterations=10)
        np.testing.assert_array_equal(np.asarray(res["R"][0]), np.asarray(p.R[0]))
        np.testing.assert_array_equal(np.asarray(res["t"][0]), np.asarray(p.t[0]))

    def test_masked_observations_ignored(self, rng):
        p, R_gt, t_gt, _ = synth_ba_problem(rng, n_kf=2, n_lm=30)
        # corrupt half the observations but mask them out
        O = p.obs_uv.shape[0]
        bad_uv = p.obs_uv.at[O // 2:].set(10000.0)
        p2 = p._replace(obs_uv=bad_uv, obs_valid=p.obs_valid.at[O // 2:].set(False))
        res = bundle_adjust(p2, iterations=15)
        assert float(res["rmse_after"]) < 0.1  # corruption invisible

    def test_huber_robustness_to_outliers(self, rng):
        # two fixed KFs: one anchors SE(3), the second anchors SCALE — same
        # gauge as the reference's BAL harness (`zenslam_tests.cpp:109-285`)
        p, R_gt, t_gt, _ = synth_ba_problem(rng, n_kf=4, n_lm=60, M_cap=64,
                                            pix_noise=0.2, n_fixed=2)
        O = p.obs_uv.shape[0]
        n_out = O // 10
        sel = rng.choice(O, n_out, replace=False)
        uv = np.array(p.obs_uv)
        uv[sel] += rng.uniform(30, 80, (n_out, 2)).astype(np.float32)
        p2 = p._replace(obs_uv=jnp.asarray(uv))
        res = bundle_adjust(p2, iterations=24, huber_delta=1.0, trim_threshold=5.0)
        assert int(res["n_trimmed"]) >= n_out * 0.5  # bulk of outliers trimmed
        for k in range(2, 4):
            assert np.linalg.norm(np.asarray(res["t"][k]) - t_gt[k]) < 0.06


class TestPoseGraph:
    def _ring_graph(self, rng, n=12, drift=0.02, loop_weight=10.0):
        """Odometry ring with drift + one exact loop-closure edge."""
        # GT: poses around nothing fancy — incremental x-steps
        R_gt = [np.eye(3, dtype=np.float32)]
        t_gt = [np.zeros(3, np.float32)]
        for k in range(1, n):
            w = np.array([0, 0.03 * np.sin(k), 0], np.float32)
            R = np.asarray(so3_exp(jnp.asarray(w))) @ R_gt[-1]
            t = t_gt[-1] + np.array([-0.3, 0, 0], np.float32)
            R_gt.append(R.astype(np.float32)); t_gt.append(t.astype(np.float32))
        edges_i, edges_j, eR, et, ew = [], [], [], [], []
        # odometry edges with noise (drifty)
        poses = [(jnp.asarray(R), jnp.asarray(t)) for R, t in zip(R_gt, t_gt)]
        for k in range(n - 1):
            Ri, ti = poses[k]; Rj, tj = poses[k + 1]
            Rj_inv, tj_inv = se3_inverse(Rj, tj)
            Rm, tm = se3_compose(Ri, ti, Rj_inv, tj_inv)
            dw = rng.normal(0, drift, 3).astype(np.float32)
            dR = so3_exp(jnp.asarray(dw))
            Rm = dR @ Rm
            tm = tm + jnp.asarray(rng.normal(0, drift, 3).astype(np.float32))
            edges_i.append(k); edges_j.append(k + 1)
            eR.append(np.asarray(Rm)); et.append(np.asarray(tm)); ew.append(1.0)
        # loop closure 0 <-> n-1, exact
        Ri, ti = poses[0]; Rj, tj = poses[n - 1]
        Rj_inv, tj_inv = se3_inverse(Rj, tj)
        Rm, tm = se3_compose(Ri, ti, Rj_inv, tj_inv)
        edges_i.append(0); edges_j.append(n - 1)
        eR.append(np.asarray(Rm)); et.append(np.asarray(tm)); ew.append(loop_weight)
        E = len(edges_i)
        # initial guess: integrate the noisy odometry
        R0 = [np.eye(3, dtype=np.float32)]; t0 = [np.zeros(3, np.float32)]
        for k in range(n - 1):
            Rm_inv, tm_inv = se3_inverse(jnp.asarray(eR[k]), jnp.asarray(et[k]))
            Rn, tn = se3_compose(Rm_inv, tm_inv, jnp.asarray(R0[-1]), jnp.asarray(t0[-1]))
            R0.append(np.asarray(Rn)); t0.append(np.asarray(tn))
        g = PoseGraph(
            R=jnp.asarray(np.stack(R0)), t=jnp.asarray(np.stack(t0)),
            node_valid=jnp.ones(n, bool),
            node_fixed=jnp.zeros(n, bool).at[0].set(True),
            edge_i=jnp.asarray(edges_i, jnp.int32),
            edge_j=jnp.asarray(edges_j, jnp.int32),
            edge_R=jnp.asarray(np.stack(eR)), edge_t=jnp.asarray(np.stack(et)),
            edge_valid=jnp.ones(E, bool),
            edge_weight=jnp.asarray(ew, jnp.float32),
        )
        return g, np.stack(R_gt), np.stack(t_gt)

    def test_loop_closure_reduces_drift(self, rng):
        g, R_gt, t_gt = self._ring_graph(rng)
        drift_before = np.linalg.norm(np.asarray(g.t[-1]) - t_gt[-1])
        res = optimize_pose_graph(g, iterations=25)
        drift_after = np.linalg.norm(np.asarray(res["t"][-1]) - t_gt[-1])
        assert float(res["cost_after"]) < float(res["cost_before"]) / 5
        assert drift_after < drift_before * 0.5

    def test_fixed_node_untouched(self, rng):
        g, _, _ = self._ring_graph(rng)
        res = optimize_pose_graph(g, iterations=10)
        np.testing.assert_array_equal(np.asarray(res["R"][0]), np.asarray(g.R[0]))


class TestKeyframeDB:
    def test_add_and_covisibility(self):
        db = kf_db_init(max_keyframes=4, max_keypoints=32)
        # KF0 and KF1 share landmarks 0..19; KF2 observes 100..119 (disjoint)
        def snap(lm_start):
            lm = jnp.arange(32, dtype=jnp.int32) + lm_start
            return (jnp.zeros((32, 2)), lm, jnp.arange(32) < 20)
        xy, lm, v = snap(0)
        desc = jnp.zeros((32, 8), jnp.uint32)
        db = kf_db_add(db, jnp.eye(3), jnp.zeros(3), xy, lm, v, desc, 0)
        db = kf_db_add(db, jnp.eye(3), jnp.zeros(3), xy, lm, v, desc, 1)
        xy2, lm2, v2 = snap(100)
        db = kf_db_add(db, jnp.eye(3), jnp.zeros(3), xy2, lm2, v2, desc, 2)
        shared, edges = covisibility(db, max_landmarks=256, threshold=15)
        assert int(shared[0, 1]) == 20
        assert bool(edges[0, 1]) and not bool(edges[0, 2])
        assert int(shared[0, 0]) == 0  # no self edges

    def test_ring_eviction(self):
        db = kf_db_init(max_keyframes=2, max_keypoints=4)
        for f in range(3):
            db = kf_db_add(db, jnp.eye(3), jnp.zeros(3), jnp.zeros((4, 2)),
                           jnp.zeros(4, jnp.int32), jnp.ones(4, bool),
                           jnp.zeros((4, 8), jnp.uint32), f)
        fi = set(np.asarray(db.frame_idx).tolist())
        assert fi == {1, 2}  # frame 0 evicted


class TestBow:
    def test_vocabulary_and_histogram(self, rng):
        """≡ BoW vocabulary test (`zenslam_tests.cpp:724-752`): word mapping
        in bounds, unit-norm histogram."""
        desc = rng.integers(0, 2**32, (128, 8), dtype=np.uint32)
        vocab = build_vocabulary(jax.random.PRNGKey(0), jnp.asarray(desc),
                                 jnp.ones(128, bool), n_words=16, iters=5)
        assert vocab.shape == (16, 256)
        h = descriptors_to_bow(vocab, jnp.asarray(desc[:32]), jnp.ones(32, bool))
        assert abs(float(jnp.linalg.norm(h)) - 1.0) < 1e-5

    def test_database_self_similarity(self, rng):
        """≡ BoW database test (`zenslam_tests.cpp:754-795`): querying a
        stored frame's own histogram scores it highest, > 0.5."""
        desc_a = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        desc_b = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        vocab = build_vocabulary(jax.random.PRNGKey(1),
                                 jnp.asarray(np.concatenate([desc_a, desc_b])),
                                 jnp.ones(128, bool), n_words=32, iters=5)
        ha = descriptors_to_bow(vocab, jnp.asarray(desc_a), jnp.ones(64, bool))
        hb = descriptors_to_bow(vocab, jnp.asarray(desc_b), jnp.ones(64, bool))
        db = bow_db_init(8, 32)
        db = bow_db_add(db, ha, 0)
        db = bow_db_add(db, hb, 100)
        scores, frames, _ = bow_db_query(db, ha, query_frame_idx=200, min_frame_gap=30, top_k=2)
        assert int(frames[0]) == 0 and float(scores[0]) > 0.5

    def test_temporal_exclusion(self, rng):
        desc = rng.integers(0, 2**32, (64, 8), dtype=np.uint32)
        vocab = build_vocabulary(jax.random.PRNGKey(2), jnp.asarray(desc),
                                 jnp.ones(64, bool), n_words=16, iters=4)
        h = descriptors_to_bow(vocab, jnp.asarray(desc), jnp.ones(64, bool))
        db = bow_db_init(4, 16)
        db = bow_db_add(db, h, 95)
        scores, frames, _ = bow_db_query(db, h, query_frame_idx=100, min_frame_gap=30)
        assert float(scores[0]) < 0.0  # own recent frame excluded


def _big_ba_problem(K=64, M=32768, obs_per_lm=4, seed=0, perturb=0.02):
    """Full-map-scale synthetic STEREO BA problem (BASELINE config[2] scale).
    Stereo observations rigidify the graph like the live pipeline's BA —
    a mono problem with few obs/landmark has near-flat trajectory-warp
    valleys that landmarks absorb."""
    from zenslam_tpu.backend.ba import make_ba_problem
    rng = np.random.default_rng(seed)
    fx = fy = 400.0
    cx = cy = 256.0
    baseline = np.array([-0.11, 0.0, 0.0], np.float32)
    X = np.stack([rng.uniform(-4, 4, M), rng.uniform(-3, 3, M),
                  rng.uniform(4, 12, M)], -1).astype(np.float32)
    t_gt = np.stack([np.array([0.1 * k, 0.02 * (k % 3), 0], np.float32)
                     for k in range(K)])
    kf1 = rng.integers(0, K, (M, obs_per_lm)).astype(np.int32).reshape(-1)
    lm1 = np.repeat(np.arange(M, dtype=np.int32), obs_per_lm)
    xc = X[lm1] + t_gt[kf1]
    uv_l = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                     fy * xc[:, 1] / xc[:, 2] + cy], -1)
    xr = xc + baseline
    uv_r = np.stack([fx * xr[:, 0] / xr[:, 2] + cx,
                     fy * xr[:, 1] / xr[:, 2] + cy], -1)
    kf = np.concatenate([kf1, kf1])
    lm = np.concatenate([lm1, lm1])
    uv = np.concatenate([uv_l, uv_r]).astype(np.float32)
    cam = np.concatenate([np.zeros_like(kf1), np.ones_like(kf1)])
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    O = kf.size
    p = make_ba_problem(K, M, O, fx, fy, cx, cy,
                        t_rl=jnp.asarray(baseline))
    t_noise = rng.normal(0, perturb, t_gt.shape).astype(np.float32)
    t_noise[:2] = 0.0  # gauge anchors (fixed KFs) stay at groundtruth
    return p._replace(
        t=jnp.asarray(t_gt + t_noise),
        kf_valid=jnp.ones(K, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True).at[1].set(True),
        xyz=jnp.asarray(X + rng.normal(0, perturb, X.shape).astype(np.float32)),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(kf), obs_lm=jnp.asarray(lm),
        obs_uv=jnp.asarray(uv), obs_cam=jnp.asarray(cam, np.int32),
        obs_valid=jnp.ones(O, bool),
    ), t_gt


class TestBundleAdjustCG:
    """Matrix-free CG Schur BA (BASELINE config[2] scale: K=64, M=32k,
    O=128k — the dense path's (M,K,6,3) block tensor alone would be 151 MB)."""

    def test_matches_dense_on_small_problem(self):
        from zenslam_tpu.backend.ba import bundle_adjust, bundle_adjust_cg
        p, _ = _big_ba_problem(K=8, M=256, obs_per_lm=6, seed=3)
        rd = bundle_adjust(p, iterations=8)
        rc = bundle_adjust_cg(p, iterations=8, cg_iters=60)
        assert float(rc["rmse_after"]) < float(rd["rmse_after"]) * 1.2 + 1e-3
        np.testing.assert_allclose(np.asarray(rc["t"]), np.asarray(rd["t"]),
                                   atol=5e-3)

    def test_full_map_scale_converges(self):
        import time
        from zenslam_tpu.backend.ba import bundle_adjust_cg
        p, t_gt = _big_ba_problem(K=64, M=32768, obs_per_lm=4, seed=1)
        t0 = time.time()
        res = bundle_adjust_cg(p, iterations=8, cg_iters=40)
        jax.block_until_ready(res["t"])
        dt = time.time() - t0
        rmse0, rmse1 = float(res["rmse_before"]), float(res["rmse_after"])
        assert rmse1 < rmse0 * 0.2, (rmse0, rmse1)
        # pose error vs GT drops below the 2 cm perturbation
        err = np.linalg.norm(np.asarray(res["t"]) - t_gt, axis=-1)
        assert float(np.median(err)) < 0.01
        # acceptance count shifts by one with tiny preconditioner numerics
        # (fused vs LAPACK 6x6 inverses); convergence asserts above are the
        # real gate
        assert int(res["n_accepted"]) >= 3
        print(f"full-map CG BA: K=64 M=32768 O=131072 rmse {rmse0:.2f}->"
              f"{rmse1:.3f} in {dt:.1f}s (compile incl.)")

    def test_motion_only_mode(self):
        from zenslam_tpu.backend.ba import bundle_adjust_cg
        p, _ = _big_ba_problem(K=8, M=512, obs_per_lm=6, seed=5, perturb=0.01)
        res = bundle_adjust_cg(p, iterations=6, cg_iters=40,
                               refine_landmarks=False)
        np.testing.assert_array_equal(np.asarray(res["xyz"]),
                                      np.asarray(p.xyz))
        assert float(res["rmse_after"]) < float(res["rmse_before"])
