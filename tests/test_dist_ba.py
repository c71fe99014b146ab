"""Distributed BA tests on the 8-virtual-device CPU mesh — the multi-device
coverage the reference entirely lacks (SURVEY.md §4 'for the TPU build add')."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.backend import bundle_adjust
from zenslam_tpu.parallel import shard_ba_problem, dist_bundle_adjust, make_ba_mesh
from tests.test_backend import synth_ba_problem


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8, "conftest must force 8 virtual devices"
    return make_ba_mesh(8)


class TestDistBA:
    def test_matches_single_device(self, rng, mesh8):
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=4, n_lm=120, M_cap=128,
                                               K_cap=8, pose_noise=0.04)
        ref = bundle_adjust(p, iterations=12)
        ps = shard_ba_problem(p, 8)
        res = dist_bundle_adjust(ps, mesh8, iterations=12)
        # same optimum (not bit-identical: independent f32 convergence paths)
        np.testing.assert_allclose(np.asarray(res["t"][:4]), np.asarray(ref["t"][:4]), atol=5e-3)
        for k in range(1, 4):
            assert np.linalg.norm(np.asarray(res["t"][k]) - t_gt[k]) < 0.03

    def test_landmarks_recovered_across_shards(self, rng, mesh8):
        p, _, _, X_gt = synth_ba_problem(rng, n_kf=4, n_lm=120, M_cap=128, K_cap=8)
        ps = shard_ba_problem(p, 8)
        res = dist_bundle_adjust(ps, mesh8, iterations=12)
        # landmark order is preserved by block sharding (M_cap=128 divisible by 8)
        lm_err = np.linalg.norm(np.asarray(res["xyz"])[:120] - X_gt, axis=-1)
        assert np.median(lm_err) < 0.02

    def test_cost_decreases(self, rng, mesh8):
        p, *_ = synth_ba_problem(rng, n_kf=6, n_lm=200, M_cap=256, K_cap=8,
                                 pose_noise=0.05, pix_noise=0.3)
        ps = shard_ba_problem(p, 8)
        res = dist_bundle_adjust(ps, mesh8, iterations=15)
        assert float(res["cost_after"]) < float(res["cost_before"]) / 10
        assert int(res["n_accepted"]) >= 5

    def test_motion_only_mode(self, rng, mesh8):
        p, *_ = synth_ba_problem(rng, n_kf=3, n_lm=60, M_cap=64, K_cap=8, lm_noise=0.0)
        ps = shard_ba_problem(p, 8)
        res = dist_bundle_adjust(ps, mesh8, iterations=10, refine_landmarks=False)
        np.testing.assert_array_equal(np.asarray(res["xyz"]), np.asarray(ps.xyz))
        assert float(res["cost_after"]) < float(res["cost_before"])


class TestShardLayout:
    def test_obs_routed_to_landmark_shard(self, rng):
        p, *_ = synth_ba_problem(rng, n_kf=2, n_lm=64, M_cap=64, K_cap=4)
        ps = shard_ba_problem(p, 8)
        ms = ps.xyz.shape[0] // 8
        O_shard = ps.obs_kf.shape[0] // 8
        lm = np.asarray(ps.obs_lm)
        ok = np.asarray(ps.obs_valid)
        for d in range(8):
            sl = slice(d * O_shard, (d + 1) * O_shard)
            assert (lm[sl][ok[sl]] < ms).all()  # local indices only

    def test_all_valid_obs_preserved(self, rng):
        p, *_ = synth_ba_problem(rng, n_kf=3, n_lm=48, M_cap=48, K_cap=4)
        ps = shard_ba_problem(p, 8)
        assert int(ps.obs_valid.sum()) == int(p.obs_valid.sum())


class TestDeviceRouter:
    """shard_ba_problem_jit (the live path's on-device router) must agree
    with the host-side shard_ba_problem layout semantics."""

    def test_matches_host_router(self, rng):
        from zenslam_tpu.parallel.dist_ba import shard_ba_problem_jit
        p, *_ = synth_ba_problem(rng, n_kf=3, n_lm=64, M_cap=64, K_cap=4)
        host = shard_ba_problem(p, 8)
        ops = host.obs_kf.shape[0] // 8
        dev, n_drop = shard_ba_problem_jit(p, 8, ops)
        assert int(n_drop) == 0
        # same multiset of (shard, kf, local_lm, u, v) observation tuples
        def tuples(ps, O_shard):
            out = set()
            lm = np.asarray(ps.obs_lm); kf = np.asarray(ps.obs_kf)
            uv = np.asarray(ps.obs_uv); ok = np.asarray(ps.obs_valid)
            cam = np.asarray(ps.obs_cam)
            for i in np.flatnonzero(ok):
                out.add((i // O_shard, int(kf[i]), int(lm[i]), int(cam[i]),
                         round(float(uv[i, 0]), 4), round(float(uv[i, 1]), 4)))
            return out
        assert tuples(host, ops) == tuples(dev, ops)

    def test_drop_counting(self, rng):
        from zenslam_tpu.parallel.dist_ba import shard_ba_problem_jit
        p, *_ = synth_ba_problem(rng, n_kf=3, n_lm=64, M_cap=64, K_cap=4)
        n_valid = int(p.obs_valid.sum())
        dev, n_drop = shard_ba_problem_jit(p, 8, 2)  # starve the shards
        assert int(n_drop) == n_valid - int(dev.obs_valid.sum())
        assert int(n_drop) > 0

    def test_dist_solve_from_device_router(self, rng, mesh8):
        from zenslam_tpu.parallel.dist_ba import shard_ba_problem_jit
        p, R_gt, t_gt, X_gt = synth_ba_problem(rng, n_kf=4, n_lm=120,
                                               M_cap=128, K_cap=8,
                                               pose_noise=0.04)
        ref = bundle_adjust(p, iterations=12)
        O = p.obs_kf.shape[0]
        ps, n_drop = shard_ba_problem_jit(p, 8, O)
        assert int(n_drop) == 0
        res = dist_bundle_adjust(ps, mesh8, iterations=12)
        np.testing.assert_allclose(np.asarray(res["t"][:4]),
                                   np.asarray(ref["t"][:4]), atol=5e-3)


class TestLiveDistBackend:
    """ba_solver='dist' runs the sharded solver inside the LIVE keyframe
    backend (r4 verdict task: promote dist BA from demo to live capability)."""

    def test_live_dist_matches_dense(self):
        from zenslam_tpu.io.synthetic import make_sequence
        from zenslam_tpu.pipeline.state import SlamConfig
        from zenslam_tpu.pipeline.system import (BackendConfig, create_system,
                                                 run_system)
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048, pnp_iters=128,
                         rigid_iters=128, kf_min_frames=2,
                         kf_min_translation=0.04)
        seq = make_sequence(np.random.default_rng(11), n_frames=10,
                            motion="strafe", speed=0.6)
        results = {}
        for solver in ("dense", "dist"):
            sysm = create_system(
                cfg, BackendConfig(ba_every_kf=True,
                                   enable_loop_closure=False,
                                   ba_solver=solver),
                seq.rig, seq.left[0].shape)
            tel, infos = run_system(sysm, seq.left, seq.right)
            assert sysm.n_ba_runs >= 1
            ba_runs = [np.asarray(i["ba"]) for i in infos
                       if i["ba"] is not None]
            assert all(r[1] <= r[0] * 1.05 for r in ba_runs)
            results[solver] = (np.asarray(tel.t_cw), np.asarray(sysm.kf_db.t),
                               np.asarray(sysm.kf_db.valid))
        t_dense, kf_dense, v = results["dense"]
        t_dist, kf_dist, v2 = results["dist"]
        np.testing.assert_array_equal(v, v2)
        # same optimum to f32 convergence noise (same LM schedule both sides)
        np.testing.assert_allclose(t_dist, t_dense, atol=2e-3)
        np.testing.assert_allclose(kf_dist[v], kf_dense[v], atol=2e-3)
