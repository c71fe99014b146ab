"""Landmark host-spill archive + frustum reload (SURVEY §5 map-scaling
axis, VERDICT r2 item 7): under forced slot pressure on an orbit (revisit)
trajectory, recycled landmarks must re-enter the live table on revisit and
accuracy must hold."""

import numpy as np
import jax.numpy as jnp
import pytest

from zenslam_tpu.io.synthetic import make_sequence, default_rig
from zenslam_tpu.pipeline import SlamConfig
from zenslam_tpu.pipeline.system import BackendConfig, create_system, process_frame
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


class TestArchiveUnit:
    def _lmap(self, cfg):
        from zenslam_tpu.pipeline.state import empty_landmarks

        lmap = empty_landmarks(cfg)
        rng = np.random.default_rng(0)
        n = 32
        lmap = lmap._replace(
            xyz=lmap.xyz.at[:n].set(
                jnp.asarray(rng.normal(0, 2, (n, 3)).astype(np.float32)
                            + np.array([0, 0, 6], np.float32))),
            desc=lmap.desc.at[:n].set(
                jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32))),
            valid=lmap.valid.at[:n].set(True),
            last_seen=lmap.last_seen.at[:n].set(5),
        )
        return lmap

    def test_sync_upsert_and_dormant(self):
        from zenslam_tpu.backend.map_archive import LandmarkArchive

        cfg = SlamConfig(max_landmarks=64)
        lmap = self._lmap(cfg)
        arch = LandmarkArchive()
        arch.sync(lmap)
        assert len(arch) == 32 and not arch.dormant.any()
        # recycle slot 3 (generation bump = different landmark)
        lmap2 = lmap._replace(
            generation=lmap.generation.at[3].add(1),
            xyz=lmap.xyz.at[3].set(jnp.asarray([9.0, 9.0, 9.0])))
        arch.sync(lmap2)
        assert len(arch) == 33          # the new occupant is a new row
        assert arch.dormant.sum() == 1  # the old occupant went dormant
        assert arch.n_spills == 1

    def test_reload_reinserts_in_frustum_only(self):
        from zenslam_tpu.backend.map_archive import LandmarkArchive

        cfg = SlamConfig(max_landmarks=64)
        lmap = self._lmap(cfg)
        rig = default_rig(128, 96)
        arch = LandmarkArchive()
        arch.sync(lmap)
        # drop everything from the live map (simulate recycling)
        dead = lmap._replace(valid=jnp.zeros_like(lmap.valid),
                             generation=lmap.generation + 1)
        arch.sync(dead)
        assert arch.dormant.sum() == 32
        # camera at origin looking +z: the landmarks (z ~6) are in frustum
        R = jnp.eye(3)
        t = jnp.zeros(3)
        new_lmap = arch.reload(dead, R, t, rig.left, frame_idx=10,
                               reload_max=16)
        n_live = int(new_lmap.valid.sum())
        assert 0 < n_live <= 16
        assert arch.n_reloads == n_live
        assert arch.dormant.sum() == 32 - n_live
        # camera looking AWAY (+z behind): nothing reloads
        R_away = jnp.asarray(np.diag([1.0, -1.0, -1.0]).astype(np.float32))
        arch2 = LandmarkArchive()
        arch2.sync(lmap)
        arch2.sync(dead)
        out = arch2.reload(dead, R_away, t, rig.left, frame_idx=10)
        assert arch2.n_reloads == 0 and out is dead


class TestOrbitSlotPressure:
    """Orbit trajectory with a live table far smaller than the scene's
    landmark count: by the time the camera returns to the start, the early
    landmarks were recycled — the archive must bring them back AND the
    front-end must RE-ASSOCIATE tracks to the reloaded slots. (An orbit
    without loop closure drifts by design — tests/test_loop_closure.py
    owns the drift-correction story — so accuracy here is a
    no-worse-than-spill-off bound, not an absolute one.)"""

    @pytest.fixture(scope="class")
    def seq(self):
        return make_sequence(np.random.default_rng(21), n_frames=36,
                             width=320, height=240, motion="orbit",
                             orbit_radius=1.0)

    def _run(self, seq, spill: bool):
        cfg = SlamConfig(max_keypoints=256, max_landmarks=384,
                         pnp_iters=128, rigid_iters=128, kf_min_frames=2)
        bcfg = BackendConfig(ba_every_kf=False, enable_loop_closure=False,
                             enable_map_spill=spill, spill_reload_max=128)
        sysm = create_system(cfg, bcfg, seq.rig, seq.left[0].shape)
        est = []
        n_reassoc = 0
        for t in range(seq.left.shape[0]):
            tel, info = process_frame(sysm, jnp.asarray(seq.left[t]),
                                      jnp.asarray(seq.right[t]))
            R = np.asarray(tel.R_cw)
            tt = np.asarray(tel.t_cw)
            est.append(-R.T @ tt)
            if spill and sysm.archive.reload_keys:
                # live tracks attached to reload-created (slot, generation)s
                f = sysm.state.features
                lm = np.asarray(f.lm_idx)
                ok = np.asarray(f.valid) & (lm >= 0)
                gen = np.asarray(sysm.state.lmap.generation)
                keys = {(int(s), int(gen[s])) for s in lm[ok]}
                n_reassoc += len(keys & sysm.archive.reload_keys)
        gt = camera_positions(seq.R_lw, seq.t_lw)
        return sysm, ate_rmse(np.stack(est), gt), n_reassoc

    def test_spill_restores_and_reassociates(self, seq):
        sys_on, ate_on, n_reassoc = self._run(seq, spill=True)
        assert sys_on.archive.n_spills > 200     # real slot pressure happened
        assert sys_on.archive.n_reloads > 0      # revisits reloaded
        assert len(sys_on.archive) > 384         # archive exceeds live capacity
        assert n_reassoc > 0                     # tracks re-attached to them

    def test_spill_does_not_hurt_accuracy(self, seq):
        _, ate_off, _ = self._run(seq, spill=False)
        _, ate_on, _ = self._run(seq, spill=True)
        assert ate_on < 1.15 * ate_off + 0.02


class TestResumeWithSpill:
    """Checkpoint/resume parity UNDER SLOT PRESSURE (r3 verdict task 3): an
    interrupted-and-resumed run must reproduce the uninterrupted run's
    spills, reloads, and trajectory — which requires the archive (rows,
    keys, dormancy, counters) to live in the checkpoint."""

    @pytest.fixture(scope="class")
    def seq(self):
        return make_sequence(np.random.default_rng(23), n_frames=30,
                             width=320, height=240, motion="orbit",
                             orbit_radius=1.0)

    def _cfg(self):
        cfg = SlamConfig(max_keypoints=256, max_landmarks=384,
                         pnp_iters=128, rigid_iters=128, kf_min_frames=2)
        bcfg = BackendConfig(ba_every_kf=False, enable_loop_closure=False,
                             enable_map_spill=True, spill_reload_max=128)
        return cfg, bcfg

    def _run(self, sysm, seq, lo, hi):
        est = []
        for t in range(lo, hi):
            tel, _ = process_frame(sysm, jnp.asarray(seq.left[t]),
                                   jnp.asarray(seq.right[t]))
            R = np.asarray(tel.R_cw)
            tt = np.asarray(tel.t_cw)
            est.append(-R.T @ tt)
        return est

    def test_resume_parity(self, seq, tmp_path):
        from zenslam_tpu.io.checkpoint import save_system, load_system

        cfg, bcfg = self._cfg()
        T = seq.left.shape[0]
        cut = 18

        # uninterrupted reference run
        sys_a = create_system(cfg, bcfg, seq.rig, seq.left[0].shape)
        est_a = self._run(sys_a, seq, 0, T)
        assert sys_a.archive.n_spills > 50, "fixture must create pressure"

        # interrupted at `cut`, checkpointed, resumed
        sys_b = create_system(cfg, bcfg, seq.rig, seq.left[0].shape)
        self._run(sys_b, seq, 0, cut)
        p = str(tmp_path / "spill_ckpt.npz")
        save_system(p, sys_b)
        sys_c = load_system(p, cfg, bcfg, seq.rig, seq.left[0].shape)
        # archive state survived: same rows, dormancy, counters
        assert len(sys_c.archive) == len(sys_b.archive)
        assert (sys_c.archive.dormant == sys_b.archive.dormant).all()
        assert sys_c.archive.n_spills == sys_b.archive.n_spills
        assert sys_c.archive.n_reloads == sys_b.archive.n_reloads
        assert sys_c.archive._key_to_row == sys_b.archive._key_to_row
        est_c = self._run(sys_c, seq, cut, T)

        # resumed tail reproduces the uninterrupted run exactly
        np.testing.assert_array_equal(np.stack(est_a[cut:]), np.stack(est_c))
        assert sys_c.archive.n_spills == sys_a.archive.n_spills
        assert sys_c.archive.n_reloads == sys_a.archive.n_reloads
        assert len(sys_c.archive) == len(sys_a.archive)
