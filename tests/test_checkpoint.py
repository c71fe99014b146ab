"""Checkpoint/resume tests — capability the reference lacks entirely
(SURVEY.md §5 checkpoint/resume row: 'None for SLAM state'); required here
for restartable multi-host BA jobs."""

import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.io.checkpoint import (
    save_pytree, load_pytree, save_system, load_system,
)
from zenslam_tpu.pipeline import SlamConfig, init_state, run_sequence
from zenslam_tpu.pipeline.system import BackendConfig, create_system, run_system


@pytest.fixture(scope="module")
def seq():
    return make_sequence(np.random.default_rng(5), n_frames=12, motion="strafe")


def _cfg():
    return SlamConfig(max_keypoints=256, max_landmarks=2048,
                      pnp_iters=128, rigid_iters=128)


class TestPytreeRoundTrip:
    def test_state_round_trip_bit_exact(self, seq, tmp_path):
        cfg = _cfg()
        state, _ = run_sequence(cfg, seq.rig, seq.left[:6], seq.right[:6])
        p = str(tmp_path / "state.npz")
        save_pytree(p, state)
        template = init_state(cfg, seq.left[0].shape)
        restored = load_pytree(p, template)
        import jax
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_structure_mismatch_raises(self, seq, tmp_path):
        cfg = _cfg()
        state = init_state(cfg, seq.left[0].shape)
        p = str(tmp_path / "state.npz")
        save_pytree(p, state)
        with pytest.raises(ValueError, match="structure mismatch"):
            load_pytree(p, {"not": "the same structure",
                            "x": np.zeros(3)})


class TestResume:
    def test_resume_reproduces_uninterrupted_run(self, seq, tmp_path):
        """Save mid-sequence, reload, continue: final trajectory and map must
        be bit-exact vs the uninterrupted run."""
        cfg = _cfg()
        # uninterrupted
        state_a, tel_a = run_sequence(cfg, seq.rig, seq.left, seq.right)
        # interrupted at frame 6 + resumed
        state_b, _ = run_sequence(cfg, seq.rig, seq.left[:6], seq.right[:6])
        p = str(tmp_path / "mid.npz")
        save_pytree(p, state_b)
        restored = load_pytree(p, init_state(cfg, seq.left[0].shape))
        state_c, tel_c = run_sequence(cfg, seq.rig, seq.left[6:], seq.right[6:],
                                      state=restored)
        np.testing.assert_array_equal(np.asarray(state_a.t_cw),
                                      np.asarray(state_c.t_cw))
        np.testing.assert_array_equal(np.asarray(state_a.lmap.xyz),
                                      np.asarray(state_c.lmap.xyz))
        np.testing.assert_array_equal(np.asarray(tel_a.t_cw[6:]),
                                      np.asarray(tel_c.t_cw))

    def test_system_checkpoint_round_trip(self, seq, tmp_path):
        """Full SlamSystem (keyframe DB + BoW + edges) resume parity."""
        cfg = _cfg()
        bcfg = BackendConfig(max_keyframes=8, ba_window=4, ba_iterations=4,
                             enable_loop_closure=True, bow_levels=1,
                             bow_words=32)
        H, W = seq.left[0].shape
        sys_a = create_system(cfg, bcfg, seq.rig, (H, W))
        run_system(sys_a, seq.left, seq.right)

        sys_b = create_system(cfg, bcfg, seq.rig, (H, W))
        run_system(sys_b, seq.left[:6], seq.right[:6])
        p = str(tmp_path / "sys.npz")
        save_system(p, sys_b)
        sys_c = load_system(p, cfg, bcfg, seq.rig, (H, W))
        assert sys_c.last_kf_slot == sys_b.last_kf_slot
        assert sys_c.n_ba_runs == sys_b.n_ba_runs
        run_system(sys_c, seq.left[6:], seq.right[6:])
        np.testing.assert_array_equal(np.asarray(sys_a.state.t_cw),
                                      np.asarray(sys_c.state.t_cw))
        np.testing.assert_array_equal(np.asarray(sys_a.kf_db.valid),
                                      np.asarray(sys_c.kf_db.valid))
