"""Tests for host-side formatters (≡ `utils/formatters.h`) and the
landmark-association frustum cull (≡ `is_in_frustum`,
`matching_utils.cpp:106-130`)."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.utils import euler_zyx_deg, format_pose, format_vec3


class TestFormatters:
    def test_vec3(self):
        assert format_vec3([1.0, -2.5, 3.125]) == "[1.000, -2.500, 3.125]"

    def test_euler_identity(self):
        y, p, r = euler_zyx_deg(np.eye(3))
        assert abs(y) < 1e-9 and abs(p) < 1e-9 and abs(r) < 1e-9

    def test_euler_yaw_round_trip(self):
        a = math.radians(30.0)
        Rz = np.array([[math.cos(a), -math.sin(a), 0],
                       [math.sin(a), math.cos(a), 0],
                       [0, 0, 1]])
        y, p, r = euler_zyx_deg(Rz)
        assert abs(y - 30.0) < 1e-6 and abs(p) < 1e-6 and abs(r) < 1e-6

    def test_format_pose_contains_translation(self):
        s = format_pose(np.eye(3), [0.5, 0.25, -1.0])
        assert "0.500" in s and "ypr=" in s


class TestFrustumCull:
    def _setup(self):
        from zenslam_tpu.io.synthetic import default_rig
        from zenslam_tpu.pipeline import SlamConfig, init_state

        cfg = SlamConfig(max_keypoints=8, max_landmarks=8)
        rig = default_rig(width=128, height=96)
        state = init_state(cfg, (96, 128))
        return cfg, rig, state

    def test_out_of_frustum_landmark_not_associated(self):
        """A landmark with an IDENTICAL descriptor must only associate when
        its projection lies inside the image frustum and range cap."""
        from zenslam_tpu.pipeline.step import _associate_landmarks

        cfg, rig, state = self._setup()
        desc = jnp.asarray(np.random.default_rng(0).integers(
            0, 2**32, (8, 8), dtype=np.uint32))
        feats = state.features._replace(
            xy=jnp.full((8, 2), 64.0),
            desc=desc,
            valid=jnp.arange(8) < 1,
            lm_idx=jnp.full((8,), -1, jnp.int32),
        )

        def lmap_at(xyz0):
            xyz = jnp.zeros((8, 3), jnp.float32).at[0].set(jnp.asarray(xyz0))
            return state.lmap._replace(
                xyz=xyz, desc=desc, valid=jnp.arange(8) < 1)

        R, t = jnp.eye(3), jnp.zeros(3)
        # in-frustum: in front, projects near the keypoint, within range
        cx, cy = float(rig.left.cx), float(rig.left.cy)
        fx = float(rig.left.fx)
        # world point that projects to (64, 64-ish): on the optical axis
        X_in = [(64.0 - cx) / fx * 5.0, (64.0 - cy) / fx * 5.0, 5.0]
        f_in, n_in = _associate_landmarks(cfg, rig, feats, lmap_at(X_in), R, t)
        assert int(n_in) == 1 and int(f_in.lm_idx[0]) == 0

        # behind the camera
        _, n_behind = _associate_landmarks(
            cfg, rig, feats, lmap_at([0.0, 0.0, -5.0]), R, t)
        assert int(n_behind) == 0

        # beyond the 50 m search radius (`tracking_options.h:14`)
        X_far = [(64.0 - cx) / fx * 80.0, (64.0 - cy) / fx * 80.0, 80.0]
        _, n_far = _associate_landmarks(
            cfg, rig, feats, lmap_at(X_far), R, t)
        assert int(n_far) == 0

        # in front but projecting far outside the image bounds: lateral
        # offset of 60 m at 5 m depth
        _, n_out = _associate_landmarks(
            cfg, rig, feats, lmap_at([30.0, 0.0, 5.0]), R, t)
        assert int(n_out) == 0
