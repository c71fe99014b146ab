"""Float detector/descriptor family (multi-scale Harris + SIFT-128 + L2
matcher) — ≡ the reference's FAST/ORB/SIFT × ORB/SIFT/FREAK factory
(`keypoint_detector_simple.cpp:8-36`), config-switchable, with a parity
test against the ORB path on a synthetic scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.ops.harris import harris_score, harris_score_multiscale
from zenslam_tpu.ops.sift import sift_descriptors
from zenslam_tpu.ops.match import (
    match_descriptors_float, l2_matrix, lsh_binarize, hamming_matrix,
)
from zenslam_tpu.pipeline import SlamConfig, run_sequence
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


def checkerboard(H=128, W=128, cell=16):
    yy, xx = np.mgrid[0:H, 0:W]
    img = (((yy // cell) + (xx // cell)) % 2).astype(np.float32)
    return jnp.asarray(img * 0.8 + 0.1)


class TestHarris:
    def test_corners_score_high(self):
        img = checkerboard()
        s = np.asarray(harris_score(img))
        # interior checkerboard corners (cell crossings) vs flat centers
        corner_vals = [s[y, x] for y in range(16, 113, 16)
                       for x in range(16, 113, 16)]
        flat_vals = [s[y + 8, x + 8] for y in range(16, 96, 16)
                     for x in range(16, 96, 16)]
        assert np.median(corner_vals) > 50 * max(np.median(flat_vals), 1e-12)

    def test_multiscale_covers_blurred_corners(self):
        """A corner visible only at coarse scale (heavily blurred board)
        still fires in the multi-scale response."""
        from zenslam_tpu.ops.image import gaussian_blur

        img = gaussian_blur(checkerboard(cell=32), 3.0, radius=8)
        s1 = np.asarray(harris_score(img))
        sm = np.asarray(harris_score_multiscale(img, n_scales=3))
        assert sm.max() >= s1.max() * 0.99
        assert (sm > 0).sum() >= (s1 > 0).sum()


class TestSiftDescriptors:
    def _textured(self, H=160, W=160, seed=0):
        rng = np.random.default_rng(seed)
        base = rng.random((H // 8, W // 8)).astype(np.float32)
        img = np.kron(base, np.ones((8, 8), np.float32))
        from zenslam_tpu.ops.image import gaussian_blur

        return gaussian_blur(jnp.asarray(img), 1.0)

    def test_unit_norm_and_masked(self):
        img = self._textured()
        xy = jnp.asarray([[40.0, 40.0], [80.0, 60.0], [0.0, 0.0]])
        valid = jnp.asarray([True, True, False])
        d = sift_descriptors(img, xy, valid)
        assert d.shape == (3, 128)
        n = np.linalg.norm(np.asarray(d), axis=-1)
        np.testing.assert_allclose(n[:2], 1.0, atol=1e-3)
        assert n[2] == 0.0

    def test_discriminative_same_vs_different(self):
        """Same physical point in a shifted image matches itself far better
        than it matches other points."""
        img = self._textured()
        shift = 3
        img2 = jnp.roll(img, (shift, shift), (0, 1))
        pts = jnp.asarray([[40.0, 40.0], [88.0, 56.0], [56.0, 96.0],
                           [104.0, 104.0]])
        v = jnp.ones(4, bool)
        d1 = sift_descriptors(img, pts, v)
        d2 = sift_descriptors(img2, pts + shift, v)
        D = np.asarray(jnp.sqrt(l2_matrix(d1, d2) + 1e-12))
        for i in range(4):
            off = np.delete(D[i], i)
            assert D[i, i] < 0.5 * off.min()

    def test_rotation_tolerance(self):
        """The steered descriptor survives a 30-degree in-plane rotation
        (the reason SIFT/ORB steer at all)."""
        from zenslam_tpu.ops.image import bilinear_sample

        img = self._textured()
        H, W = img.shape
        ang = np.deg2rad(30.0)
        c, s = np.cos(ang), np.sin(ang)
        yy, xx = jnp.mgrid[0:H, 0:W]
        cx = cy = (H - 1) / 2.0
        sx = c * (xx - cx) - s * (yy - cy) + cx
        sy = s * (xx - cx) + c * (yy - cy) + cy
        rot = bilinear_sample(img, jnp.stack([sx, sy], -1))
        pts = jnp.asarray([[70.0, 70.0], [90.0, 84.0]])
        # the same physical points in the rotated image
        rx = c * (pts[:, 0] - cx) + s * (pts[:, 1] - cy) + cx
        ry = -s * (pts[:, 0] - cx) + c * (pts[:, 1] - cy) + cy
        v = jnp.ones(2, bool)
        d1 = sift_descriptors(img, pts, v)
        d2 = sift_descriptors(rot, jnp.stack([rx, ry], -1), v)
        dist = np.linalg.norm(np.asarray(d1) - np.asarray(d2), axis=-1)
        assert (dist < 0.9).all()   # unit-norm vectors: <0.9 ≈ angle < 53°


class TestFloatMatcher:
    def test_match_and_cross_check(self):
        rng = np.random.default_rng(1)
        base = rng.normal(0, 1, (6, 128)).astype(np.float32)
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        noisy = base + rng.normal(0, 0.02, base.shape).astype(np.float32)
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)
        perm = np.asarray([2, 0, 1, 5, 3, 4])
        idx, dist, ok = match_descriptors_float(
            jnp.asarray(base), jnp.asarray(noisy[perm]),
            jnp.ones(6, bool), jnp.ones(6, bool), max_distance=0.5)
        assert bool(ok.all())
        np.testing.assert_array_equal(np.asarray(idx), np.argsort(perm))

    def test_max_distance_rejects(self):
        rng = np.random.default_rng(2)
        a = rng.normal(0, 1, (4, 128)).astype(np.float32)
        b = rng.normal(0, 1, (4, 128)).astype(np.float32)
        a /= np.linalg.norm(a, axis=-1, keepdims=True)
        b /= np.linalg.norm(b, axis=-1, keepdims=True)
        idx, dist, ok = match_descriptors_float(
            jnp.asarray(a), jnp.asarray(b), jnp.ones(4, bool),
            jnp.ones(4, bool), max_distance=0.2)
        assert not bool(ok.any())   # random unit vectors sit near sqrt(2)

    def test_lsh_binarize_preserves_neighbors(self):
        """SimHash codes: Hamming distance tracks angular distance, so the
        nearest float neighbor stays the nearest binary neighbor."""
        rng = np.random.default_rng(3)
        base = rng.normal(0, 1, (8, 128)).astype(np.float32)
        base /= np.linalg.norm(base, axis=-1, keepdims=True)
        noisy = base + rng.normal(0, 0.05, base.shape).astype(np.float32)
        noisy /= np.linalg.norm(noisy, axis=-1, keepdims=True)
        ca = lsh_binarize(jnp.asarray(base))
        cb = lsh_binarize(jnp.asarray(noisy))
        assert ca.shape == (8, 8) and ca.dtype == jnp.uint32
        D = np.asarray(hamming_matrix(ca, cb))
        assert (D.argmin(axis=1) == np.arange(8)).all()


class TestPipelineParity:
    """Config-switchable end-to-end: the float family tracks the same
    synthetic scene with recall and accuracy comparable to the ORB path."""

    @pytest.fixture(scope="class")
    def seq(self):
        return make_sequence(np.random.default_rng(21), n_frames=10,
                             motion="arc")

    def _run(self, seq, **kw):
        cfg = SlamConfig(max_keypoints=256, max_landmarks=2048,
                         pnp_iters=128, rigid_iters=128, **kw)
        states, telem = run_sequence(cfg, seq.rig, seq.left, seq.right)
        est = np.stack([np.asarray(-telem.R_cw[t].T @ telem.t_cw[t])
                        for t in range(telem.R_cw.shape[0])])
        gt = camera_positions(seq.R_lw, seq.t_lw)
        return telem, ate_rmse(est, gt)

    def test_float_family_tracks(self, seq):
        telem_orb, ate_orb = self._run(seq)
        telem_f, ate_f = self._run(seq, detector="harris", descriptor="sift")
        assert bool(np.asarray(telem_f.pose_ok)[2:].all())
        # parity: within 2x of the ORB path's tracked count and ATE + margin
        n_orb = np.asarray(telem_orb.n_tracked)[3:].mean()
        n_f = np.asarray(telem_f.n_tracked)[3:].mean()
        assert n_f > 0.5 * n_orb
        assert ate_f < max(2.0 * ate_orb, 0.02)

    def test_sift_descriptor_with_fast_detector(self, seq):
        """Families mix freely (detector x descriptor grid ≡ the factory)."""
        telem, ate = self._run(seq, detector="fast", descriptor="sift")
        assert bool(np.asarray(telem.pose_ok)[2:].all())
        assert ate < 0.05
