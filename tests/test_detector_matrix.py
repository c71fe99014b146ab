"""DoG scale-space detector + FREAK retinal descriptor (r3 verdict task 6):
completes the reference's 3x3 detector x descriptor factory
(`keypoint_detector_simple.cpp:8-36` — FAST/ORB(Harris-multiscale)/SIFT(DoG)
x ORB/SIFT/FREAK), config-switchable and parity-tested like the float
family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.ops.dog import dog_score
from zenslam_tpu.ops.freak import freak_descriptors
from zenslam_tpu.ops.match import hamming_matrix
from zenslam_tpu.ops.image import gaussian_blur, remap
from zenslam_tpu.pipeline import SlamConfig, run_sequence
from zenslam_tpu.eval.metrics import ate_rmse, camera_positions


def blob_image(H=192, W=192, sigma=4.0, centers=((48, 48), (144, 96), (96, 160))):
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = np.zeros((H, W), np.float32)
    for cy, cx in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma ** 2))
    return jnp.asarray(0.1 + 0.8 * img / img.max())


class TestDogDetector:
    def test_blobs_fire_near_centers(self):
        """DoG extrema localize isolated Gaussian blobs (the operator's
        defining property — Harris would NOT fire on a blob center)."""
        centers = ((48, 48), (144, 96), (96, 160))
        s = np.asarray(dog_score(blob_image(centers=centers)))
        assert (s > 0).sum() > 0
        for cy, cx in centers:
            patch = s[cy - 6:cy + 7, cx - 6:cx + 7]
            assert patch.max() > 0, f"no extremum near blob ({cy},{cx})"
        # responses away from the blobs are zero
        assert s[10:20, 100:180].max() == 0.0

    def test_multi_octave_covers_large_blobs(self):
        """A blob far above the base ladder's scales is caught by a coarser
        octave."""
        img_big = blob_image(sigma=14.0, centers=((96, 96),))
        s1 = np.asarray(dog_score(img_big, n_octaves=1))
        s3 = np.asarray(dog_score(img_big, n_octaves=3))
        patch = s3[80:113, 80:113]
        assert patch.max() > 0
        assert s3.max() >= s1.max()

    def test_odd_dimensions_supported(self):
        """Odd heights/widths (e.g. 753, or odd intermediate octaves) must
        not shape-mismatch the octave decimation (r4 advisor finding: the
        2x2-average strided slices required even dims at every octave)."""
        img = blob_image(H=151, W=117, centers=((75, 58),))
        s = np.asarray(dog_score(img, n_octaves=3))
        assert s.shape == (151, 117)
        assert s[69:82, 52:65].max() > 0

    def test_edges_suppressed(self):
        """A pure step edge (ridge-like Hessian) must not fire (Lowe §4.1
        principal-curvature rejection)."""
        img = np.full((128, 128), 0.2, np.float32)
        img[:, 64:] = 0.8
        s = np.asarray(dog_score(gaussian_blur(jnp.asarray(img), 1.0)))
        # the edge band stays quiet
        assert s[:, 56:72].max() == 0.0


class TestFreakDescriptors:
    def _textured(self, H=192, W=192, seed=3):
        from zenslam_tpu.io.synthetic import smooth_texture

        return jnp.asarray(smooth_texture(np.random.default_rng(seed), H, W))

    def test_packed_and_masked(self):
        img = self._textured()
        xy = jnp.asarray([[60.0, 60.0], [120.0, 90.0], [80.0, 140.0]])
        valid = jnp.asarray([True, True, False])
        packed, theta = freak_descriptors(img, xy, valid)
        assert packed.shape == (3, 8) and packed.dtype == jnp.uint32
        assert int(jnp.sum(packed[2])) == 0
        assert int(jnp.sum(packed[0])) > 0

    def test_distinct_points_far_same_point_near(self):
        img = self._textured()
        rng = np.random.default_rng(5)
        xy = jnp.asarray(np.stack([rng.uniform(40, 150, 24),
                                   rng.uniform(40, 150, 24)], -1), jnp.float32)
        v = jnp.ones(24, bool)
        d, _ = freak_descriptors(img, xy, v)
        D = np.asarray(hamming_matrix(d, d))
        self_d = np.diag(D)
        off = D + np.eye(24) * 999
        assert self_d.max() == 0
        assert np.median(off.min(axis=1)) > 40, "distinct points must differ"

    def test_rotation_robustness(self):
        """Descriptors steer with image rotation (retina + orientation),
        staying far below the 128-bit random distance."""
        img = self._textured(256, 256)
        H = W = 256
        cx = cy = 127.5
        ang = 0.5
        my, mx = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        ca, sa = np.cos(ang), np.sin(ang)
        rx = ca * (mx - cx) - sa * (my - cy) + cx
        ry = sa * (mx - cx) + ca * (my - cy) + cy
        rot = remap(img, jnp.asarray(rx), jnp.asarray(ry))
        rng = np.random.default_rng(7)
        pts = np.stack([rng.uniform(90, 165, 24), rng.uniform(90, 165, 24)], -1)
        qx = ca * (pts[:, 0] - cx) + sa * (pts[:, 1] - cy) + cx
        qy = -sa * (pts[:, 0] - cx) + ca * (pts[:, 1] - cy) + cy
        v = jnp.ones(24, bool)
        d0, _ = freak_descriptors(img, jnp.asarray(pts, jnp.float32), v)
        d1, _ = freak_descriptors(rot, jnp.asarray(np.stack([qx, qy], -1),
                                                   jnp.float32), v)
        ham = np.diag(np.asarray(hamming_matrix(d0, d1)))
        assert np.median(ham) < 80, np.median(ham)  # random = 128


class TestMatrixPipelineParity:
    """The new detector/descriptor combinations run the full pipeline with
    accuracy comparable to the ORB path (same bar as the float family)."""

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

    def test_freak_descriptor_tracks(self, seq):
        telem_orb, ate_orb = self._run(seq)
        telem_f, ate_f = self._run(seq, descriptor="freak")
        assert bool(np.asarray(telem_f.pose_ok)[2:].all())
        n_orb = np.asarray(telem_orb.n_tracked)[3:].mean()
        n_f = np.asarray(telem_f.n_tracked)[3:].mean()
        assert n_f > 0.5 * n_orb
        assert ate_f < max(2.0 * ate_orb, 0.02)

    def test_dog_detector_tracks(self, seq):
        telem, ate = self._run(seq, detector="dog")
        assert bool(np.asarray(telem.pose_ok)[2:].all())
        assert ate < 0.05

    def test_dog_freak_combination(self, seq):
        """The full new column x row of the factory matrix."""
        telem, ate = self._run(seq, detector="dog", descriptor="freak")
        assert bool(np.asarray(telem.pose_ok)[2:].all())
        assert ate < 0.05
