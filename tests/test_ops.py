"""Tests for image ops, FAST/ORB detection, Hamming matching, and pyramidal LK
(SURVEY.md §7 phases 2-3 test gates)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.ops import (
    gaussian_blur,
    build_pyramid,
    bilinear_sample,
    remap,
    clahe,
    scharr_gradients,
    fast_score,
    detect_grid_keypoints,
    orb_descriptors,
    hamming_matrix,
    match_descriptors,
    unpack_bits,
    pyramidal_lk,
)
from zenslam_tpu.ops.lk import lk_forward_backward
from zenslam_tpu.io.synthetic import smooth_texture


@pytest.fixture(scope="module")
def texture():
    return smooth_texture(np.random.default_rng(7), 256, 320)


class TestImageOps:
    def test_pyramid_shapes(self, texture):
        pyr = build_pyramid(jnp.asarray(texture), levels=3)
        assert len(pyr) == 4
        assert pyr[0].shape == (256, 320)
        assert pyr[1].shape == (128, 160)
        assert pyr[3].shape == (32, 40)

    def test_pyramid_is_lowpass(self, texture):
        pyr = build_pyramid(jnp.asarray(texture), levels=2)
        # variance of Laplacian decreases with level (smoother)
        def roughness(im):
            gx, gy = scharr_gradients(im)
            return float(jnp.mean(gx * gx + gy * gy))
        assert roughness(pyr[1]) < roughness(pyr[0]) * 1.5  # decimation keeps but not boosts

    def test_bilinear_sample_exact_on_grid(self, texture):
        img = jnp.asarray(texture)
        pts = jnp.array([[3.0, 5.0], [100.0, 200.0], [319.0, 255.0]])
        vals = bilinear_sample(img, pts)
        expected = np.array([texture[5, 3], texture[200, 100], texture[255, 319]])
        np.testing.assert_allclose(np.asarray(vals), expected, atol=1e-6)

    def test_bilinear_sample_interpolates(self, texture):
        img = jnp.asarray(texture)
        v = float(bilinear_sample(img, jnp.array([[10.5, 20.0]]))[0])
        expected = 0.5 * (texture[20, 10] + texture[20, 11])
        assert abs(v - expected) < 1e-6

    def test_bilinear_out_of_bounds_pads(self, texture):
        img = jnp.asarray(texture)
        v = bilinear_sample(img, jnp.array([[-5.0, 10.0], [1e6, 1e6]]))
        np.testing.assert_allclose(np.asarray(v), 0.0, atol=1e-6)

    def test_remap_identity(self, texture):
        img = jnp.asarray(texture)
        H, W = img.shape
        my, mx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        out = remap(img, mx, my)
        np.testing.assert_allclose(np.asarray(out), texture, atol=1e-6)

    def test_remap_shift(self, texture):
        img = jnp.asarray(texture)
        H, W = img.shape
        my, mx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij")
        out = remap(img, mx + 3.0, my)  # sample 3 px to the right
        np.testing.assert_allclose(np.asarray(out[:, : W - 3]), texture[:, 3:], atol=1e-6)

    def test_clahe_improves_contrast_and_range(self, texture):
        low_contrast = jnp.asarray(texture * 0.2 + 0.4)
        out = clahe(low_contrast, clip_limit=4.0, grid=8)
        assert out.shape == low_contrast.shape
        assert float(jnp.std(out)) > float(jnp.std(low_contrast)) * 1.5
        assert 0.0 <= float(jnp.min(out)) and float(jnp.max(out)) <= 1.0

    def test_scharr_on_ramp(self):
        ramp = jnp.tile(jnp.arange(32, dtype=jnp.float32)[None, :], (32, 1)) * 0.1
        gx, gy = scharr_gradients(ramp)
        np.testing.assert_allclose(np.asarray(gx[8:24, 8:24]), 0.1, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gy[8:24, 8:24]), 0.0, atol=1e-5)


class TestFast:
    def test_detects_synthetic_corners(self):
        img = np.zeros((128, 128), np.float32)
        img[40:, 40:] = 1.0  # one strong corner at (40, 40)
        s = np.asarray(fast_score(jnp.asarray(img), threshold=0.2))
        cy, cx = np.unravel_index(np.argmax(s), s.shape)
        assert abs(cy - 40) <= 3 and abs(cx - 40) <= 3

    def test_flat_image_no_corners(self):
        img = jnp.full((64, 64), 0.5, jnp.float32)
        assert float(jnp.max(fast_score(img))) == 0.0

    def test_grid_detection_fixed_capacity(self, texture):
        img = jnp.asarray(texture)
        xy, score, valid = detect_grid_keypoints(
            img, jnp.zeros((1, 2)), jnp.zeros(1, bool), threshold=0.02,
            cell_size=16, max_keypoints=256,
        )
        assert xy.shape == (256, 2) and valid.shape == (256,)
        n = int(valid.sum())
        assert n > 20  # textured image yields plenty of corners
        # all valid keypoints inside the border
        v = np.asarray(valid)
        p = np.asarray(xy)[v]
        assert (p[:, 0] >= 16).all() and (p[:, 1] >= 16).all()
        assert (p[:, 0] < 320 - 16).all() and (p[:, 1] < 256 - 16).all()
        # one keypoint per cell at most
        cells = {(int(x // 16), int(y // 16)) for x, y in p}
        assert len(cells) == len(p)

    def test_existing_keypoints_suppress_cells(self, texture):
        img = jnp.asarray(texture)
        xy, score, valid = detect_grid_keypoints(
            img, jnp.zeros((1, 2)), jnp.zeros(1, bool), threshold=0.02, max_keypoints=256
        )
        # feed the detections back as existing: their cells must go quiet
        xy2, _, valid2 = detect_grid_keypoints(
            img, xy, valid, threshold=0.02, max_keypoints=256
        )
        p1 = {(int(x // 16), int(y // 16)) for x, y in np.asarray(xy)[np.asarray(valid)]}
        p2 = {(int(x // 16), int(y // 16)) for x, y in np.asarray(xy2)[np.asarray(valid2)]}
        assert not (p1 & p2)


class TestOrb:
    def test_descriptor_stability_under_shift(self, texture):
        """Descriptors at the same physical location in a shifted image match."""
        img = jnp.asarray(texture)
        shifted = jnp.asarray(np.roll(texture, 5, axis=1))
        xy, _, valid = detect_grid_keypoints(img, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                             threshold=0.02, max_keypoints=128)
        d1, _ = orb_descriptors(img, xy, valid)
        xy_sh = xy + jnp.array([5.0, 0.0])
        d2, _ = orb_descriptors(shifted, xy_sh, valid)
        D = np.asarray(hamming_matrix(d1, d2))
        v = np.asarray(valid)
        diag = np.diag(D)[v[: len(np.diag(D))]]
        # self-distance far below random (128 expected for random 256-bit)
        assert np.median(diag) < 40

    def test_invalid_rows_zero(self, texture):
        img = jnp.asarray(texture)
        xy = jnp.array([[50.0, 50.0], [60.0, 60.0]])
        valid = jnp.array([True, False])
        d, _ = orb_descriptors(img, xy, valid)
        assert np.asarray(d)[1].sum() == 0


class TestMatcher:
    def test_hamming_matches_numpy_popcount(self, rng):
        a = rng.integers(0, 2**32, (16, 8), dtype=np.uint32)
        b = rng.integers(0, 2**32, (24, 8), dtype=np.uint32)
        D = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        # numpy reference popcount
        au = np.unpackbits(a.view(np.uint8), axis=-1)
        bu = np.unpackbits(b.view(np.uint8), axis=-1)
        ref = (au[:, None, :] != bu[None, :, :]).sum(-1)
        np.testing.assert_array_equal(D, ref)

    def test_unpack_bits_roundtrip(self, rng):
        a = rng.integers(0, 2**32, (4, 8), dtype=np.uint32)
        bits = np.asarray(unpack_bits(jnp.asarray(a)))
        assert bits.shape == (4, 256)
        assert bits.sum() == np.unpackbits(a.view(np.uint8)).sum()

    def test_cross_check_and_identity(self, rng):
        desc = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
        valid = np.ones(32, bool)
        perm = rng.permutation(32)
        idx, dist, ok = match_descriptors(
            jnp.asarray(desc), jnp.asarray(desc[perm]),
            jnp.asarray(valid), jnp.asarray(valid),
        )
        # every descriptor should find its permuted twin at distance 0
        assert np.asarray(ok).all()
        assert (np.asarray(dist) == 0).all()
        np.testing.assert_array_equal(perm[np.asarray(idx)], np.arange(32))

    def test_ratio_test_rejects_ambiguous(self, rng):
        # two identical descriptors in B -> ambiguous -> ratio test kills it
        d = rng.integers(0, 2**32, (1, 8), dtype=np.uint32)
        b = np.concatenate([d, d], axis=0)
        idx, dist, ok = match_descriptors(
            jnp.asarray(d), jnp.asarray(b),
            jnp.ones(1, bool), jnp.ones(2, bool),
            use_ratio=True, cross_check=False,
        )
        assert not bool(ok[0])

    def test_invalid_masked_out(self, rng):
        desc = rng.integers(0, 2**32, (8, 8), dtype=np.uint32)
        valid_b = np.zeros(8, bool)
        idx, dist, ok = match_descriptors(
            jnp.asarray(desc), jnp.asarray(desc),
            jnp.ones(8, bool), jnp.asarray(valid_b),
        )
        assert not np.asarray(ok).any()
        assert (np.asarray(idx) == -1).all()


class TestLK:
    def test_tracks_pure_translation(self, texture):
        img0 = jnp.asarray(texture)
        shift = np.array([3.2, -2.1], np.float32)
        H, W = texture.shape
        my, mx = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
        img1 = remap(img0, jnp.asarray(mx - shift[0]), jnp.asarray(my - shift[1]))
        pyr0 = build_pyramid(img0, levels=3)
        pyr1 = build_pyramid(img1, levels=3)
        xy, _, valid = detect_grid_keypoints(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                             threshold=0.02, max_keypoints=128, border=24)
        # raw single-direction LK: bulk accuracy (border points may diverge to
        # a wrong minimum — that is what the fb-check below is for)
        tracked, ok, err = pyramidal_lk(pyr0, pyr1, xy, valid, radius=10, iters=12)
        okm = np.asarray(ok)
        assert okm.sum() > 0.7 * np.asarray(valid).sum()
        flow = np.asarray(tracked - xy)[okm]
        np.testing.assert_allclose(np.median(flow, axis=0), shift, atol=0.25)
        # fb-checked tracking: surviving flows must ALL be accurate
        tracked_fb, ok_fb, _ = lk_forward_backward(pyr0, pyr1, xy, valid, radius=10, iters=12)
        okf = np.asarray(ok_fb)
        assert okf.sum() > 0.6 * np.asarray(valid).sum()
        flow_fb = np.asarray(tracked_fb - xy)[okf]
        np.testing.assert_allclose(flow_fb.mean(0), shift, atol=0.25)
        assert np.linalg.norm(flow_fb - shift, axis=-1).max() < 1.0

    def test_forward_backward_rejects_occlusion(self, texture):
        img0 = jnp.asarray(texture)
        # corrupt half of the second image: those tracks must fail fb-check
        img1 = np.array(texture)
        img1[:, 160:] = 0.5
        img1 = jnp.asarray(img1)
        pyr0 = build_pyramid(img0, levels=3)
        pyr1 = build_pyramid(img1, levels=3)
        xy, _, valid = detect_grid_keypoints(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                             threshold=0.02, max_keypoints=128, border=24)
        tracked, ok, _ = lk_forward_backward(pyr0, pyr1, xy, valid, radius=10, iters=12)
        v = np.asarray(valid)
        okm = np.asarray(ok)
        right_half = np.asarray(xy)[:, 0] > 180
        # tracks into the destroyed half should mostly die
        died = (~okm) & v & right_half
        assert died.sum() > 0.6 * (v & right_half).sum()

    def test_initial_flow_helps_large_motion(self, texture):
        img0 = jnp.asarray(texture)
        shift = np.array([22.0, 0.0], np.float32)
        H, W = texture.shape
        my, mx = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
        img1 = remap(img0, jnp.asarray(mx - shift[0]), jnp.asarray(my - shift[1]))
        pyr0 = build_pyramid(img0, levels=3)
        pyr1 = build_pyramid(img1, levels=3)
        xy, _, valid = detect_grid_keypoints(img0, jnp.zeros((1, 2)), jnp.zeros(1, bool),
                                             threshold=0.02, max_keypoints=64, border=32)
        init = xy + jnp.asarray(shift) + 1.0  # near-correct prediction
        tracked, ok, _ = pyramidal_lk(pyr0, pyr1, xy, valid, init_pts=init,
                                      radius=10, iters=12, use_initial_flow=True)
        okm = np.asarray(ok)
        flow = np.asarray(tracked - xy)[okm]
        assert okm.sum() > 0.5 * np.asarray(valid).sum()
        # median: a couple of border points may diverge (fb-check culls them
        # in the pipeline); the bulk must land on the true shift
        np.testing.assert_allclose(np.median(flow, axis=0), shift, atol=0.5)
        frac_good = (np.linalg.norm(flow - shift, axis=-1) < 1.0).mean()
        assert frac_good > 0.8


class TestSubpixelSelect:
    """3x3 quadratic peak interpolation at grid-select time (SlamConfig
    subpixel_detect ≡ cv::cornerSubPix, keypoint_detector_parallel.cpp:160-170).

    Measured end-to-end effect (v5e, 100-frame 1024² arc sequence, r5):
    ATE 2.50 mm → 2.42 mm with no measurable frame-rate cost — the offsets
    feed stereo transfer + triangulation, trimming quantization depth noise.
    Default ON (cfg.subpixel_detect)."""

    def _gauss_plane(self, peaks, shape=(96, 96), sigma=1.6):
        yy, xx = np.mgrid[0:shape[0], 0:shape[1]].astype(np.float64)
        s = np.zeros(shape, np.float64)
        for px, py in peaks:
            s += np.exp(-((xx - px) ** 2 + (yy - py) ** 2) / (2 * sigma**2))
        return s.astype(np.float32)

    def test_recovers_subpixel_peaks(self):
        from zenslam_tpu.ops.fast import select_grid_keypoints
        rng = np.random.default_rng(3)
        peaks = [(24.0 + rng.uniform(-0.45, 0.45), 24.0 + rng.uniform(-0.45, 0.45)),
                 (56.3, 40.7), (40.25, 71.6)]
        score = jnp.asarray(self._gauss_plane(peaks))
        no_existing = (jnp.zeros((1, 2)), jnp.zeros(1, bool))
        xy_i, _, v_i = select_grid_keypoints(score, *no_existing, border=8,
                                             max_keypoints=16, subpixel=False)
        xy_s, _, v_s = select_grid_keypoints(score, *no_existing, border=8,
                                             max_keypoints=16, subpixel=True)
        for (px, py) in peaks:
            tgt = np.array([px, py])
            ei = min(np.linalg.norm(np.asarray(xy_i)[np.asarray(v_i)] - tgt, axis=-1))
            es = min(np.linalg.norm(np.asarray(xy_s)[np.asarray(v_s)] - tgt, axis=-1))
            assert es < 0.12, (tgt, es)       # parabola on a Gaussian: <0.1 px
            assert es <= ei + 1e-6            # never worse than integer
        # offsets bounded by half a pixel
        d = np.abs(np.asarray(xy_s)[np.asarray(v_s)] - np.asarray(xy_i)[np.asarray(v_i)])
        assert (d <= 0.5 + 1e-6).all()

    def test_symmetric_peak_keeps_integer(self):
        from zenslam_tpu.ops.fast import select_grid_keypoints
        score = np.zeros((64, 64), np.float32)
        score[31, 31] = 1.0  # isolated symmetric peak: offset exactly 0
        xy, _, v = select_grid_keypoints(jnp.asarray(score), jnp.zeros((1, 2)),
                                         jnp.zeros(1, bool), border=8,
                                         max_keypoints=4, subpixel=True)
        p = np.asarray(xy)[np.asarray(v)][0]
        assert p[0] == 31.0 and p[1] == 31.0

