"""Parity tests: the Pallas ORB tile-sampler kernel (interpret mode on CPU)
against the XLA gather implementation it replaces on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.io.synthetic import smooth_texture
from zenslam_tpu.ops.image import gaussian_blur
from zenslam_tpu.ops.orb import orb_descriptors
from zenslam_tpu.ops.orb_pallas import orb_descriptors_pallas, orb_pallas


def _hamming(a, b):
    return np.array([
        bin(int(x ^ y)).count("1") for ra, rb in zip(a, b)
        for x, y in zip(ra, rb)
    ]).reshape(a.shape[0], -1).sum(1)


class TestOrbPallas:
    def test_close_to_xla_path(self):
        rng = np.random.default_rng(7)
        img = jnp.asarray(smooth_texture(rng, 256, 384))
        N = 48
        xy = jnp.stack([
            jnp.asarray(rng.uniform(20, 360, N), jnp.float32),
            jnp.asarray(rng.uniform(20, 230, N), jnp.float32)], -1)
        valid = jnp.ones((N,), bool)
        p_ref, th_ref = orb_descriptors(img, xy, valid)
        p_pal, th_pal = orb_descriptors_pallas(img, xy, valid, interpret=True)
        ham = _hamming(np.asarray(p_ref), np.asarray(p_pal))
        # bf16 sampling flips only near-equal (noise-dominated) pairs; the
        # match gate is 64 bits, so a ~3% mean flip rate is immaterial
        assert ham.mean() < 16
        assert np.median(ham) < 12
        dth = np.abs(np.angle(np.exp(1j * (np.asarray(th_ref) - np.asarray(th_pal)))))
        assert np.median(dth) < 0.05

    def test_rotation_covariance(self):
        """Rotating the image content must leave descriptors ~invariant
        (steering works) — same property the XLA path guarantees."""
        rng = np.random.default_rng(8)
        from zenslam_tpu.ops.image import remap

        img = jnp.asarray(smooth_texture(rng, 256, 256))
        H = W = 256
        cx = cy = 127.5
        ang = 0.5
        my, mx = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        ca, sa = np.cos(ang), np.sin(ang)
        rx = ca * (mx - cx) - sa * (my - cy) + cx
        ry = sa * (mx - cx) + ca * (my - cy) + cy
        rot = remap(img, jnp.asarray(rx), jnp.asarray(ry))
        pts = np.stack([rng.uniform(90, 165, 24), rng.uniform(90, 165, 24)], -1)
        # the keypoint moves with the INVERSE warp under remap semantics
        qx = ca * (pts[:, 0] - cx) + sa * (pts[:, 1] - cy) + cx
        qy = -sa * (pts[:, 0] - cx) + ca * (pts[:, 1] - cy) + cy
        v = jnp.ones((24,), bool)
        p0, _ = orb_descriptors_pallas(
            img, jnp.asarray(pts, jnp.float32), v, interpret=True)
        p1, _ = orb_descriptors_pallas(
            rot, jnp.asarray(np.stack([qx, qy], -1), jnp.float32), v,
            interpret=True)
        ham = _hamming(np.asarray(p0), np.asarray(p1))
        # the XLA path measures ~55 median on this scene (resampling +
        # orientation noise on smooth blobs; random = 128): the kernel must
        # steer at least as well
        x0, _ = orb_descriptors(img, jnp.asarray(pts, jnp.float32), v)
        x1, _ = orb_descriptors(
            rot, jnp.asarray(np.stack([qx, qy], -1), jnp.float32), v)
        ham_xla = _hamming(np.asarray(x0), np.asarray(x1))
        assert np.median(ham) <= np.median(ham_xla) + 8
        assert np.median(ham) < 90  # far below the 128 random-bit distance

    @pytest.mark.tpu
    def test_compiled_tpu_matches_interpret(self):
        """Mosaic-compiled kernel vs interpret mode on a border-heavy keypoint
        set (ADVICE r3: bf16 one-hot MXU matmul, SMEM scalar I/O, and tile
        clipping at image borders are asserted nowhere else). Skips unless a
        real TPU is visible; `scripts/tpu_kernel_parity.py` runs it on the
        chip outside the CPU-forced suite."""
        try:
            tpu = jax.devices("tpu")
        except RuntimeError:
            tpu = []
        if not tpu:
            pytest.skip("no TPU device in this process (suite forces CPU)")
        rng = np.random.default_rng(11)
        img = jnp.asarray(smooth_texture(rng, 256, 320))
        H, W = 256, 320
        # border-heavy: half the points hug the edges of the valid margin
        N = 64
        inner = np.stack([rng.uniform(40, W - 40, N // 2),
                          rng.uniform(40, H - 40, N // 2)], -1)
        edge = np.stack([
            np.concatenate([rng.uniform(17, 22, N // 4),
                            rng.uniform(W - 22, W - 17, N // 4)]),
            rng.uniform(17, H - 17, N // 2)], -1)
        xy = jnp.asarray(np.concatenate([inner, edge]), jnp.float32)
        valid = jnp.ones((N,), bool)
        with jax.default_device(tpu[0]):
            p_tpu, th_tpu = jax.tree.map(
                np.asarray, orb_descriptors_pallas(img, xy, valid))
        # interpret-mode reference on the HOST cpu device (interpret lowers
        # to a huge dense HLO program — compiling that through the remote
        # axon tunnel stalls for minutes)
        with jax.default_device(jax.devices("cpu")[0]):
            p_int, th_int = orb_descriptors_pallas(
                jnp.asarray(np.asarray(img)), xy, valid, interpret=True)
        ham = _hamming(np.asarray(p_tpu), np.asarray(p_int))
        # compiled bf16 sampling may flip noise-dominated pairs only
        assert ham.mean() < 16, ham.mean()
        assert np.median(ham) < 12
        dth = np.abs(np.angle(np.exp(1j * (np.asarray(th_tpu) - np.asarray(th_int)))))
        assert np.median(dth) < 0.05

    def test_invalid_rows_zero(self):
        rng = np.random.default_rng(9)
        img = jnp.asarray(smooth_texture(rng, 128, 256))
        xy = jnp.array([[60.0, 60.0], [80.0, 70.0]])
        valid = jnp.array([True, False])
        sm = gaussian_blur(img, sigma=2.0, radius=4)
        bits, c, s = orb_pallas(sm, xy, valid, interpret=True)
        assert int(jnp.sum(bits[1])) == 0
        assert int(jnp.sum(bits[0])) > 0


class TestNeedsPath:
    """The selective-describe path (needs mask + compaction + whole-block
    skip): computed rows must be IDENTICAL to the full computation; skipped
    rows are undefined and the caller merges them away."""

    def test_needs_rows_match_full(self):
        rng = np.random.default_rng(13)
        img = jnp.asarray(smooth_texture(rng, 192, 256))
        n = 24
        xy = jnp.stack([jnp.asarray(rng.uniform(40, 216, n), jnp.float32),
                        jnp.asarray(rng.uniform(40, 152, n), jnp.float32)],
                       axis=-1)
        valid = jnp.ones(n, bool)
        needs = jnp.asarray(rng.random(n) < 0.3)
        full, th_full = orb_descriptors_pallas(img, xy, valid,
                                               interpret=True)
        sel, th_sel = orb_descriptors_pallas(img, xy, valid, needs=needs,
                                             interpret=True)
        m = np.asarray(needs)
        np.testing.assert_array_equal(np.asarray(sel)[m],
                                      np.asarray(full)[m])
        np.testing.assert_allclose(np.asarray(th_sel)[m],
                                   np.asarray(th_full)[m], atol=1e-6)
