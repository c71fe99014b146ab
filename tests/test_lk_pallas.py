"""Parity tests: the Pallas LK kernel (interpret mode on CPU) must agree with
the scanned-XLA reference implementation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zenslam_tpu.ops.image import build_pyramid, remap
from zenslam_tpu.ops.lk import (
    pyramidal_lk,
    build_ragged_pyramid_pair,
    ragged_to_stacked,
)
from zenslam_tpu.ops.lk_pallas import lk_ragged_pallas, ragged_level_sizes
from zenslam_tpu.io.synthetic import smooth_texture


@pytest.fixture(scope="module")
def shifted_pair():
    tex = smooth_texture(np.random.default_rng(7), 256, 320)
    img0 = jnp.asarray(tex)
    H, W = tex.shape
    my, mx = np.meshgrid(np.arange(H, dtype=np.float32), np.arange(W, dtype=np.float32), indexing="ij")
    img1 = remap(img0, jnp.asarray(mx - 3.2), jnp.asarray(my + 2.1))
    return img0, img1


def _ragged(img0, img1, levels=3):
    r0, r1 = build_ragged_pyramid_pair(img0, img1, levels)
    tsz = ragged_level_sizes(img0.shape[0], img0.shape[1], levels + 1)
    return r0, r1, tsz


class TestPallasLK:
    def test_matches_jax_reference(self, shifted_pair):
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        rng = np.random.default_rng(1)
        xy = jnp.asarray(rng.uniform(40, 200, (24, 2)).astype(np.float32))
        valid = jnp.ones(24, bool)
        tr_p, ok_p, err_p = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=10, sizes=tsz,
            do_backward=False, interpret=True)
        tr_j, ok_j, _ = pyramidal_lk(build_pyramid(img0, 3), build_pyramid(img1, 3),
                                     xy, valid, radius=10, iters=10)
        op, oj = np.asarray(ok_p), np.asarray(ok_j)
        assert op.sum() >= 20
        both = op & oj
        np.testing.assert_allclose(np.asarray(tr_p)[both], np.asarray(tr_j)[both], atol=0.02)
        # true shift recovered
        fe = np.linalg.norm(np.asarray(tr_p - xy)[op] - [3.2, -2.1], axis=-1)
        assert np.median(fe) < 0.1

    def test_unrolled_matches_while(self, shifted_pair):
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        rng = np.random.default_rng(3)
        xy = jnp.asarray(rng.uniform(40, 200, (16, 2)).astype(np.float32))
        valid = jnp.ones(16, bool)
        tr_w, ok_w, _ = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=10, sizes=tsz, interpret=True)
        tr_u, ok_u, _ = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=5, sizes=tsz, unroll=True,
            interpret=True)
        both = np.asarray(ok_w) & np.asarray(ok_u)
        assert both.sum() >= 10
        np.testing.assert_allclose(np.asarray(tr_u)[both],
                                   np.asarray(tr_w)[both], atol=0.05)

    def test_bf16_storage_close_to_f32(self, shifted_pair):
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        b0 = tuple(p.astype(jnp.bfloat16) for p in r0)
        b1 = tuple(p.astype(jnp.bfloat16) for p in r1)
        rng = np.random.default_rng(4)
        xy = jnp.asarray(rng.uniform(40, 200, (8, 2)).astype(np.float32))
        valid = jnp.ones(8, bool)
        tr_f, ok_f, _ = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=5, sizes=tsz, unroll=True,
            interpret=True)
        tr_b, ok_b, _ = lk_ragged_pallas(
            b0, b1, xy, valid, radius=10, iters=5, sizes=tsz, unroll=True,
            interpret=True)
        both = np.asarray(ok_f) & np.asarray(ok_b)
        assert both.sum() >= 6
        np.testing.assert_allclose(np.asarray(tr_b)[both],
                                   np.asarray(tr_f)[both], atol=0.15)

    def test_invalid_points_passthrough(self, shifted_pair):
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        xy = jnp.array([[100.0, 100.0], [150.0, 120.0]])
        valid = jnp.array([True, False])
        tr, ok, err = lk_ragged_pallas(r0, r1, xy, valid, sizes=tsz,
                                       do_backward=False, interpret=True)
        assert not bool(ok[1])
        np.testing.assert_allclose(np.asarray(tr)[1], np.asarray(xy)[1])

    def test_fb_rejects_corruption(self, shifted_pair):
        img0, _ = shifted_pair
        img1 = np.array(np.asarray(img0))
        img1[:, 160:] = 0.5
        r0, r1, tsz = _ragged(img0, jnp.asarray(img1))
        rng = np.random.default_rng(2)
        xy = jnp.asarray(rng.uniform(40, 200, (16, 2)).astype(np.float32))
        valid = jnp.ones(16, bool)
        tr, ok, _ = lk_ragged_pallas(r0, r1, xy, valid, sizes=tsz, interpret=True)
        right = np.asarray(xy)[:, 0] > 180
        assert (~np.asarray(ok)[right]).mean() > 0.5

    def test_schedule_and_shallow_backward(self, shifted_pair):
        """The per-level Newton schedule + finest-level-only backward pass
        (the pipeline's production config) must agree with the uniform
        full-pyramid kernel on a well-textured scene, and the fb check must
        still reject corrupted regions."""
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        rng = np.random.default_rng(5)
        xy = jnp.asarray(rng.uniform(40, 200, (16, 2)).astype(np.float32))
        valid = jnp.ones(16, bool)
        tr_a, ok_a, _ = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=5, sizes=tsz, unroll=True,
            interpret=True)
        tr_b, ok_b, _ = lk_ragged_pallas(
            r0, r1, xy, valid, radius=10, iters=(5, 3, 3, 3), bwd_levels=1,
            sizes=tsz, unroll=True, interpret=True)
        oa, ob = np.asarray(ok_a), np.asarray(ok_b)
        both = oa & ob
        assert both.sum() >= 12
        np.testing.assert_allclose(np.asarray(tr_b)[both],
                                   np.asarray(tr_a)[both], atol=0.1)
        # shallow backward still rejects occlusion/corruption
        img1c = np.array(np.asarray(img0))
        img1c[:, 160:] = 0.5
        c0, c1, _ = _ragged(img0, jnp.asarray(img1c))
        _, okc, _ = lk_ragged_pallas(
            c0, c1, xy, valid, radius=10, iters=(5, 3, 3, 3), bwd_levels=1,
            sizes=tsz, unroll=True, interpret=True)
        right = np.asarray(xy)[:, 0] > 180
        if right.sum():
            assert (~np.asarray(okc)[right]).mean() > 0.5

    def test_initial_flow(self, shifted_pair):
        img0, img1 = shifted_pair
        r0, r1, tsz = _ragged(img0, img1)
        xy = jnp.array([[100.0, 100.0], [120.0, 80.0]])
        valid = jnp.ones(2, bool)
        init = xy + jnp.array([3.0, -2.0])
        tr, ok, _ = lk_ragged_pallas(r0, r1, xy, valid, init_pts=init,
                                     sizes=tsz, do_backward=False,
                                     interpret=True)
        fe = np.linalg.norm(np.asarray(tr - xy) - [3.2, -2.1], axis=-1)
        assert np.asarray(ok).all() and fe.max() < 0.1
