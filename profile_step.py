"""Per-stage timing of the slam_step hot path on the real chip."""
import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))

import time

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig, init_state
from zenslam_tpu.pipeline.step import slam_step


def timeit(fn, *args, n=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{label:40s} {dt*1e3:8.2f} ms")
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=384)
    args = ap.parse_args()
    cfg = SlamConfig()
    seq = make_sequence(np.random.default_rng(11), n_frames=8, width=args.width,
                        height=args.height, motion="arc", speed=0.5)
    left = [jax.device_put(f) for f in seq.left]
    right = [jax.device_put(f) for f in seq.right]
    state = init_state(cfg, seq.left[0].shape)
    for t in range(3):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)

    # snapshot copies (slam_step donates its state arg)
    s0 = jax.tree.map(lambda x: jnp.array(x), state)
    state = jax.tree.map(lambda x: jnp.array(x), state)
    def full(s):
        ns, tel = slam_step(cfg, seq.rig, s, left[4], right[4])
        return tel.t_cw
    # donation: slam_step donates state; call on a copy each time
    t0 = time.perf_counter()
    n = 20
    s = jax.tree.map(lambda x: jnp.array(x), s0)
    for _ in range(n):
        s, tel = slam_step(cfg, seq.rig, s, left[4], right[4])
    jax.block_until_ready(s.t_cw)
    print(f"{'full slam_step':40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")

    # null dispatch cost over the tunnel
    f_null = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 8))
    timeit(f_null, x, label="null jit dispatch")

    # components
    from zenslam_tpu.ops.lk import build_ragged_pyramid_pair
    from zenslam_tpu.ops.lk_pallas import lk_ragged_pallas, ragged_level_sizes
    from zenslam_tpu.ops.fast import detect_grid_keypoints
    from zenslam_tpu.ops.orb import orb_descriptors
    from zenslam_tpu.ops.match import match_descriptors
    from zenslam_tpu.estimation.cascade import estimate_pose_cascade
    from zenslam_tpu.estimation.pnp import solve_pnp_ransac
    from zenslam_tpu.estimation.rigid import solve_rigid_ransac
    from zenslam_tpu.pipeline.state import pyramid_dtype

    img = left[4]
    pyr_fn = jax.jit(lambda a, b: build_ragged_pyramid_pair(
        a, b, cfg.pyramid_levels, dtype=pyramid_dtype(cfg)))
    pyr, pyr2 = timeit(pyr_fn, img, right[4], label="build_ragged_pyramid_pair")
    tsz = ragged_level_sizes(img.shape[0], img.shape[1], cfg.pyramid_levels + 1)

    feats = s0.features
    lk_fn = jax.jit(lambda p, v: lk_ragged_pallas(
        pyr, pyr2, p, v, radius=cfg.klt_radius, iters=cfg.klt_iters,
        fb_threshold=cfg.fb_threshold, block=4, sizes=tsz, unroll=True))
    timeit(lk_fn, feats.xy, feats.valid, label="lk_ragged_pallas fused fb")

    det_fn = jax.jit(lambda im, xy, v: detect_grid_keypoints(
        im, xy, v, threshold=cfg.fast_threshold, cell_size=cfg.cell_size,
        max_keypoints=cfg.max_keypoints, border=cfg.detect_border))
    timeit(det_fn, img, feats.xy, feats.valid, label="detect_grid_keypoints")

    orb_fn = jax.jit(lambda im, xy, v: orb_descriptors(im, xy, v))
    timeit(orb_fn, img, feats.xy, feats.valid, label="orb_descriptors")

    lmap = s0.lmap
    match_fn = jax.jit(lambda a, b, va, vb: match_descriptors(a, b, va, vb,
                       max_distance=64, cross_check=True))
    timeit(match_fn, feats.desc, lmap.desc, feats.valid, lmap.valid,
           label="match_descriptors (512x8192)")

    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (512, 3)) + jnp.array([0., 0., 5.])
    uv = jax.random.uniform(key, (512, 2)) * 300
    vmask = jnp.ones(512, bool)
    pnp_fn = jax.jit(lambda k: solve_pnp_ransac(k, seq.rig.left.K, X, uv, vmask,
                                                threshold=3.0, iters=cfg.pnp_iters))
    timeit(pnp_fn, key, label="solve_pnp_ransac (128 it)")

    rig_fn = jax.jit(lambda k: solve_rigid_ransac(k, X, X, vmask,
                                                  threshold=0.05, iters=cfg.rigid_iters))
    timeit(rig_fn, key, label="solve_rigid_ransac (128 it)")

    casc_fn = jax.jit(lambda k: estimate_pose_cascade(
        k, seq.rig, X, uv, vmask, X, uv, vmask, X, X, vmask,
        jnp.eye(3), jnp.zeros(3),
        pnp_iters=cfg.pnp_iters, rigid_iters=cfg.rigid_iters))
    timeit(casc_fn, key, label="estimate_pose_cascade")


if __name__ == "__main__":
    main()
