"""Quick probe: slam_step steady-state at 1024x1024 on the real chip."""
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


def main():
    n_frames = 24
    t0 = time.perf_counter()
    seq = make_sequence(np.random.default_rng(11), n_frames=n_frames,
                        width=1024, height=1024, motion="arc", speed=0.5, device_render=True)
    print(f"render: {time.perf_counter()-t0:.1f}s")
    cfg = SlamConfig()
    left = [jax.device_put(f) for f in seq.left]
    right = [jax.device_put(f) for f in seq.right]
    state = init_state(cfg, seq.left[0].shape)
    t0 = time.perf_counter()
    for t in range(3):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)
    print(f"compile+warmup: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for t in range(3, n_frames):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)
    dt = time.perf_counter() - t0
    fps = (n_frames - 3) / dt
    print(f"1024x1024: {fps:.2f} fps ({dt/(n_frames-3)*1e3:.1f} ms/frame), "
          f"vs_baseline {fps*0.063:.3f}")
    print(f"tracked {int(tel.n_tracked)}, map {int(tel.map_size)}, "
          f"inliers {int(tel.n_pose_inliers)}")


if __name__ == "__main__":
    main()
