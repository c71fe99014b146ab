"""Micro-benchmark + sanity check of the LK kernel schedule options (TPU)."""
import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "../.jax_cache"))

import time

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.ops.lk import build_ragged_pyramid_pair
from zenslam_tpu.ops.lk_pallas import ragged_level_sizes
from zenslam_tpu.ops.lk_pallas import lk_ragged_pallas

rng = np.random.default_rng(3)
seq = make_sequence(rng, n_frames=2, width=1024, height=1024, motion="arc",
                    speed=0.5, device_render=True)
p0l, _ = build_ragged_pyramid_pair(seq.left[0], seq.right[0], 3, dtype=jnp.bfloat16)
p1l, _ = build_ragged_pyramid_pair(seq.left[1], seq.right[1], 3, dtype=jnp.bfloat16)
tsz = ragged_level_sizes(1024, 1024, 4)
N = 512
xy = jnp.stack([
    jnp.asarray(rng.uniform(40, 984, N), jnp.float32),
    jnp.asarray(rng.uniform(40, 984, N), jnp.float32)], axis=-1)
valid = jnp.ones((N,), bool)


def run(tag, **kw):
    tr, ok, err = lk_ragged_pallas(p0l, p1l, xy, valid, radius=10,
                                   block=4, sizes=tsz, unroll=True, **kw)
    jax.block_until_ready(tr)
    t0 = time.perf_counter()
    for _ in range(20):
        tr, ok, err = lk_ragged_pallas(p0l, p1l, xy, valid, radius=10,
                                       block=4, sizes=tsz, unroll=True, **kw)
    jax.block_until_ready(tr)
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"{tag:34s} {dt:6.2f} ms/call  ok={int(jnp.sum(ok))}")
    return np.asarray(tr), np.asarray(ok)


tr_a, ok_a = run("uniform5 full-bwd (old default)", iters=5)
tr_b, ok_b = run("sched(5,3,3,3) bwd_levels=1", iters=(5, 3, 3, 3), bwd_levels=1)
both = ok_a & ok_b
d = np.linalg.norm(tr_a[both] - tr_b[both], axis=-1)
print(f"agree: {both.sum()}/{ok_a.sum()} vs {ok_b.sum()}; "
      f"pos delta p50={np.median(d):.4f} p99={np.percentile(d, 99):.4f} "
      f"max={d.max():.4f} px")
