"""Distributed-BA iteration time vs device count (virtual CPU mesh).

Produces the measured table for SCALING.md: per-LM-iteration wall time of
`dist_bundle_adjust` at 1/2/4/8 devices on a fixed K=32, M=16384, O=131072
problem. Virtual CPU devices share one host's cores, so this harness
validates the DECOMPOSITION (per-shard work shrinks with devices, one psum
per iteration) rather than real ICI bandwidth — on a pod slice the same
program's collective rides ICI.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python scaling_bench.py
(or let the script set it before first backend use).
"""

import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))

import os
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from zenslam_tpu.backend.ba import make_ba_problem
from zenslam_tpu.parallel import shard_ba_problem, dist_bundle_adjust, make_ba_mesh


def make_problem(K=32, M=16384, obs_per_lm=8, seed=0):
    rng = np.random.default_rng(seed)
    fx = fy = 400.0
    cx = cy = 256.0
    X = np.stack([rng.uniform(-4, 4, M), rng.uniform(-3, 3, M),
                  rng.uniform(4, 12, M)], -1).astype(np.float32)
    t_gt = np.stack([np.array([0.1 * k, 0.02 * (k % 3), 0], np.float32)
                     for k in range(K)])
    obs_kf = rng.integers(0, K, (M, obs_per_lm)).astype(np.int32)
    O = M * obs_per_lm
    kf = obs_kf.reshape(-1)
    lm = np.repeat(np.arange(M, dtype=np.int32), obs_per_lm)
    xc = X[lm] + t_gt[kf]
    uv = np.stack([fx * xc[:, 0] / xc[:, 2] + cx,
                   fy * xc[:, 1] / xc[:, 2] + cy], -1).astype(np.float32)
    uv += rng.normal(0, 0.3, uv.shape).astype(np.float32)
    p = make_ba_problem(K, M, O, fx, fy, cx, cy)
    return p._replace(
        t=jnp.asarray(t_gt + rng.normal(0, 0.01, t_gt.shape).astype(np.float32)),
        kf_valid=jnp.ones(K, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True).at[1].set(True),
        xyz=jnp.asarray(X + rng.normal(0, 0.02, X.shape).astype(np.float32)),
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(kf), obs_lm=jnp.asarray(lm),
        obs_uv=jnp.asarray(uv), obs_valid=jnp.ones(O, bool),
    )


def main():
    iters = 6
    p = make_problem()
    print(f"problem: K=32 M={p.xyz.shape[0]} O={p.obs_kf.shape[0]}")
    rows = []
    for n in (1, 2, 4, 8):
        mesh = make_ba_mesh(n)
        ps = shard_ba_problem(p, n)
        res = dist_bundle_adjust(ps, mesh, iterations=iters)  # compile+run
        jax.block_until_ready(res["t"])
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            res = dist_bundle_adjust(ps, mesh, iterations=iters)
            jax.block_until_ready(res["t"])
        dt = (time.perf_counter() - t0) / reps / iters * 1e3
        rows.append((n, dt, float(res["cost_before"]), float(res["cost_after"])))
        print(f"devices={n}: {dt:8.2f} ms/iteration  cost "
              f"{rows[-1][2]:.1f} -> {rows[-1][3]:.4f}")
    print("\n| devices | ms/iteration | speedup |")
    print("|---|---|---|")
    for n, dt, _, _ in rows:
        print(f"| {n} | {dt:.2f} | {rows[0][1] / dt:.2f}x |")


if __name__ == "__main__":
    main()
