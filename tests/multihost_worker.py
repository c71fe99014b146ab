"""Worker process for the multi-host distributed-BA test.

Invoked as: python multihost_worker.py <process_id> <num_processes> <port>
Each process gets 2 virtual CPU devices; the BA landmark/observation shards
span the processes and the reduced-camera-system psum crosses the process
boundary over gloo — the CPU stand-in for ICI/DCN (SURVEY.md §4).
"""

import sys


def make_problem(n_shards: int):
    """Deterministic tiny stereo-free BA problem (same construction as
    __graft_entry__.dryrun_multichip)."""
    import numpy as np
    import jax.numpy as jnp
    from zenslam_tpu.backend.ba import make_ba_problem

    rng = np.random.default_rng(0)
    K, M = 4, n_shards * 4
    fx = fy = 300.0
    cx = cy = 128.0
    X = np.stack([rng.uniform(-2, 2, M), rng.uniform(-2, 2, M),
                  rng.uniform(4, 8, M)], -1).astype(np.float32)
    obs_kf, obs_lm, obs_uv, t_gt = [], [], [], []
    for k in range(K):
        t = np.array([0.2 * k, 0, 0], np.float32)
        t_gt.append(t)
        xc = X + t
        for m in range(M):
            obs_kf.append(k)
            obs_lm.append(m)
            obs_uv.append([fx * xc[m, 0] / xc[m, 2] + cx,
                           fy * xc[m, 1] / xc[m, 2] + cy])
    O = len(obs_kf)
    p = make_ba_problem(K, M, O, fx, fy, cx, cy)
    return p._replace(
        t=jnp.asarray(np.stack(t_gt)) + 0.01,
        kf_valid=jnp.ones(K, bool),
        kf_fixed=jnp.zeros(K, bool).at[0].set(True).at[1].set(True),
        xyz=jnp.asarray(X) + 0.02,
        lm_valid=jnp.ones(M, bool),
        obs_kf=jnp.asarray(obs_kf, jnp.int32),
        obs_lm=jnp.asarray(obs_lm, jnp.int32),
        obs_uv=jnp.asarray(obs_uv, jnp.float32),
        obs_valid=jnp.ones(O, bool),
    )


def main():
    pid, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    from zenslam_tpu.parallel.multihost import (
        init_multihost, global_ba_mesh, distribute_ba_problem,
        gather_landmarks)

    init_multihost(f"localhost:{port}", n_proc, pid, platform="cpu",
                   local_device_count=2)
    import jax
    import numpy as np
    from zenslam_tpu.parallel import shard_ba_problem, dist_bundle_adjust

    n_dev = len(jax.devices())
    assert n_dev == 2 * n_proc, (n_dev, n_proc)
    assert jax.process_count() == n_proc
    mesh = global_ba_mesh()

    p = make_problem(n_dev)
    ps = shard_ba_problem(p, n_dev)
    pg = distribute_ba_problem(ps, mesh)
    res = dist_bundle_adjust(pg, mesh, iterations=5)
    cb = float(res["cost_before"])
    ca = float(res["cost_after"])
    xyz = gather_landmarks(res["xyz"])
    t = np.asarray(res["t"])
    print(f"proc {pid}: cost {cb:.6f} -> {ca:.9f} "
          f"t_sum {float(np.abs(t).sum()):.6f} "
          f"xyz_sum {float(np.abs(xyz).sum()):.4f}", flush=True)
    assert ca < cb * 1e-3, (cb, ca)
    assert np.isfinite(xyz).all()
    print(f"MULTIHOST_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
