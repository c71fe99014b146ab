"""Offline-chunk worker process.

Invoked as:  python -m zenslam_tpu.parallel.offline_worker in.npz out.npz

One process per chunk (≡ one host per chunk in a pod deployment): loads the
chunk arrays + SlamConfig from ``in.npz``, optionally pins itself to a CPU
subset (the single-machine stand-in for separate hosts — without pinning
all workers fight over the same cores and "parallel" measures nothing),
runs the full front-end, and writes the chunk result arrays for
`offline.stitch_chunks`.
"""

from __future__ import annotations

import json
import os
import sys


def main(in_path: str, out_path: str) -> int:
    import numpy as np

    blob = np.load(in_path, allow_pickle=False)
    meta = json.loads(str(blob["meta"]))
    cpus = meta.get("cpus")
    if cpus:
        os.sched_setaffinity(0, cpus)

    import jax

    if meta.get("platform"):
        jax.config.update("jax_platforms", meta["platform"])
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if cache_dir:
        # explicit config: the env var alone is not honored on all backends
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from zenslam_tpu.geometry.camera import PinholeCamera, StereoRig
    from zenslam_tpu.pipeline.runner import run_sequence
    from zenslam_tpu.pipeline.state import SlamConfig

    cfg = SlamConfig(**meta["cfg"])

    def cam(p):
        return PinholeCamera(
            fx=jnp.float32(blob[p + "fx"]), fy=jnp.float32(blob[p + "fy"]),
            cx=jnp.float32(blob[p + "cx"]), cy=jnp.float32(blob[p + "cy"]),
            dist=jnp.asarray(blob[p + "dist"]),
            width=int(blob[p + "w"]), height=int(blob[p + "h"]))

    rig = StereoRig(
        left=cam("l_"), right=cam("r_"),
        R_rl=jnp.asarray(blob["R_rl"]), t_rl=jnp.asarray(blob["t_rl"]),
        R_ci=jnp.asarray(blob["R_ci"]), t_ci=jnp.asarray(blob["t_ci"]))

    imu = None
    if "gyro" in blob:
        imu = (blob["gyro"], blob["accel"], blob["imu_dts"], blob["imu_mask"])

    st, tel = run_sequence(cfg, rig, blob["left"], blob["right"], imu=imu)
    lm = st.lmap
    np.savez(out_path,
             R_cw=np.asarray(tel.R_cw), t_cw=np.asarray(tel.t_cw),
             map_xyz=np.asarray(lm.xyz), map_valid=np.asarray(lm.valid),
             map_desc=np.asarray(lm.desc))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1], sys.argv[2]))
