import os
os.environ.setdefault("ZENSLAM_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import time
import numpy as np
import jax, jax.numpy as jnp
from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig
from zenslam_tpu.pipeline.system import (
    BackendConfig, create_system, process_frame, flush_pipeline,
    _windowed_ba_jit, _loop_query_verify, _kf_snapshot)
from zenslam_tpu.backend.map_archive import _pack_live
from zenslam_tpu.pipeline.step import slam_step

seq = make_sequence(np.random.default_rng(11), n_frames=60, width=1024, height=1024,
                    motion="arc", speed=0.5, device_render=True)
cfg = SlamConfig()
bcfg = BackendConfig(telemetry_lag=3)
sysm = create_system(cfg, bcfg, seq.rig, (1024, 1024))
left = [jax.device_put(f) for f in seq.left]
right = [jax.device_put(f) for f in seq.right]
for t in range(60):
    process_frame(sysm, left[t], right[t])
flush_pipeline(sysm)
jax.block_until_ready(sysm.state.t_cw)

def timeit(name, fn, last, n=8):
    last(fn()).block_until_ready()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        last(fn()).block_until_ready()
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"{name:22s} med {np.median(ts):7.2f} ms (incl ~1 RTT)")

# baseline RTT: block on an already-materialized tiny array
x = jnp.zeros(3) + 1
x.block_until_ready()
timeit("RTT floor", lambda: x, lambda r: r)

W = bcfg.ba_window
timeit("windowed_ba (6 it)", lambda: _windowed_ba_jit(
    sysm.kf_db, sysm.state.lmap.xyz, sysm.state.lmap.valid,
    sysm.state.lmap.generation, sysm.state.R_cw, sysm.state.t_cw, sysm.rig,
    W=W, use_cg=False, iterations=6), lambda r: r[5])
timeit("loop_query_verify", lambda: _loop_query_verify(
    sysm.vocab, sysm.bow_db, sysm.kf_db,
    jnp.asarray(sysm.last_kf_slot, jnp.int32), jnp.asarray(59, jnp.int32),
    sysm.rig.left.K, bcfg.bow_min_frame_gap, bcfg.loop_pnp_threshold,
    jax.random.PRNGKey(3), top_k=bcfg.bow_top_k, pnp_iters=128),
    lambda r: r[1])
timeit("kf_snapshot", lambda: _kf_snapshot(sysm.state), lambda r: r.kp_xyz)
timeit("pack_live", lambda: _pack_live(sysm.state.lmap), lambda r: r)
timeit("slam_step", lambda: slam_step(cfg, seq.rig, sysm.state, left[0], right[0]),
       lambda r: r[1].t_cw)
