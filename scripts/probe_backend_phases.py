"""Probe: per-keyframe backend phase costs at the bench operating point."""
import os
os.environ.setdefault("ZENSLAM_CACHE_DIR", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
import time
import numpy as np
import jax
from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig
from zenslam_tpu.pipeline.system import BackendConfig, create_system, process_frame, flush_pipeline

seq = make_sequence(np.random.default_rng(11), n_frames=80, width=1024, height=1024,
                    motion="arc", speed=0.5, device_render=True)
cfg = SlamConfig()
left = [jax.device_put(f) for f in seq.left]
right = [jax.device_put(f) for f in seq.right]

for pidx in range(2):
    sysm = create_system(cfg, BackendConfig(telemetry_lag=3), seq.rig, (1024, 1024))
    phases, steps = [], []
    t0 = time.perf_counter()
    for t in range(80):
        _, info = process_frame(sysm, left[t], right[t])
        if info and info.get("phases"):
            phases.append(dict(info["phases"], total=info["backend_ms"]))
        if info: steps.append(info["step_ms"])
    for _, info in flush_pipeline(sysm):
        if info.get("phases"):
            phases.append(dict(info["phases"], total=info["backend_ms"]))
    jax.block_until_ready(sysm.state.t_cw)
    dt = time.perf_counter() - t0
    if pidx == 0:
        print("pass1 (compile) done", flush=True)
        continue
    print(f"pass2: {80/dt:.2f} fps wall, {len(phases)} keyframes")
    keys = sorted({k for p in phases for k in p})
    for k in keys:
        v = [p.get(k, 0.0) for p in phases]
        print(f"  {k:14s} med {np.median(v):7.2f} ms  mean {np.mean(v):7.2f}  max {np.max(v):7.2f}")
    print(f"  step_ms        med {np.median(steps):7.2f}")
