"""Capture a device trace of slam_step and print the per-op device-time table
(the data source for ROOFLINE.md). Usage: python profile_trace.py [--width W --height H]"""
import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache"))

import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig, init_state
from zenslam_tpu.pipeline.step import slam_step


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--height", type=int, default=1024)
    args = ap.parse_args()
    cfg = SlamConfig()
    seq = make_sequence(np.random.default_rng(11), n_frames=8,
                        width=args.width, height=args.height, motion="arc",
                        speed=0.5, device_render=True)
    left = [jax.device_put(f) for f in seq.left]
    right = [jax.device_put(f) for f in seq.right]
    state = init_state(cfg, seq.left[0].shape)
    for t in range(3):
        state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
    jax.block_until_ready(state.t_cw)

    logdir = "/tmp/jaxtrace"
    os.system(f"rm -rf {logdir}")
    with jax.profiler.trace(logdir):
        for t in range(3, 8):
            state, tel = slam_step(cfg, seq.rig, state, left[t], right[t])
        jax.block_until_ready(state.t_cw)

    # parse the xplane proto: sum device-side op durations
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    tot = {}
    for f in files:
        xs = xplane_pb2.XSpace()
        xs.ParseFromString(open(f, "rb").read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_names = {i: m.name for i, m in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    tot[name] = tot.get(name, 0.0) + ev.duration_ps / 1e9
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    print(f"{'op':70s} ms/5frames")
    for name, ms in items[:45]:
        print(f"{name[:70]:70s} {ms:8.3f}")


if __name__ == "__main__":
    main()
