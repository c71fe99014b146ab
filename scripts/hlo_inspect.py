"""Print the optimized-HLO definitions of named fusions in slam_step."""
import os as _os

# opt into the persistent compile cache (see zenslam_tpu/__init__.py)
_os.environ.setdefault("ZENSLAM_CACHE_DIR",
                       _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), "../.jax_cache"))

import re
import sys

import jax
import numpy as np

from zenslam_tpu.io.synthetic import make_sequence
from zenslam_tpu.pipeline import SlamConfig, init_state
from zenslam_tpu.pipeline.step import slam_step

cfg = SlamConfig()
seq = make_sequence(np.random.default_rng(11), n_frames=2, width=1024,
                    height=1024, motion="arc", speed=0.5, device_render=True)
state = init_state(cfg, seq.left[0].shape)
lowered = jax.jit(slam_step, static_argnums=(0,)).lower(
    cfg, seq.rig, state, seq.left[0], seq.right[0])
txt = lowered.compile().as_text()
print("total HLO lines:", len(txt.splitlines()))
targets = sys.argv[1:] or ["fusion.33 ", "fusion.34 ", "fusion.1294",
                           "fusion.1295", "fusion.1296"]
for line in txt.splitlines():
    for t in targets:
        if ("%" + t) in line and "= " in line.split("%" + t)[1][:4]:
            # print op + metadata (source attribution)
            print("=" * 100)
            print(line.strip()[:2000])
