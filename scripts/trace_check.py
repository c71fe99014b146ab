"""Smoke gate: trace `slam_step` at NON-DEFAULT rigs before any commit.

The round-2 regression (`TracerBoolConversionError` at step.py:193) traced
fine in no test because every pipeline test used the default rig/config and
the one code path it broke was only exercised jitted. This gate traces the
full step at several off-default rigs (distorted, odd image sizes, zero
width/height metadata, keylines+fusion on) on the CPU backend — cheap, fast,
and it catches any Python-level branch on traced values.

Run: python scripts/trace_check.py    (also part of `make check`)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp


def trace_step(H, W, rig_kwargs, cfg_kwargs, label):
    from zenslam_tpu.io.synthetic import default_rig
    from zenslam_tpu.pipeline.state import SlamConfig, init_state
    from zenslam_tpu.pipeline.step import slam_step

    cfg = SlamConfig(**cfg_kwargs)
    rig = default_rig(width=W, height=H, **rig_kwargs)
    state = init_state(cfg, (H, W))
    rng = np.random.default_rng(0)
    img_l = jnp.asarray(rng.random((H, W)).astype(np.float32))
    img_r = jnp.asarray(rng.random((H, W)).astype(np.float32))
    # imu branch traced too
    S = 8
    imu = (jnp.zeros((S, 3), jnp.float32), jnp.zeros((S, 3), jnp.float32),
           jnp.full((S,), 0.005, jnp.float32), jnp.ones((S,), bool))
    new_state, telem = slam_step(cfg, rig, state, img_l, img_r, imu=imu)
    jax.block_until_ready(telem.t_cw)
    assert np.isfinite(np.asarray(telem.t_cw)).all(), f"{label}: NaN pose"
    print(f"  ok: {label} ({W}x{H})")


def main():
    print("trace_check: slam_step at non-default rigs (CPU)")
    trace_step(96, 128, {}, {}, "default config, small shape")
    trace_step(128, 160, {}, {"use_clahe": True, "use_pose_fusion": True},
               "CLAHE + pose fusion")
    trace_step(96, 128, {}, {"use_keylines": True}, "keylines on")
    # zero width/height metadata (unknown rig size) must trace and run —
    # the round-2 break was a Python `if` on exactly these traced leaves
    from zenslam_tpu.io.synthetic import default_rig
    from zenslam_tpu.pipeline.state import SlamConfig, init_state
    from zenslam_tpu.pipeline.step import slam_step

    cfg = SlamConfig()
    rig = default_rig(width=128, height=96)
    rig = rig._replace(left=rig.left._replace(width=0, height=0))
    state = init_state(cfg, (96, 128))
    rng = np.random.default_rng(1)
    il = jnp.asarray(rng.random((96, 128)).astype(np.float32))
    ir = jnp.asarray(rng.random((96, 128)).astype(np.float32))
    _, telem = slam_step(cfg, rig, state, il, ir)
    jax.block_until_ready(telem.t_cw)
    print("  ok: zero width/height metadata")
    print("trace_check: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
