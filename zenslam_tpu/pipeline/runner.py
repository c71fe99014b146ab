"""Host-side sequence runner: per-frame streaming or one `lax.scan`.

Replaces the reference's threading shell (reader_thread → queue → slam_thread,
`slam_thread.cpp:96-116` / `reader_thread.h:39-72`): on TPU the pipeline
overlap comes from XLA's async dispatch — the host enqueues frame t+1 while
the device still computes frame t — and from `lax.scan` for offline batches.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from zenslam_tpu.geometry.camera import StereoRig
from zenslam_tpu.pipeline.state import SlamConfig, init_state
from zenslam_tpu.pipeline.step import slam_step


def run_sequence(
    cfg: SlamConfig,
    rig: StereoRig,
    left: np.ndarray,
    right: np.ndarray,
    seed: int = 0,
    mode: str = "stream",
    state=None,
    imu=None,
):
    """Run SLAM over a (T, H, W) stereo sequence.

    mode='stream': python loop (async dispatch pipelining, telemetry per frame)
    mode='scan'  : single lax.scan — maximal device residency for offline runs.
    imu: optional (gyro (T,S,3), accel (T,S,3), dts (T,S), mask (T,S)) — the
    per-frame-interval IMU batches (enables the VIO path of slam_step).

    Returns (final_state, telemetry_pytree_stacked_over_T).
    """
    T, H, W = left.shape
    if state is None:
        state = init_state(cfg, (H, W), seed=seed)

    if mode == "scan":
        if imu is None:
            def body(st, xs):
                il, ir = xs
                st, tel = slam_step(cfg, rig, st, il, ir)
                return st, tel
            xs = (jnp.asarray(left), jnp.asarray(right))
        else:
            def body(st, xs):
                il, ir, g, a, d, m = xs
                st, tel = slam_step(cfg, rig, st, il, ir, imu=(g, a, d, m))
                return st, tel
            xs = (jnp.asarray(left), jnp.asarray(right)) + tuple(
                jnp.asarray(x) for x in imu)
        state, telem = jax.lax.scan(body, state, xs)
        return state, jax.tree.map(np.asarray, telem)

    # stream mode with host->device PREFETCH: transfers for frame t+k are
    # dispatched while the device computes frame t (≡ the reference's
    # reader_thread feeding the slam_thread queue, `reader_thread.h:39-72` —
    # without prefetch each frame pays the full transfer latency serially).
    depth = 4
    from collections import deque

    def put(t):
        pair = (jax.device_put(left[t]), jax.device_put(right[t]))
        if imu is None:
            return pair + (None,)
        return pair + (tuple(jax.device_put(x[t]) for x in imu),)

    queue = deque()
    for t in range(min(depth, T)):
        queue.append(put(t))
    telems = []
    for t in range(T):
        il, ir, fi = queue.popleft()
        if t + depth < T:
            queue.append(put(t + depth))
        state, tel = slam_step(cfg, rig, state, il, ir, imu=fi)
        telems.append(tel)
    # stack ON DEVICE, fetch once — per-frame np.asarray fetches would pay a
    # host round-trip per telemetry leaf per frame
    telem = jax.tree.map(lambda *xs: jnp.stack(xs), *telems)
    return state, jax.tree.map(np.asarray, jax.device_get(telem))
