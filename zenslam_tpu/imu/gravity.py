"""Online gravity estimation from VO-vs-IMU acceleration residuals.

Parity target: `motion/gravity_estimator.cpp:6-134`:
- central-difference acceleration from a 3-pose history        ≡ `:6-84`
- compare to the mean measured (specific-force) acceleration
  rotated into the world frame: g ≈ R_wb·ā − a_vo
- magnitude gate 6–15 m/s²                                     ≡ `:75-83`
- component-wise MEDIAN over ≥ 10 accepted samples             ≡ `:86-134`

Fixed-capacity masked ring buffer; the median is a masked sort.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GravityEstimator(NamedTuple):
    samples: jnp.ndarray   # (C, 3) candidate gravity vectors
    valid: jnp.ndarray     # (C,)
    next_slot: jnp.ndarray # () int32
    min_samples: int = 10


def gravity_init(capacity: int = 64) -> GravityEstimator:
    return GravityEstimator(
        samples=jnp.zeros((capacity, 3), jnp.float32),
        valid=jnp.zeros(capacity, bool),
        next_slot=jnp.asarray(0, jnp.int32),
    )


@jax.jit
def gravity_add_sample(est: GravityEstimator, p0, p1, p2, dt01, dt12,
                       R_wb1, mean_accel_body):
    """Add one sample from three consecutive body positions (world frame) and
    the mean measured body acceleration over the interval."""
    # central-difference world acceleration of the trajectory
    v01 = (p1 - p0) / jnp.maximum(dt01, 1e-6)
    v12 = (p2 - p1) / jnp.maximum(dt12, 1e-6)
    a_vo = (v12 - v01) / jnp.maximum(0.5 * (dt01 + dt12), 1e-6)
    # measured specific force in world frame: f = a_body_world - g
    # => g = a_vo - R_wb f  ... sign convention: accelerometer measures f = a - g
    g_sample = a_vo - R_wb1 @ mean_accel_body
    mag = jnp.linalg.norm(g_sample)
    ok = (mag > 6.0) & (mag < 15.0)
    s = est.next_slot
    return est._replace(
        samples=jnp.where(ok, est.samples.at[s].set(g_sample), est.samples),
        valid=jnp.where(ok, est.valid.at[s].set(True), est.valid),
        next_slot=jnp.where(ok, (s + 1) % est.samples.shape[0], s),
    )


@jax.jit
def gravity_estimate(est: GravityEstimator):
    """Component-wise median over accepted samples.
    Returns (g (3,), ok () bool)."""
    n = jnp.sum(est.valid)
    ok = n >= est.min_samples

    def masked_median(col):
        big = jnp.where(est.valid, col, jnp.inf)
        srt = jnp.sort(big)
        mid = jnp.maximum(n - 1, 0) // 2
        lo = srt[mid]
        hi = srt[jnp.clip(n - 1 - mid, 0, col.shape[0] - 1)]
        return 0.5 * (lo + hi)

    g = jnp.stack([masked_median(est.samples[:, i]) for i in range(3)])
    g = jnp.where(jnp.isfinite(g), g, 0.0)
    return g, ok
