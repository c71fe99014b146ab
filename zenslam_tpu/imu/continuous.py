"""Continuous-time IMU preintegration backends: LPM and UGPM-grade.

Parity target: the ugpm/lpm arm of the reference's integrator façade
(`motion/integrator.cpp:184-215` + `integrator_ugpm.cpp:15-79`). The
reference feeds timestamped samples within an 8x overlap window around the
integration interval into the `ugpm` library, which fits a continuous-time
posterior to each inertial channel — LINEAR interpolation for LPM, a
Gaussian-process regression for UGPM — resamples it at `state_freq` = 200 Hz
(`integrator_ugpm.cpp:42`), and preintegrates the posterior mean, returning
the same `integral{dR, dv, dp, dt, dt²/2, 9x9 cov}` as the basalt backend.

TPU shape: both backends are "resample onto a uniform grid, then run the
SAME manifold scan" (`preintegration.preintegrate`):
- LPM: masked linear interpolation — a (G,) searchsorted + gather.
- UGPM-grade: per-channel GP posterior mean with an RBF kernel over the
  overlap-window samples — one (S, S) Cholesky solve + an (G, S) kernel
  matmul per 6-channel block, pure MXU food. Hyperparameters are fixed
  (lengthscale = a few sample periods) instead of the reference's
  marginal-likelihood optimization — documented simplification; the
  denoising behavior (the reason ugpm exists) is preserved and tested.

The overlap-window semantics are the caller's contract: pass samples
covering [t0 - 8*(t1-t0), t1 + 8*(t1-t0)] when available (≡
`integrator.cpp:186-196`); both backends integrate only [t0, t1] but use
the context for the fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from zenslam_tpu.imu.preintegration import ImuIntegral, ImuNoise, preintegrate


def _sorted_valid(ts, vals, mask):
    """Sort samples by time with masked rows pushed to the end (+inf)."""
    big = jnp.float32(1e18)
    ts_m = jnp.where(mask, ts, big)
    order = jnp.argsort(ts_m)
    return ts_m[order], vals[order], mask[order]


def interp_masked(ts, vals, mask, grid):
    """Masked linear interpolation of (T, C) channel samples at (G,) grid
    times; clamps to the nearest valid sample outside the support (the LPM
    'linear posterior')."""
    ts_s, vals_s, mask_s = _sorted_valid(ts, vals, mask)
    n_valid = jnp.maximum(jnp.sum(mask), 2)
    hi = jnp.clip(jnp.searchsorted(ts_s, grid), 1, n_valid - 1)
    lo = hi - 1
    t_lo, t_hi = ts_s[lo], ts_s[hi]
    frac = jnp.clip((grid - t_lo) / jnp.maximum(t_hi - t_lo, 1e-9), 0.0, 1.0)
    return vals_s[lo] + frac[:, None] * (vals_s[hi] - vals_s[lo])


def gp_posterior_mean(ts, vals, mask, grid, lengthscale, signal_sd, noise_sd):
    """Per-channel GP posterior mean (RBF kernel, constant prior mean) of
    (T, C) samples evaluated at (G,) grid times. Masked rows contribute
    nothing (identity rows in K, zero targets, zero cross-kernel)."""
    mu = (jnp.sum(jnp.where(mask[:, None], vals, 0.0), axis=0)
          / jnp.maximum(jnp.sum(mask), 1))
    y = jnp.where(mask[:, None], vals - mu, 0.0)
    d = (ts[:, None] - ts[None, :]) / lengthscale
    K = signal_sd**2 * jnp.exp(-0.5 * d * d)
    both = mask[:, None] & mask[None, :]
    K = jnp.where(both, K, 0.0)
    diag = jnp.where(mask, signal_sd**2 + noise_sd**2, 1.0)
    K = K + jnp.diag(diag) - jnp.where(
        jnp.eye(ts.shape[0], dtype=bool), jnp.where(both, K, 0.0), 0.0)
    # K now has: valid block = rbf + noise on diag; invalid rows/cols = e_i
    L = jnp.linalg.cholesky(K)
    alpha = jax.scipy.linalg.cho_solve((L, True), y)       # (T, C)
    dg = (grid[:, None] - ts[None, :]) / lengthscale
    Kx = signal_sd**2 * jnp.exp(-0.5 * dg * dg)
    Kx = jnp.where(mask[None, :], Kx, 0.0)                 # (G, T)
    return mu + Kx @ alpha


@functools.partial(jax.jit, static_argnames=("n_grid", "method"))
def preintegrate_continuous(
    ts,          # (T,) sample timestamps (s), any order, masked padding
    gyro,        # (T, 3) rad/s
    accel,       # (T, 3) m/s²
    mask,        # (T,) bool
    t0, t1,      # () integration interval (≡ the [start, end] of integrate())
    n_grid: int = 64,
    method: str = "lpm",             # "lpm" | "ugpm"
    noise: ImuNoise = ImuNoise(),
    bias_gyro=None,
    bias_accel=None,
    gp_lengthscale=None,             # default: 3 mean sample periods
) -> ImuIntegral:
    """Continuous-time preintegration of [t0, t1] from (overlap-windowed)
    samples. Same return contract as `preintegrate`."""
    t0 = jnp.float32(t0)
    t1 = jnp.float32(t1)
    span = jnp.maximum(t1 - t0, 1e-6)
    dtg = span / n_grid
    # midpoint grid: each grid cell integrates its centre value over dtg
    grid = t0 + (jnp.arange(n_grid, dtype=jnp.float32) + 0.5) * dtg

    if method == "lpm":
        w = interp_masked(ts, gyro, mask, grid)
        a = interp_masked(ts, accel, mask, grid)
    elif method == "ugpm":
        n_valid = jnp.maximum(jnp.sum(mask), 2)
        t_span = (jnp.max(jnp.where(mask, ts, -jnp.inf))
                  - jnp.min(jnp.where(mask, ts, jnp.inf)))
        ls = (jnp.float32(gp_lengthscale) if gp_lengthscale is not None
              else 3.0 * t_span / n_valid.astype(jnp.float32))
        ls = jnp.maximum(ls, 1e-4)
        # signal scale from the data, noise floor from the continuous
        # densities at the (estimated) sample rate
        rate = n_valid.astype(jnp.float32) / jnp.maximum(t_span, 1e-6)
        w_sd = jnp.maximum(jnp.std(jnp.where(mask[:, None], gyro, 0.0)), 1e-3)
        a_sd = jnp.maximum(jnp.std(jnp.where(mask[:, None], accel, 0.0)), 1e-2)
        w = gp_posterior_mean(ts, gyro, mask, grid, ls, w_sd,
                              noise.gyro_noise * jnp.sqrt(rate))
        a = gp_posterior_mean(ts, accel, mask, grid, ls, a_sd,
                              noise.accel_noise * jnp.sqrt(rate))
    else:
        raise ValueError(f"unknown method {method!r} (lpm | ugpm)")

    dts = jnp.full((n_grid,), dtg, jnp.float32)
    return preintegrate(w, a, dts, jnp.ones((n_grid,), bool), noise,
                        bias_gyro, bias_accel)


def overlap_window_mask(ts, mask, t0, t1, overlap_factor: float = 8.0):
    """≡ `integrator.cpp:184-196`: keep samples within
    [t0 - f*(t1-t0), t1 + f*(t1-t0)] for the continuous-time fit."""
    period = t1 - t0
    lo = t0 - overlap_factor * period
    hi = t1 + overlap_factor * period
    return mask & (ts >= lo) & (ts <= hi)
