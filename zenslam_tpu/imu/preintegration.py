"""SO(3)-manifold IMU preintegration with 9x9 covariance — one `lax.scan`.

Parity target: the basalt backend of the reference's integrator façade
(`motion/integrator.cpp:86-156`: per-sample ns-timestamped integration on the
SO(3) manifold with covariance propagation), returning
`integral{ΔR, Δv, Δp, dt, dt²/2, 9x9 cov}` (`motion/integrator_types.h:9-17`).
The reference's alternative ugpm/lpm backends (`integrator_ugpm.cpp`) are
Gaussian-process refinements of the same quantity; the linear (lpm) behavior
corresponds to this integrator on the same samples.

State order in the covariance: [δθ (3), δv (3), δp (3)] — standard
Forster-style on-manifold preintegration:

  ΔR_{k+1} = ΔR_k Exp((ω_k - b_g) dt)
  Δv_{k+1} = Δv_k + ΔR_k (a_k - b_a) dt
  Δp_{k+1} = Δp_k + Δv_k dt + ½ ΔR_k (a_k - b_a) dt²

Fixed-capacity masked samples: padding rows carry dt = 0 and contribute
nothing (exp(0)=I), so a whole 200 Hz interval batch jits once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.lie import so3_exp, so3_hat, so3_left_jacobian


class ImuNoise(NamedTuple):
    """Continuous-time noise densities (Kalibr/Allan convention,
    ≡ `imu_calibration.h:21-67` / `imu_config.yaml`)."""

    gyro_noise: float = 1.6e-4       # rad/s/√Hz
    accel_noise: float = 2.8e-3      # m/s²/√Hz
    gyro_bias_walk: float = 1.9e-5   # rad/s²/√Hz
    accel_bias_walk: float = 8.6e-4  # m/s³/√Hz


class ImuIntegral(NamedTuple):
    dR: jnp.ndarray       # (3,3) rotation delta (body frame k -> k+N)
    dv: jnp.ndarray       # (3,)
    dp: jnp.ndarray       # (3,)
    dt: jnp.ndarray       # () total time
    dt2_half: jnp.ndarray # () ∫∫ 1
    cov: jnp.ndarray      # (9,9) [δθ, δv, δp]
    # bias Jacobians (first-order bias correction without re-integration)
    dR_dbg: jnp.ndarray   # (3,3) ∂Log(ΔR)/∂b_g
    dv_dbg: jnp.ndarray   # (3,3)
    dv_dba: jnp.ndarray   # (3,3)
    dp_dbg: jnp.ndarray   # (3,3)
    dp_dba: jnp.ndarray   # (3,3)


def identity_integral() -> ImuIntegral:
    z = jnp.zeros((3, 3), jnp.float32)
    return ImuIntegral(
        dR=jnp.eye(3, dtype=jnp.float32),
        dv=jnp.zeros(3, jnp.float32),
        dp=jnp.zeros(3, jnp.float32),
        dt=jnp.float32(0.0),
        dt2_half=jnp.float32(0.0),
        cov=jnp.zeros((9, 9), jnp.float32),
        dR_dbg=z, dv_dbg=z, dv_dba=z, dp_dbg=z, dp_dba=z,
    )


@jax.jit
def preintegrate(
    gyro,        # (T, 3) rad/s
    accel,       # (T, 3) m/s²
    dts,         # (T,) seconds per sample
    mask,        # (T,) bool — padding rows excluded
    noise: ImuNoise = ImuNoise(),
    bias_gyro=None,
    bias_accel=None,
) -> ImuIntegral:
    """Scan-integrate one interval of IMU samples."""
    if bias_gyro is None:
        bias_gyro = jnp.zeros(3, jnp.float32)
    if bias_accel is None:
        bias_accel = jnp.zeros(3, jnp.float32)
    sg2 = noise.gyro_noise ** 2
    sa2 = noise.accel_noise ** 2

    def body(carry, x):
        it = carry
        w, a, dt, m = x
        dt = jnp.where(m, dt, 0.0)
        w = w - bias_gyro
        a = a - bias_accel
        dR_step = so3_exp(w * dt)
        Jr = so3_left_jacobian(-w * dt)  # right Jacobian of Exp(w dt)
        a_hat = so3_hat(a)
        dRa = it.dR @ a
        # covariance propagation (Forster eq. 59-63 structure)
        A = jnp.zeros((9, 9), jnp.float32)
        A = A.at[0:3, 0:3].set(dR_step.T)
        A = A.at[3:6, 0:3].set(-it.dR @ a_hat * dt)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 0:3].set(-0.5 * it.dR @ a_hat * dt * dt)
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        B = jnp.zeros((9, 6), jnp.float32)
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(it.dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * it.dR * dt * dt)
        Q = jnp.diag(jnp.concatenate([
            jnp.full(3, sg2), jnp.full(3, sa2)
        ])) / jnp.maximum(dt, 1e-6)  # discrete: sigma²/dt · dt² = sigma² dt
        cov = A @ it.cov @ A.T + B @ Q @ B.T
        cov = jnp.where(m, cov, it.cov)
        # bias Jacobians
        dR_dbg = dR_step.T @ it.dR_dbg - Jr * dt
        dv_dbg = it.dv_dbg - it.dR @ a_hat @ it.dR_dbg * dt
        dv_dba = it.dv_dba - it.dR * dt
        dp_dbg = it.dp_dbg + it.dv_dbg * dt - 0.5 * it.dR @ a_hat @ it.dR_dbg * dt * dt
        dp_dba = it.dp_dba + it.dv_dba * dt - 0.5 * it.dR * dt * dt
        new = ImuIntegral(
            dR=it.dR @ dR_step,
            dv=it.dv + dRa * dt,
            dp=it.dp + it.dv * dt + 0.5 * dRa * dt * dt,
            dt=it.dt + dt,
            dt2_half=it.dt2_half + it.dt * dt + 0.5 * dt * dt,
            cov=cov,
            dR_dbg=jnp.where(m, dR_dbg, it.dR_dbg),
            dv_dbg=jnp.where(m, dv_dbg, it.dv_dbg),
            dv_dba=jnp.where(m, dv_dba, it.dv_dba),
            dp_dbg=jnp.where(m, dp_dbg, it.dp_dbg),
            dp_dba=jnp.where(m, dp_dba, it.dp_dba),
        )
        # masked samples leave the integral untouched
        new = jax.tree.map(lambda n, o: jnp.where(m, n, o), new, it)
        return new, None

    out, _ = jax.lax.scan(body, identity_integral(), (gyro, accel, dts, mask))
    return out
