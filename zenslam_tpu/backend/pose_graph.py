"""SE(3) pose-graph optimization: Gauss-Newton on relative-pose residuals.

The reference installs GTSAM for this layer but never wires it
(`README.md:107`, SURVEY.md §2.4) — BASELINE.json config[3] makes it
first-class here: odometry edges from keyframe tracking + loop-closure edges
from the BoW detector (backend/bow.py), optimized jointly.

Residual for edge (i, j) with measurement T_ij (maps j-frame into i-frame
coordinates, world->cam convention poses):
    r = log( T_ij^-1 ∘ T_i ∘ T_j^-1 )     (6-vector, se(3))
Jacobians are taken numerically-free via the standard adjoint-free
small-angle approximation (exact enough for GN; each iteration re-linearizes).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.geometry.lie import (
    se3_compose,
    se3_inverse,
    se3_exp,
    so3_vee,
)


def _se3_log_smooth(R, t):
    """First-order smooth log residual: [t, vee(R - R^T)/2].

    Zero iff (R, t) = identity; agrees with the true log to first order. The
    exact `se3_log` is NOT differentiable at the identity (arccos branch), so
    autodiff through it NaNs exactly where converged residuals live — this
    smooth surrogate is the standard PGO fix and changes nothing at the
    optimum."""
    w = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5
    return jnp.concatenate([t, w], axis=-1)


class PoseGraph(NamedTuple):
    """K nodes (world->cam poses), E edges, fixed-capacity masked."""

    R: jnp.ndarray        # (K, 3, 3)
    t: jnp.ndarray        # (K, 3)
    node_valid: jnp.ndarray  # (K,)
    node_fixed: jnp.ndarray  # (K,) — gauge (usually node 0)
    edge_i: jnp.ndarray   # (E,) int32
    edge_j: jnp.ndarray   # (E,) int32
    edge_R: jnp.ndarray   # (E, 3, 3) measured T_ij = T_i ∘ T_j^-1
    edge_t: jnp.ndarray   # (E, 3)
    edge_valid: jnp.ndarray  # (E,)
    edge_weight: jnp.ndarray  # (E,) information scale (loop edges can differ)


def _edge_residuals(g: PoseGraph, R, t):
    """(E, 6) residuals r = log(T_ij^meas^-1 ∘ T_i ∘ T_j^-1)."""
    K = R.shape[0]
    i = jnp.clip(g.edge_i, 0, K - 1)
    j = jnp.clip(g.edge_j, 0, K - 1)
    Ri, ti = R[i], t[i]
    Rj, tj = R[j], t[j]
    Rj_inv, tj_inv = se3_inverse(Rj, tj)
    R_ij, t_ij = se3_compose(Ri, ti, Rj_inv, tj_inv)       # estimated T_ij
    Rm_inv, tm_inv = se3_inverse(g.edge_R, g.edge_t)
    R_err, t_err = se3_compose(Rm_inv, tm_inv, R_ij, t_ij)
    return _se3_log_smooth(R_err, t_err)


def pose_graph_cost(g: PoseGraph, R=None, t=None):
    R = g.R if R is None else R
    t = g.t if t is None else t
    r = _edge_residuals(g, R, t)
    w = jnp.where(g.edge_valid, g.edge_weight, 0.0)
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


@functools.partial(jax.jit, static_argnames=("iterations",))
def optimize_pose_graph(g: PoseGraph, iterations: int = 20, init_lambda: float = 1e-4):
    """LM Gauss-Newton over all node poses. Jacobians of the residual w.r.t.
    LEFT-multiplicative node increments, computed with jax.jacfwd on the
    6-dof edge function (tiny dims — autodiff is fine here; the heavy BA path
    uses analytic Jacobians)."""
    K = g.R.shape[0]
    free = g.node_valid & (~g.node_fixed)
    free6 = jnp.repeat(free, 6)
    cost0 = pose_graph_cost(g)

    def edge_fn(xi_i, xi_j, Ri, ti, Rj, tj, Rm, tm):
        dRi, dti = se3_exp(xi_i)
        dRj, dtj = se3_exp(xi_j)
        Ri2, ti2 = se3_compose(dRi, dti, Ri, ti)
        Rj2, tj2 = se3_compose(dRj, dtj, Rj, tj)
        Rj_inv, tj_inv = se3_inverse(Rj2, tj2)
        R_ij, t_ij = se3_compose(Ri2, ti2, Rj_inv, tj_inv)
        Rm_inv, tm_inv = se3_inverse(Rm, tm)
        R_err, t_err = se3_compose(Rm_inv, tm_inv, R_ij, t_ij)
        return _se3_log_smooth(R_err, t_err)

    zero6 = jnp.zeros(6, jnp.float32)
    Ji_fn = jax.vmap(jax.jacfwd(edge_fn, argnums=0), in_axes=(None, None, 0, 0, 0, 0, 0, 0))
    Jj_fn = jax.vmap(jax.jacfwd(edge_fn, argnums=1), in_axes=(None, None, 0, 0, 0, 0, 0, 0))

    def step(carry, _):
        R, t, lam, cost = carry
        i = jnp.clip(g.edge_i, 0, K - 1)
        j = jnp.clip(g.edge_j, 0, K - 1)
        r = _edge_residuals(g, R, t)                         # (E, 6)
        Ji = Ji_fn(zero6, zero6, R[i], t[i], R[j], t[j], g.edge_R, g.edge_t)  # (E,6,6)
        Jj = Jj_fn(zero6, zero6, R[i], t[i], R[j], t[j], g.edge_R, g.edge_t)
        w = jnp.where(g.edge_valid, g.edge_weight, 0.0)
        # assemble dense H (6K, 6K), b
        H = jnp.zeros((K, 6, K, 6), jnp.float32)
        JiW = Ji * w[:, None, None]
        JjW = Jj * w[:, None, None]
        H = H.at[i, :, i, :].add(jnp.einsum("eai,eaj->eij", JiW, Ji))
        H = H.at[j, :, j, :].add(jnp.einsum("eai,eaj->eij", JjW, Jj))
        H = H.at[i, :, j, :].add(jnp.einsum("eai,eaj->eij", JiW, Jj))
        H = H.at[j, :, i, :].add(jnp.einsum("eai,eaj->eij", JjW, Ji))
        b = jnp.zeros((K, 6), jnp.float32)
        b = b.at[i].add(-jnp.einsum("eai,ea->ei", JiW, r))
        b = b.at[j].add(-jnp.einsum("eai,ea->ei", JjW, r))
        Hf = H.reshape(K * 6, K * 6) + lam * jnp.eye(K * 6)
        m = free6.astype(jnp.float32)
        Hf = Hf * m[:, None] * m[None, :] + jnp.diag(1.0 - m)
        bf = b.reshape(K * 6) * m
        L = jnp.linalg.cholesky(Hf + 1e-8 * jnp.eye(K * 6))
        dx = jax.scipy.linalg.cho_solve((L, True), bf)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0).reshape(K, 6) * free[:, None]
        dR, dt = se3_exp(dx)
        R_new, t_new = se3_compose(dR, dt, R, t)
        new_cost = pose_graph_cost(g, R_new, t_new)
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e3))
        return (R, t, lam, cost), accept

    (R, t, lam, cost), accepts = jax.lax.scan(
        step, (g.R, g.t, jnp.float32(init_lambda), cost0), None, length=iterations
    )
    return {"R": R, "t": t, "cost_before": cost0, "cost_after": cost,
            "n_accepted": jnp.sum(accepts.astype(jnp.int32))}
