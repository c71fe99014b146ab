"""Multi-device distributed bundle adjustment over a JAX mesh.

This is BASELINE.json config[4] / the north-star scaling axis (SURVEY.md §5
"map-block sharding"): keyframe/landmark map blocks sharded across devices,
landmark (Schur) elimination LOCAL to each shard, the reduced camera system
assembled with `psum` collectives over ICI, solved replicated, poses
broadcast implicitly by replication.

Sharding layout (mesh axis "m" = map shard):
- poses R/t + gauge masks:        REPLICATED (tiny: K ≤ 64)
- landmarks xyz/valid:            sharded on axis 0 (contiguous blocks)
- observations (kf, lm, uv, ok):  sharded on axis 0, pre-partitioned so each
                                  observation lives with its landmark's shard
                                  and carries a shard-LOCAL landmark index
- per-iteration comms: ONE psum of (U, g_p, S_off, g_off) ≈ K²·36 + K·12
  floats — a few hundred KB, pure ICI; landmark back-substitution needs no
  communication at all.

The reference has no distributed layer (SURVEY.md §2.5); its Ceres
SPARSE_SCHUR (`local_bundle_adjustment.cpp:379-387`) is the single-node
ancestor of this decomposition.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from zenslam_tpu.backend.ba import (
    BAProblem,
    ba_cost,
    _build_blocks,
    _inv3x3,
    _apply_gauge,
)
from zenslam_tpu.geometry.lie import so3_exp


def make_ba_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over map shards. On a pod slice the axis rides ICI."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            if len(devices) < n_devices:
                raise ValueError(
                    f"requested a {n_devices}-device mesh but only "
                    f"{len(devices)} devices exist — a silently smaller mesh "
                    "would mis-read shard-local landmark indices"
                )
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), ("m",))


def shard_ba_problem(p: BAProblem, n_shards: int, obs_per_shard: int | None = None) -> BAProblem:
    """Host-side re-layout: pad M to a multiple of n_shards; route every
    observation to its landmark's shard with a shard-LOCAL landmark index;
    pad each shard's observation list to a common length.

    The returned problem's obs arrays have length n_shards * obs_per_shard,
    ordered by shard, and obs_lm holds LOCAL indices — consumed only by
    dist_bundle_adjust (single-device bundle_adjust would misread them).
    """
    M = p.xyz.shape[0]
    M_pad = ((M + n_shards - 1) // n_shards) * n_shards
    ms = M_pad // n_shards

    xyz = np.zeros((M_pad, 3), np.float32)
    xyz[:M] = np.asarray(p.xyz)
    lm_valid = np.zeros(M_pad, bool)
    lm_valid[:M] = np.asarray(p.lm_valid)

    obs_kf = np.asarray(p.obs_kf)
    obs_lm = np.asarray(p.obs_lm)
    obs_uv = np.asarray(p.obs_uv)
    obs_cam = np.asarray(p.obs_cam)
    obs_ok = np.asarray(p.obs_valid)
    owner = obs_lm // ms
    counts = np.bincount(owner[obs_ok], minlength=n_shards)
    if obs_per_shard is None:
        obs_per_shard = int(counts.max()) if counts.size else 1
        obs_per_shard = max(obs_per_shard, 1)

    O_new = n_shards * obs_per_shard
    new_kf = np.zeros(O_new, np.int32)
    new_lm = np.zeros(O_new, np.int32)
    new_uv = np.zeros((O_new, 2), np.float32)
    new_cam = np.zeros(O_new, np.int32)
    new_ok = np.zeros(O_new, bool)
    for d in range(n_shards):
        sel = np.flatnonzero(obs_ok & (owner == d))[:obs_per_shard]
        base = d * obs_per_shard
        n = sel.size
        new_kf[base : base + n] = obs_kf[sel]
        new_lm[base : base + n] = obs_lm[sel] - d * ms  # shard-local index
        new_uv[base : base + n] = obs_uv[sel]
        new_cam[base : base + n] = obs_cam[sel]
        new_ok[base : base + n] = True

    return p._replace(
        xyz=jnp.asarray(xyz),
        lm_valid=jnp.asarray(lm_valid),
        obs_kf=jnp.asarray(new_kf),
        obs_lm=jnp.asarray(new_lm),
        obs_uv=jnp.asarray(new_uv),
        obs_cam=jnp.asarray(new_cam),
        obs_valid=jnp.asarray(new_ok),
    )


@functools.partial(jax.jit, static_argnames=("n_shards", "obs_per_shard"))
def shard_ba_problem_jit(p: BAProblem, n_shards: int, obs_per_shard: int):
    """DEVICE-side (jittable, static-shape) counterpart of shard_ba_problem —
    what the LIVE backend uses so `ba_solver: "dist"` stays one fused device
    program with no host round trip per keyframe.

    Routing: stable-sort observations by owner shard (owner = obs_lm // ms,
    invalid → n_shards so they sort last), rank-within-shard via a
    searchsorted segment-start subtraction, scatter into the per-shard padded
    layout with shard-LOCAL landmark indices. Observations beyond
    ``obs_per_shard`` on a hot shard are dropped (masked), and the count is
    returned so coverage loss is visible, not silent.

    Requires M divisible by n_shards (the live window compaction rounds its
    landmark bound up to a shard multiple). Returns (problem, n_dropped).
    """
    M = p.xyz.shape[0]
    if M % n_shards:
        raise ValueError(f"M={M} not divisible by n_shards={n_shards}")
    ms = M // n_shards
    O = p.obs_kf.shape[0]
    owner = jnp.where(p.obs_valid, p.obs_lm // ms, n_shards).astype(jnp.int32)
    order = jnp.argsort(owner, stable=True)
    so = owner[order]
    start = jnp.searchsorted(so, jnp.arange(n_shards, dtype=so.dtype))
    rank = (jnp.arange(O, dtype=jnp.int32)
            - start[jnp.clip(so, 0, n_shards - 1)].astype(jnp.int32))
    keep = (so < n_shards) & (rank < obs_per_shard)
    O_new = n_shards * obs_per_shard
    # dropped rows target index O_new -> discarded by mode="drop"
    dest = jnp.where(keep, so * obs_per_shard + rank, O_new)

    def scat(src_sorted, dtype=None):
        out = jnp.zeros((O_new,) + src_sorted.shape[1:],
                        dtype or src_sorted.dtype)
        return out.at[dest].set(src_sorted, mode="drop")

    lm_local = jnp.where(keep, p.obs_lm[order] - so * ms, 0)
    ps = p._replace(
        obs_kf=scat(p.obs_kf[order]),
        obs_lm=scat(lm_local),
        obs_uv=scat(p.obs_uv[order]),
        obs_cam=scat(p.obs_cam[order]),
        obs_valid=scat(jnp.ones(O, bool)),
    )
    n_dropped = (jnp.sum(so < n_shards) - jnp.sum(keep)).astype(jnp.int32)
    return ps, n_dropped


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "iterations", "refine_landmarks"),
)
def dist_bundle_adjust(
    p: BAProblem,
    mesh: Mesh,
    iterations: int = 15,
    huber_delta: float = 1.0,
    refine_landmarks: bool = True,
    init_lambda: float = 1e-3,
):
    """Sharded LM-damped Schur BA. ``p`` must come from shard_ba_problem with
    n_shards == mesh size. Returns the same dict as bundle_adjust."""
    K = p.R.shape[0]
    n_dev = mesh.shape["m"]

    lm_spec = P("m")
    obs_spec = P("m")
    rep = P()

    def local_cost(R, t, xyz_l, lm_valid_l, obs_kf, obs_lm, obs_uv, obs_cam, obs_ok):
        """Robust cost over this shard's observations (summed via psum)."""
        lp = p._replace(xyz=xyz_l, lm_valid=lm_valid_l, obs_kf=obs_kf,
                        obs_lm=obs_lm, obs_uv=obs_uv, obs_cam=obs_cam, obs_valid=obs_ok)
        c, _ = ba_cost(lp, R, t, xyz_l, huber_delta)
        return jax.lax.psum(c, "m")

    def sharded_step(R, t, lam, cost, xyz_l, lm_valid_l, obs_kf, obs_lm, obs_uv, obs_cam, obs_ok):
        """One LM iteration; runs per-device under shard_map."""
        lp = p._replace(xyz=xyz_l, lm_valid=lm_valid_l, obs_kf=obs_kf,
                        obs_lm=obs_lm, obs_uv=obs_uv, obs_cam=obs_cam, obs_valid=obs_ok)
        U_l, g_p_l, V, g_l, A = _build_blocks(lp, R, t, xyz_l, huber_delta)
        # landmark elimination LOCAL to the shard
        lm_active = lm_valid_l if refine_landmarks else jnp.zeros_like(lm_valid_l)
        Vd = V + lam * jnp.eye(3, dtype=V.dtype)[None]
        Vd = jnp.where(lm_active[:, None, None], Vd, jnp.eye(3, dtype=V.dtype)[None])
        Vinv = _inv3x3(Vd)
        B = jnp.einsum("mkab,mbc->mkac", A, Vinv)
        if refine_landmarks:
            S_off_l = jnp.einsum("mkac,mldc->kald", B, A)
            g_off_l = jnp.einsum("mkac,mc->ka", B, g_l)
        else:
            S_off_l = jnp.zeros((K, 6, K, 6), U_l.dtype)
            g_off_l = jnp.zeros((K, 6), U_l.dtype)
        # ---- the one collective: reduced camera system over ICI ----
        U, g_p, S_off, g_off = jax.lax.psum((U_l, g_p_l, S_off_l, g_off_l), "m")
        Ud = U + lam * jnp.eye(6, dtype=U.dtype)[None]
        ii = jnp.arange(K)
        S = jnp.zeros((K, 6, K, 6), U.dtype).at[ii, :, ii, :].set(Ud) - S_off
        S = S.reshape(K * 6, K * 6)
        rhs = (g_p - g_off).reshape(K * 6)
        free_kf = p.kf_valid & (~p.kf_fixed)
        S, rhs = _apply_gauge(S, rhs, jnp.repeat(free_kf, 6))
        # replicated dense solve (identical on every device)
        L = jnp.linalg.cholesky(S + 1e-8 * jnp.eye(S.shape[0], dtype=S.dtype))
        dx = jax.scipy.linalg.cho_solve((L, True), rhs)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
        d_pose = dx.reshape(K, 6) * free_kf[:, None]
        # local landmark back-substitution — no communication
        if refine_landmarks:
            At_dp = jnp.einsum("mkab,ka->mb", A, d_pose)
            d_lm = jnp.einsum("mbc,mc->mb", Vinv, g_l - At_dp) * lm_valid_l[:, None]
        else:
            d_lm = jnp.zeros_like(xyz_l)
        dR = so3_exp(d_pose[:, 3:])
        R_new = dR @ R
        t_new = jnp.einsum("kij,kj->ki", dR, t) + d_pose[:, :3]
        xyz_new = xyz_l + d_lm
        lp_new = lp._replace()
        c_new, _ = ba_cost(lp_new, R_new, t_new, xyz_new, huber_delta)
        new_cost = jax.lax.psum(c_new, "m")
        accept = new_cost < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        xyz_l = jnp.where(accept, xyz_new, xyz_l)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-9), jnp.minimum(lam * 4.0, 1e3))
        return R, t, lam, cost, xyz_l, accept

    step_sm = shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(rep, rep, rep, rep, lm_spec, lm_spec, obs_spec, obs_spec, obs_spec, obs_spec, obs_spec),
        out_specs=(rep, rep, rep, rep, lm_spec, rep),
        )
    cost_sm = shard_map(
        local_cost,
        mesh=mesh,
        in_specs=(rep, rep, lm_spec, lm_spec, obs_spec, obs_spec, obs_spec, obs_spec, obs_spec),
        out_specs=rep,
        )

    cost0 = cost_sm(p.R, p.t, p.xyz, p.lm_valid, p.obs_kf, p.obs_lm, p.obs_uv, p.obs_cam, p.obs_valid)

    def scan_body(carry, _):
        R, t, lam, cost, xyz = carry
        R, t, lam, cost, xyz, acc = step_sm(
            R, t, lam, cost, xyz, p.lm_valid, p.obs_kf, p.obs_lm, p.obs_uv, p.obs_cam, p.obs_valid
        )
        return (R, t, lam, cost, xyz), acc

    (R, t, lam, cost, xyz), accepts = jax.lax.scan(
        scan_body, (p.R, p.t, jnp.float32(init_lambda), cost0, p.xyz),
        None, length=iterations,
    )
    return {
        "R": R, "t": t, "xyz": xyz,
        "cost_before": cost0, "cost_after": cost,
        "n_accepted": jnp.sum(accepts.astype(jnp.int32)),
    }
