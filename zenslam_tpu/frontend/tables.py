"""Masked-table slot allocation — the TPU replacement for the reference's
dynamic `types::map<T>` insert/merge semantics (`types/map.h:23-289`).

SURVEY.md §7 calls global-index bookkeeping "the trickiest semantic to
preserve": the reference correlates features across frames/cameras by
monotone `size_t` ids. Here ids live in fixed-capacity tables; insertion is a
rank-match between free slots and score-ranked candidates, eviction is
priority-ordered — all static-shape, scatter-based, jit/scan-safe.

SORT-FREE: general sorts lower to multi-pass sorting networks on TPU
(~2 ms/frame measured for the 8192-slot argsort + two 512-candidate sorts).
Candidate ranks come from an O(C²) comparison matrix (C=512 → 0.26 M lane
ops, trivial), free-slot ordering from a cumsum + scatter, and LRU eviction
order from `approx_max_k` (the TPU-native selection unit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = 1 << 30  # python int, not a device constant (see ops/match.py note)


def _rank_by_score_desc(score, valid):
    """Rank of each element among the VALID ones by descending score, ties
    broken by ascending index; invalid elements get arbitrary large ranks.
    Equivalent to the position in argsort(-score) restricted to valid, but
    computed as an O(C²) comparison matrix (no sort)."""
    c = score.shape[0]
    s = jnp.where(valid, score, -jnp.inf)
    idx = jnp.arange(c)
    precedes = (s[None, :] > s[:, None]) | (
        (s[None, :] == s[:, None]) & (idx[None, :] < idx[:, None]))
    rank = jnp.sum((precedes & valid[None, :]).astype(jnp.int32), axis=1)
    return jnp.where(valid, rank, _BIG)


def _slot_by_rank_from_mask(avail):
    """slot_by_rank[r] = index of the r-th available slot (ascending), -1
    beyond the available count. cumsum + scatter, no sort."""
    n = avail.shape[0]
    pos = jnp.cumsum(avail.astype(jnp.int32)) - avail.astype(jnp.int32)
    out = jnp.full(n, -1, jnp.int32)
    return out.at[jnp.where(avail, pos, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


def insert_into_free_slots(slot_free, cand_score, cand_valid):
    """Match candidates to free table slots by score priority.

    Args:
      slot_free: (N,) bool — slots available for writing.
      cand_score: (C,) float — candidate priority (higher = placed first).
      cand_valid: (C,) bool.
    Returns:
      cand_slot: (C,) int32 — target slot per candidate, or -1 if not placed.
      placed:    (C,) bool.

    The r-th best valid candidate goes to the r-th free slot (ascending slot
    order), for r < min(#free, #valid candidates).
    """
    n = slot_free.shape[0]
    n_free = jnp.sum(slot_free.astype(jnp.int32))
    slot_by_rank = _slot_by_rank_from_mask(slot_free)
    rank = _rank_by_score_desc(cand_score, cand_valid)
    placed = cand_valid & (rank < n_free)
    cand_slot = jnp.where(
        placed, slot_by_rank[jnp.clip(rank, 0, n - 1)], -1)
    return cand_slot, placed


def allocate_landmark_slots(lm_valid, lm_last_seen, protect, cand_score, cand_valid):
    """Allocate map slots for new landmarks with LRU eviction.

    Free slots are used first (ascending index); if none remain, the stalest
    un-protected landmarks (smallest last_seen) are evicted. ``protect``
    marks slots that must not be evicted (landmarks referenced by live
    feature tracks).

    Eviction order comes from approx_max_k over staleness, capped at C
    eviction victims per call — at most C candidates can be placed, so the
    cap does not change behavior.

    Returns (cand_slot (C,) int32 or -1, placed (C,) bool).
    """
    n = lm_valid.shape[0]
    c = cand_score.shape[0]
    free = (~lm_valid) & (~protect)
    n_free = jnp.sum(free.astype(jnp.int32))
    slot_by_rank = _slot_by_rank_from_mask(free)

    # stalest-first eviction victims (valid, unprotected)
    evictable = lm_valid & (~protect)
    staleness = jnp.where(evictable, -lm_last_seen.astype(jnp.float32), -jnp.inf)
    k = min(c, n)
    ev_stale, ev_idx = jax.lax.approx_max_k(staleness, k)
    ev_ok = jnp.isfinite(ev_stale)
    n_evict = jnp.sum(ev_ok.astype(jnp.int32))
    # append eviction victims after the free slots in rank order
    slot_by_rank = slot_by_rank.at[n_free + jnp.arange(k)].set(
        jnp.where(ev_ok, ev_idx.astype(jnp.int32), -1), mode="drop")

    n_avail = n_free + n_evict
    rank = _rank_by_score_desc(cand_score, cand_valid)
    placed = cand_valid & (rank < n_avail)
    cand_slot = jnp.where(placed, slot_by_rank[jnp.clip(rank, 0, n - 1)], -1)
    placed = placed & (cand_slot >= 0)
    return cand_slot, placed
