"""Masked-table slot allocation — the TPU replacement for the reference's
dynamic `types::map<T>` insert/merge semantics (`types/map.h:23-289`).

SURVEY.md §7 calls global-index bookkeeping "the trickiest semantic to
preserve": the reference correlates features across frames/cameras by
monotone `size_t` ids. Here ids live in fixed-capacity tables; insertion is a
rank-match between sorted free slots and sorted candidates, eviction is
priority-ordered — all static-shape, scatter-based, jit/scan-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_BIG = 1 << 30  # python int, not a device constant (see ops/match.py note)


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
    c = cand_score.shape[0]
    # free slots in ascending index order
    slot_order = jnp.argsort(jnp.where(slot_free, jnp.arange(n, dtype=jnp.int32), _BIG))
    n_free = jnp.sum(slot_free.astype(jnp.int32))
    # candidates in descending score order (invalid last)
    score = jnp.where(cand_valid, cand_score, -jnp.inf)
    cand_order = jnp.argsort(-score)
    n_cand = jnp.sum(cand_valid.astype(jnp.int32))
    # rank of each candidate
    rank = jnp.zeros(c, jnp.int32).at[cand_order].set(jnp.arange(c, dtype=jnp.int32))
    placed = cand_valid & (rank < jnp.minimum(n_free, n_cand))
    # slot for rank r = slot_order[r]
    cand_slot = jnp.where(placed, slot_order[jnp.clip(rank, 0, n - 1)].astype(jnp.int32), -1)
    return cand_slot, placed


def allocate_landmark_slots(lm_valid, lm_last_seen, protect, cand_score, cand_valid):
    """Allocate map slots for new landmarks with LRU eviction.

    Free slots are used first; if none remain, the stalest un-protected
    landmarks (smallest last_seen) are evicted. ``protect`` marks slots that
    must not be evicted (landmarks referenced by live feature tracks).

    Returns (cand_slot (C,) int32 or -1, placed (C,) bool).
    """
    n = lm_valid.shape[0]
    c = cand_score.shape[0]
    # priority for being written: free slots first (key = -1), then stale
    # landmarks by last_seen; protected slots are unavailable.
    key = jnp.where(lm_valid, lm_last_seen, -1)
    key = jnp.where(protect, _BIG, key)
    slot_order = jnp.argsort(key)  # ascending: free, then stalest
    n_avail = jnp.sum((~protect).astype(jnp.int32))

    score = jnp.where(cand_valid, cand_score, -jnp.inf)
    cand_order = jnp.argsort(-score)
    n_cand = jnp.sum(cand_valid.astype(jnp.int32))
    rank = jnp.zeros(c, jnp.int32).at[cand_order].set(jnp.arange(c, dtype=jnp.int32))
    placed = cand_valid & (rank < jnp.minimum(n_avail, n_cand))
    cand_slot = jnp.where(placed, slot_order[jnp.clip(rank, 0, n - 1)].astype(jnp.int32), -1)
    return cand_slot, placed
