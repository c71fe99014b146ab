"""Fixed-iteration vmapped RANSAC machinery.

The reference uses OpenCV's adaptive early-exit RANSAC loops
(`solvePnPRansac` in `pose_estimation/common.h:26-103`, `findFundamentalMat`
in `matcher.cpp:90`, the 1000-iteration rigid loop in
`utils/rigid_transform.cpp:79-166`). On TPU, data-dependent loop exits defeat
XLA, so (SURVEY.md §7 "RANSAC on accelerator") every estimator here runs a
FIXED number of hypotheses in parallel via vmap and picks the best by masked
inlier count — same estimator semantics, accelerator-shaped control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ransac_sample_indices(key, valid, iters: int, n_sample: int):
    """Sample ``iters`` index-tuples of size ``n_sample`` from valid entries.

    Uses the Gumbel top-k trick so every hypothesis samples WITHOUT
    replacement among valid indices, fully batched. Returns (iters, n_sample)
    int32. If fewer than n_sample valid entries exist, indices repeat —
    callers must mask on ``valid_count >= n_sample``.
    """
    n = valid.shape[0]
    g = jax.random.gumbel(key, (iters, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, n_sample)
    return idx.astype(jnp.int32)


def best_hypothesis(scores):
    """argmax with deterministic tie-break toward the lowest index."""
    return jnp.argmax(scores).astype(jnp.int32)
