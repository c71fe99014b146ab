"""Bag-of-binary-words place recognition: vocabulary + TF-IDF database.

Parity targets:
- vocabulary build (hierarchical k-means tree, levels^branching leaves)
  ≡ `place_recognition/bow_vocabulary.cpp:54-142` — HERE redesigned flat:
  on TPU a single Hamming matmul against ALL words is faster than a tree
  descent (the tree only wins on pointer machines; cf. the FLANN-vs-brute
  discussion in ops/match.py), so the vocabulary is one flat codebook of
  `n_words` centers trained by masked binary k-means (majority-vote
  centroids). Capability parity: descriptor→word quantization, L2-normalized
  word histogram.
- TF-IDF weighting + inverted-index query with temporal exclusion & top-k
  ≡ `place_recognition/bow_database.cpp:22-130,205-240` — the "inverted
  index" is a dense (frames, words) histogram matrix: cosine scores for ALL
  stored frames are one matvec.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from zenslam_tpu.ops.match import unpack_bits


@functools.partial(jax.jit, static_argnames=("n_words", "iters"))
def build_vocabulary(key, descriptors, valid, n_words: int = 256, iters: int = 8):
    """Binary k-means over packed 256-bit descriptors.

    Returns codebook as UNPACKED float bits (n_words, 256) — centers are
    bit-majority votes, kept float for the Hamming matmul. Empty clusters are
    re-seeded from random descriptors.
    """
    bits = unpack_bits(descriptors)  # (N, 256) {0,1}
    n = bits.shape[0]
    w = valid.astype(jnp.float32)
    # k-means++-ish init: random valid descriptors
    key, k0 = jax.random.split(key)
    logits = jnp.where(valid, 0.0, -jnp.inf)
    seed_idx = jax.random.categorical(k0, logits, shape=(n_words,))
    centers = bits[seed_idx]

    def assign(centers):
        # hamming distance to float centers: sum |b - c| == (1-b)c + b(1-c)
        d = (bits @ (1.0 - 2.0 * centers.T)) + jnp.sum(centers, -1)[None, :]
        d = jnp.where(valid[:, None], d, jnp.inf)
        return jnp.argmin(d, axis=1)

    def step(carry, k):
        centers = carry
        a = assign(centers)
        onehot = jax.nn.one_hot(a, n_words, dtype=jnp.float32) * w[:, None]
        counts = jnp.sum(onehot, axis=0)                      # (n_words,)
        sums = onehot.T @ bits                                # (n_words, 256)
        mean = sums / jnp.maximum(counts[:, None], 1.0)
        new_centers = (mean > 0.5).astype(jnp.float32)        # bit-majority
        # re-seed empties
        reseed = jax.random.categorical(k, logits, shape=(n_words,))
        new_centers = jnp.where((counts > 0)[:, None], new_centers, bits[reseed])
        return new_centers, None

    keys = jax.random.split(key, iters)
    centers, _ = jax.lax.scan(step, centers, keys)
    return centers


@jax.jit
def descriptors_to_bow(codebook, descriptors, valid):
    """Packed descriptors -> L2-normalized word histogram (n_words,).

    ≡ `descriptor_to_word` + histogram build (`bow_vocabulary.cpp:183-235`),
    one matmul instead of a tree walk.
    """
    bits = unpack_bits(descriptors)
    d = (bits @ (1.0 - 2.0 * codebook.T)) + jnp.sum(codebook, -1)[None, :]
    word = jnp.argmin(d, axis=1)
    n_words = codebook.shape[0]
    hist = jnp.zeros(n_words, jnp.float32).at[word].add(valid.astype(jnp.float32))
    norm = jnp.linalg.norm(hist)
    return hist / jnp.where(norm < 1e-9, 1.0, norm)


class BowDatabase(NamedTuple):
    hist: jnp.ndarray       # (F, n_words) L2-normalized histograms
    frame_idx: jnp.ndarray  # (F,) int32 source frame (-1 empty)
    valid: jnp.ndarray      # (F,)
    next_slot: jnp.ndarray  # () int32 ring pointer
    doc_freq: jnp.ndarray   # (n_words,) documents containing word (for IDF)


def bow_db_init(max_frames: int, n_words: int) -> BowDatabase:
    return BowDatabase(
        hist=jnp.zeros((max_frames, n_words), jnp.float32),
        frame_idx=jnp.full(max_frames, -1, jnp.int32),
        valid=jnp.zeros(max_frames, bool),
        next_slot=jnp.asarray(0, jnp.int32),
        doc_freq=jnp.zeros(n_words, jnp.float32),
    )


@jax.jit
def bow_db_add(db: BowDatabase, hist, frame_idx):
    """≡ `bow_database::add_frame` (`bow_database.cpp:22-49`)."""
    s = db.next_slot
    old = db.hist[s]
    df = db.doc_freq - (old > 0).astype(jnp.float32) * db.valid[s] + (hist > 0)
    return db._replace(
        hist=db.hist.at[s].set(hist),
        frame_idx=db.frame_idx.at[s].set(frame_idx),
        valid=db.valid.at[s].set(True),
        next_slot=(s + 1) % db.hist.shape[0],
        doc_freq=df,
    )


@functools.partial(jax.jit, static_argnames=("top_k",))
def bow_db_query(db: BowDatabase, hist, query_frame_idx, min_frame_gap: int = 30,
                 top_k: int = 5):
    """TF-IDF cosine query with temporal exclusion, sorted top-k.

    ≡ `bow_database::query` (`bow_database.cpp:51-130`): candidates within
    ``min_frame_gap`` frames of the query are excluded (recent neighbors are
    trivially similar), scores are cosine similarity of IDF-weighted
    histograms. Returns (scores (top_k,), frame_indices (top_k,), slots).
    """
    top_k = min(top_k, db.hist.shape[0])
    n_docs = jnp.maximum(jnp.sum(db.valid), 1).astype(jnp.float32)
    idf = jnp.log(jnp.maximum(n_docs / jnp.maximum(db.doc_freq, 1.0), 1.0))
    hq = hist * idf
    hq = hq / jnp.maximum(jnp.linalg.norm(hq), 1e-9)
    hd = db.hist * idf[None, :]
    hd = hd / jnp.maximum(jnp.linalg.norm(hd, axis=1, keepdims=True), 1e-9)
    scores = hd @ hq
    excl = (~db.valid) | (jnp.abs(db.frame_idx - query_frame_idx) < min_frame_gap)
    scores = jnp.where(excl, -1.0, scores)
    top_scores, slots = jax.lax.top_k(scores, top_k)
    return top_scores, db.frame_idx[slots], slots
