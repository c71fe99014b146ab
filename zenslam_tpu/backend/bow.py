"""Bag-of-binary-words place recognition: vocabulary + TF-IDF database.

Parity targets:
- vocabulary build (hierarchical k-means tree, levels^branching leaves,
  defaults 6/10 → 10⁶ words) ≡ `place_recognition/bow_vocabulary.cpp:54-142`
  — HERE redesigned as a TWO-level tree of matmuls: a branch-B level-1
  codebook plus B per-cluster level-2 codebooks (B² leaves, default 64² =
  4096 words). Quantization is two chained Hamming-matmul argmins — still
  MXU food, no pointer descent (cf. the FLANN-vs-brute discussion in
  ops/match.py). Two levels of 64 reach the word-count regime where TF-IDF
  discrimination works for trajectory-scale corpora; the reference's 10⁶
  leaves exist to index city-scale image sets and would be 99.9% empty at
  SLAM-run corpus sizes (64 keyframes × 256 descriptors = 16k descriptors).
  A flat single-level codebook (`build_vocabulary`) remains for small
  configs and tests.
- vocabulary save/load ≡ `bow_vocabulary.cpp:275-327` (YAML there, .npz
  here: `save_vocabulary` / `load_vocabulary`).
- TF-IDF weighting + inverted-index query with temporal exclusion & top-k
  ≡ `place_recognition/bow_database.cpp:22-130,205-240` — the "inverted
  index" is a dense (frames, words) histogram matrix: cosine scores for ALL
  stored frames are one matvec.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Union

import jax
import jax.numpy as jnp

from zenslam_tpu.ops.match import unpack_bits


class Vocabulary(NamedTuple):
    """Two-level hierarchical codebook (branch B → B² leaf words).

    Centers are UNPACKED float bits (the Hamming matmul operand). ``l2[c]``
    rows of an empty level-1 cluster are all-zero — such clusters only win a
    level-1 argmin for descriptors that were in them during training, so the
    zero children never corrupt quantization of real data.
    """

    l1: jnp.ndarray   # (B, 256) float {0,1}
    l2: jnp.ndarray   # (B, B, 256) float {0,1}

    @property
    def n_words(self) -> int:
        return self.l1.shape[0] * self.l2.shape[1]


def _kmeans_bits(key, bits, weight, n_words: int, iters: int):
    """Weighted binary k-means over UNPACKED bit rows.

    ``weight`` is a float (N,) membership weight (0 excludes a row). Centers
    are bit-majority votes, kept float for the Hamming matmul. Empty clusters
    are re-seeded from random member rows; a fully empty corpus yields
    all-zero centers.
    """
    has_any = jnp.sum(weight) > 0
    logits = jnp.where(weight > 0, 0.0, -jnp.inf)
    logits = jnp.where(has_any, logits, 0.0)  # categorical needs ≥1 finite
    key, k0 = jax.random.split(key)
    seed_idx = jax.random.categorical(k0, logits, shape=(n_words,))
    centers = bits[seed_idx] * has_any

    def step(carry, k):
        centers = carry
        # hamming distance to float centers: sum |b - c| == (1-b)c + b(1-c)
        d = (bits @ (1.0 - 2.0 * centers.T)) + jnp.sum(centers, -1)[None, :]
        a = jnp.argmin(jnp.where(weight[:, None] > 0, d, jnp.inf), axis=1)
        onehot = jax.nn.one_hot(a, n_words, dtype=jnp.float32) * weight[:, None]
        counts = jnp.sum(onehot, axis=0)                      # (n_words,)
        sums = onehot.T @ bits                                # (n_words, 256)
        mean = sums / jnp.maximum(counts[:, None], 1.0)
        new_centers = (mean > 0.5).astype(jnp.float32)        # bit-majority
        # re-seed empties
        reseed = jax.random.categorical(k, logits, shape=(n_words,))
        new_centers = jnp.where((counts > 0)[:, None], new_centers,
                                bits[reseed] * has_any)
        return new_centers, None

    keys = jax.random.split(key, iters)
    centers, _ = jax.lax.scan(step, centers, keys)
    return centers


@functools.partial(jax.jit, static_argnames=("n_words", "iters"))
def build_vocabulary(key, descriptors, valid, n_words: int = 256, iters: int = 8):
    """Flat binary k-means over packed 256-bit descriptors.

    Returns codebook as UNPACKED float bits (n_words, 256). The single-level
    variant — `build_vocabulary_tree` is the reference-grade hierarchical one.
    """
    bits = unpack_bits(descriptors)  # (N, 256) {0,1}
    return _kmeans_bits(key, bits, valid.astype(jnp.float32), n_words, iters)


@functools.partial(jax.jit, static_argnames=("branch", "iters"))
def build_vocabulary_tree(key, descriptors, valid, branch: int = 64,
                          iters: int = 6) -> Vocabulary:
    """Two-level hierarchical binary k-means: branch² leaf words.

    ≡ the recursive `build_recursive` (`bow_vocabulary.cpp:54-142`) collapsed
    to two levels of batched matmul k-means: level 1 clusters the whole
    corpus into ``branch`` cells; level 2 runs one masked k-means per cell —
    all cells at once via vmap (the recursion is embarrassingly parallel).
    """
    bits = unpack_bits(descriptors)
    w = valid.astype(jnp.float32)
    k1, k2 = jax.random.split(key)
    l1 = _kmeans_bits(k1, bits, w, branch, iters)
    # final level-1 assignment -> per-cell membership weights
    d = (bits @ (1.0 - 2.0 * l1.T)) + jnp.sum(l1, -1)[None, :]
    a1 = jnp.argmin(jnp.where(valid[:, None], d, jnp.inf), axis=1)
    member = jax.nn.one_hot(a1, branch, dtype=jnp.float32) * w[:, None]  # (N, B)
    keys = jax.random.split(k2, branch)
    l2 = jax.vmap(lambda k, wc: _kmeans_bits(k, bits, wc, branch, iters))(
        keys, member.T)
    return Vocabulary(l1=l1, l2=l2)


def _quantize_tree(vocab: Vocabulary, bits, valid):
    """(N, 256) bit rows -> word ids under the two-level tree.

    Two chained argmin-matmuls ≡ the tree descent `descriptor_to_word`
    (`bow_vocabulary.cpp:183-235`)."""
    l1, l2 = vocab.l1, vocab.l2
    B = l1.shape[0]
    d1 = (bits @ (1.0 - 2.0 * l1.T)) + jnp.sum(l1, -1)[None, :]
    c1 = jnp.argmin(d1, axis=1)                               # (N,)
    child = l2[c1]                                            # (N, B, 256)
    d2 = jnp.sum(child, -1) + jnp.einsum(
        "nc,nbc->nb", bits, 1.0 - 2.0 * child)                # (N, B)
    c2 = jnp.argmin(d2, axis=1)
    return c1.astype(jnp.int32) * B + c2.astype(jnp.int32)


@jax.jit
def _bow_tree(vocab: Vocabulary, descriptors, valid):
    bits = unpack_bits(descriptors)
    word = _quantize_tree(vocab, bits, valid)
    n_words = vocab.l1.shape[0] * vocab.l2.shape[1]
    hist = jnp.zeros(n_words, jnp.float32).at[word].add(valid.astype(jnp.float32))
    norm = jnp.linalg.norm(hist)
    return hist / jnp.where(norm < 1e-9, 1.0, norm)


@jax.jit
def _bow_flat(codebook, descriptors, valid):
    bits = unpack_bits(descriptors)
    d = (bits @ (1.0 - 2.0 * codebook.T)) + jnp.sum(codebook, -1)[None, :]
    word = jnp.argmin(d, axis=1)
    n_words = codebook.shape[0]
    hist = jnp.zeros(n_words, jnp.float32).at[word].add(valid.astype(jnp.float32))
    norm = jnp.linalg.norm(hist)
    return hist / jnp.where(norm < 1e-9, 1.0, norm)


def descriptors_to_bow(codebook: Union[Vocabulary, jnp.ndarray],
                       descriptors, valid):
    """Packed descriptors -> L2-normalized word histogram (n_words,).

    ≡ `descriptor_to_word` + histogram build (`bow_vocabulary.cpp:183-235`).
    Accepts either a flat (n_words, 256) codebook or a hierarchical
    :class:`Vocabulary`."""
    if isinstance(codebook, Vocabulary):
        return _bow_tree(codebook, descriptors, valid)
    return _bow_flat(codebook, descriptors, valid)


def save_vocabulary(path: str, vocab: Union[Vocabulary, jnp.ndarray]) -> None:
    """Persist a vocabulary (≡ `bow_vocabulary::save`, `bow_vocabulary.cpp:
    275-305` — YAML there, .npz here)."""
    import numpy as np

    if isinstance(vocab, Vocabulary):
        np.savez(path, kind="tree", l1=np.asarray(vocab.l1),
                 l2=np.asarray(vocab.l2))
    else:
        np.savez(path, kind="flat", codebook=np.asarray(vocab))


def load_vocabulary(path: str) -> Union[Vocabulary, jnp.ndarray]:
    """≡ `bow_vocabulary::load` (`bow_vocabulary.cpp:307-327`; unlike the
    reference's partially-stubbed load, this round-trips exactly)."""
    import numpy as np

    with np.load(path, allow_pickle=False) as d:
        if str(d["kind"]) == "tree":
            return Vocabulary(l1=jnp.asarray(d["l1"]), l2=jnp.asarray(d["l2"]))
        return jnp.asarray(d["codebook"])


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
