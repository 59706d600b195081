"""Hierarchical binary vocabulary: training, transform, scoring.

TPU-native replacement for the vendored DBoW2
(/root/reference/Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h): the k-ary
tree of binary centroids is stored as dense per-level center arrays, descent
is a batched gather + Hamming argmin per level (no pointer chasing), and
BoW vectors are dense tf-idf weight vectors scored with one matmul-style L1
pass. The pretrained ORBvoc blob is absent from the reference snapshot
(SURVEY.md note), so vocabularies are trained here with hierarchical binary
k-means (bit-majority centroids — the Hamming-space mean, as DBoW2's
meanValue computes, FORB.h:38-47).

Default shape k=10, depth=4 (10^4 leaves) — smaller than ORBvoc's 10^6 but
ample for maps of a few hundred keyframes; both are configurable.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import hamming


class Vocabulary(NamedTuple):
    """Dense tree: level l has k^(l+1) nodes; centers[l] is (k^(l+1), 8).

    centers: tuple of per-level uint32 center arrays.
    weights: (n_words,) float32 idf word weights.
    k: branching factor (static).
    """
    centers: tuple
    weights: jnp.ndarray
    k: int

    @property
    def depth(self):
        return len(self.centers)

    @property
    def n_words(self):
        return self.centers[-1].shape[0]


def _majority(descs, weights=None):
    """Hamming-space centroid: per-bit (weighted) majority vote.
    descs: (N, 8) uint32 -> (8,) uint32."""
    bits = hamming.unpack_bits(descs)            # (N, 256) float
    if weights is None:
        s = jnp.sum(bits, axis=0)
        n = descs.shape[0]
        maj = (2.0 * s > n)
    else:
        s = jnp.sum(bits * weights[:, None], axis=0)
        maj = (2.0 * s > jnp.sum(weights))
    words = maj.reshape(8, 32).astype(jnp.uint32)
    return jnp.sum(words << jnp.arange(32, dtype=jnp.uint32), axis=-1) \
        .astype(jnp.uint32)


def train(descs, k: int = 10, depth: int = 4, iters: int = 8,
          seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-means over training descriptors (host-driven
    loop, device math). descs: (N, 8) uint32."""
    rng = np.random.default_rng(seed)
    descs = jnp.asarray(descs)
    N = descs.shape[0]
    assign = jnp.zeros(N, jnp.int32)      # node index at current level
    centers_all = []
    for level in range(depth):
        n_parent = k ** level
        new_centers = np.zeros((n_parent * k, 8), np.uint32)
        new_assign = np.asarray(assign).copy()
        d_np = np.asarray(descs)
        for p in range(n_parent):
            mask = np.asarray(assign) == p
            members = d_np[mask]
            if len(members) == 0:
                # empty branch: seed with random training descriptors
                members = d_np[rng.integers(0, N, k)]
            init_idx = rng.choice(len(members), size=min(k, len(members)),
                                  replace=False)
            c = members[init_idx]
            if len(c) < k:
                c = np.concatenate([c, members[rng.integers(0, len(members),
                                                            k - len(c))]])
            c = jnp.asarray(c)
            mj = jnp.asarray(members)
            for _ in range(iters):
                dist = hamming.hamming_matrix(mj, c)       # (M, k)
                a = jnp.argmin(dist, axis=1)
                c = jnp.stack([
                    _majority(jnp.where((a == j)[:, None], mj,
                                        jnp.zeros_like(mj)),
                              weights=(a == j).astype(jnp.float32))
                    for j in range(k)])
            dist = hamming.hamming_matrix(mj, c)
            a = np.asarray(jnp.argmin(dist, axis=1))
            new_centers[p * k:(p + 1) * k] = np.asarray(c)
            new_assign[mask] = p * k + a
        centers_all.append(jnp.asarray(new_centers))
        assign = jnp.asarray(new_assign)
    # idf weights from training distribution (reference TF_IDF weighting)
    n_words = k ** depth
    counts = np.bincount(np.asarray(assign), minlength=n_words)
    idf = np.log(N / np.maximum(counts, 1.0))
    idf[counts == 0] = 0.0
    return Vocabulary(centers=tuple(centers_all),
                      weights=jnp.asarray(idf, jnp.float32), k=k)


def transform(voc: Vocabulary, descs, valid=None):
    """Descriptors -> leaf word ids. (N, 8) uint32 -> (N,) int32."""
    N = descs.shape[0]
    k = voc.k
    node = jnp.zeros(N, jnp.int32)
    for level in range(voc.depth):
        cands = voc.centers[level][node[:, None] * k
                                   + jnp.arange(k)[None, :]]   # (N, k, 8)
        x = cands ^ descs[:, None, :]
        d = jnp.sum(jax.lax.population_count(x), axis=-1)      # (N, k)
        node = node * k + jnp.argmin(d, axis=1).astype(jnp.int32)
    if valid is not None:
        node = jnp.where(valid, node, -1)
    return node


def bow_vector(voc: Vocabulary, word_ids):
    """Word ids -> dense L1-normalized tf-idf BoW vector (n_words,)."""
    W = voc.n_words
    ok = word_ids >= 0
    w = jnp.zeros(W + 1, jnp.float32).at[
        jnp.where(ok, word_ids, W)].add(1.0)[:W]
    v = w * voc.weights
    n = jnp.sum(jnp.abs(v))
    return v / jnp.where(n < 1e-12, 1.0, n)


def l1_score(q, db):
    """L1 similarity of BoW vectors (reference DBoW2 L1Scoring:
    s = 1 - 0.5 |q - d|_1, both L1-normalized).

    q: (W,) or (B, W); db: (K, W). Returns (K,) or (B, K)."""
    qb = q if q.ndim == 2 else q[None]
    diff = jnp.sum(jnp.abs(qb[:, None, :] - db[None, :, :]), axis=-1)
    s = 1.0 - 0.5 * diff
    return s if q.ndim == 2 else s[0]
