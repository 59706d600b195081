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


def _np_popcount32(x):
    """Vectorized popcount for uint32 arrays (SWAR bithack — the same
    trick as the reference's DescriptorDistance, ORBmatcher.cc:1880)."""
    x = x.astype(np.uint32)
    x = x - ((x >> np.uint32(1)) & np.uint32(0x55555555))
    x = (x & np.uint32(0x33333333)) + \
        ((x >> np.uint32(2)) & np.uint32(0x33333333))
    x = (x + (x >> np.uint32(4))) & np.uint32(0x0F0F0F0F)
    return ((x * np.uint32(0x01010101)) >> np.uint32(24)).astype(np.int32)


def _np_majority(members, weights):
    """Weighted per-bit majority vote -> (8,) uint32 (numpy)."""
    bits = np.unpackbits(
        members.astype(np.uint32).view(np.uint8), axis=1, bitorder="little"
    ).astype(np.float32)                                    # (M, 256)
    s = bits.T @ weights
    maj = (2.0 * s > np.sum(weights)).astype(np.uint8)
    return np.packbits(maj, bitorder="little").view(np.uint32)


def train(descs, k: int = 10, depth: int = 4, iters: int = 8,
          seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-means over training descriptors. Pure-numpy
    host math: this is an offline tool, and a device-looped version costs
    thousands of tiny dispatches (minutes over a remote-chip link) for
    work numpy finishes in well under a second. descs: (N, 8) uint32."""
    rng = np.random.default_rng(seed)
    d_np = np.asarray(descs, np.uint32)
    N = d_np.shape[0]
    assign = np.zeros(N, np.int64)        # node index at current level
    centers_all = []
    for level in range(depth):
        n_parent = k ** level
        new_centers = np.zeros((n_parent * k, 8), np.uint32)
        new_assign = assign.copy()
        for p in range(n_parent):
            mask = assign == p
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
            for _ in range(iters):
                dist = _np_popcount32(
                    members[:, None, :] ^ c[None, :, :]).sum(-1)  # (M, k)
                a = np.argmin(dist, axis=1)
                c = np.stack([
                    _np_majority(members, (a == j).astype(np.float32))
                    for j in range(k)])
            dist = _np_popcount32(
                members[:, None, :] ^ c[None, :, :]).sum(-1)
            a = np.argmin(dist, axis=1)
            new_centers[p * k:(p + 1) * k] = c
            new_assign[mask] = p * k + a
        centers_all.append(jnp.asarray(new_centers))
        assign = new_assign
    # idf weights from training distribution (reference TF_IDF weighting)
    n_words = k ** depth
    counts = np.bincount(assign, minlength=n_words)
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


# ---------------------------------------------------------------------------
# ORBvoc text-format interchange (reference DBoW2 TemplatedVocabulary
# loadFromTextFile / saveToTextFile, TemplatedVocabulary.h:1338-1430):
# header "k L scoring weighting", then one node per line
# "parent_id is_leaf b0 .. b31 weight" in creation order (root implicit).
# ---------------------------------------------------------------------------

def _bytes_to_u32(b):
    """(N, 32) uint8 descriptor bytes -> (N, 8) uint32 (little-endian)."""
    b = np.ascontiguousarray(b, np.uint8)
    return b.view("<u4").reshape(b.shape[0], 8)


def _u32_to_bytes(w):
    """(N, 8) uint32 -> (N, 32) uint8 (little-endian)."""
    return np.ascontiguousarray(np.asarray(w, "<u4")).view(np.uint8) \
        .reshape(-1, 32)


def load_orbvoc_text(path: str) -> Vocabulary:
    """Import a reference-format vocabulary (ORBvoc.txt and anything
    DBoW2's saveToTextFile produces) into the dense-array Vocabulary.

    The DBoW2 tree may be INCOMPLETE (clusters smaller than k terminate a
    branch early). The dense complete tree reproduces its descent exactly:
      * a parent's missing children are filled with a copy of its first
        real child's center — at equal distance argmin picks the lower
        index, so a filled copy is never selected;
      * an early leaf is propagated to the bottom level through a chain of
        self-copies (descent through identical centers stays on child 0),
        and its word weight lands at the chain's bottom position.
    Word ids are positional (not DBoW2's creation-order ids) — BoW vectors
    are internal, only self-consistency matters."""
    with open(path) as f:
        header = f.readline().split()
        k, depth = int(header[0]), int(header[1])
        parents, leaf_flags, byte_rows, wts_in = [], [], [], []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parents.append(int(parts[0]))
            leaf_flags.append(int(parts[1]) > 0)
            byte_rows.append([int(float(x)) for x in parts[2:34]])
            wts_in.append(float(parts[34]))
    n = len(parents)
    if n == 0:
        raise ValueError(f"{path}: no vocabulary nodes")
    desc_u32 = np.zeros((n + 1, 8), np.uint32)
    desc_u32[1:] = _bytes_to_u32(np.asarray(byte_rows, np.uint8))
    node_w = np.zeros(n + 1, np.float32)
    node_w[1:] = np.asarray(wts_in, np.float32)
    children = {}
    for i, p in enumerate(parents):
        children.setdefault(p, []).append(i + 1)   # ids 1..n, root = 0

    centers = [np.zeros((k ** (l + 1), 8), np.uint32)
               for l in range(depth)]
    frontier = [(0, 0)]                            # (node id, position)
    for l in range(depth):
        C = centers[l]
        nxt = []
        for node, p in frontier:
            ch = children.get(node, [])[:k]
            if ch:
                for s_i, c_id in enumerate(ch):
                    C[p * k + s_i] = desc_u32[c_id]
                    nxt.append((c_id, p * k + s_i))
                for s_i in range(len(ch), k):
                    C[p * k + s_i] = desc_u32[ch[0]]
            else:
                # early leaf: self-copy chain down to the word level
                for s_i in range(k):
                    C[p * k + s_i] = desc_u32[node]
                nxt.append((node, p * k))
        frontier = nxt
    weights = np.zeros(k ** depth, np.float32)
    for node, p in frontier:
        weights[p] = node_w[node]
    return Vocabulary(centers=tuple(jnp.asarray(c) for c in centers),
                      weights=jnp.asarray(weights), k=k)


def save_orbvoc_text(voc: Vocabulary, path: str):
    """Export the dense vocabulary in the reference text format (DBoW2
    saveToTextFile layout; scoring=0 L1, weighting=0 TF-IDF)."""
    k, depth = voc.k, voc.depth
    lines = [f"{k} {depth} 0 0"]
    # ids in emission order: level by level, position-major (root = 0)
    next_id = 1
    id_of = {(-1, 0): 0}
    for l in range(depth):
        C = _u32_to_bytes(np.asarray(voc.centers[l]))
        w_leaf = np.asarray(voc.weights)
        for p in range(voc.centers[l].shape[0]):
            id_of[(l, p)] = next_id
            next_id += 1
            parent = id_of[(l - 1, p // k)]
            is_leaf = 1 if l == depth - 1 else 0
            w = float(w_leaf[p]) if is_leaf else 0.0
            byte_s = " ".join(str(int(b)) for b in C[p])
            lines.append(f"{parent} {is_leaf} {byte_s} {w:.6f}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
