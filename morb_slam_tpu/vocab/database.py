"""Keyframe place-recognition database: dense BoW matrix + batched scoring.

TPU-native replacement for the reference's KeyFrameDatabase inverted index
(/root/reference/src/KeyFrameDatabase.cc): at a few hundred keyframes a
dense (K, n_words) BoW matrix scored with one vectorized L1 pass beats an
inverted file — no word lists, no accumulation loops
(DetectLoopCandidates' shared-word counting, cc:143, falls out of the same
arithmetic).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import tree


class KeyframeDatabase(NamedTuple):
    bow: jnp.ndarray      # (K, W) float32 L1-normalized tf-idf
    valid: jnp.ndarray    # (K,) bool


def empty(max_kf: int, n_words: int) -> KeyframeDatabase:
    return KeyframeDatabase(bow=jnp.zeros((max_kf, n_words), jnp.float32),
                            valid=jnp.zeros(max_kf, bool))


def add_keyframe(db: KeyframeDatabase, kf_id, bow) -> KeyframeDatabase:
    return KeyframeDatabase(bow=db.bow.at[kf_id].set(bow),
                            valid=db.valid.at[kf_id].set(True))


def query(db: KeyframeDatabase, bow_q, exclude=None):
    """Scores of a query BoW against all stored keyframes.

    exclude: optional (K,) bool — keyframes to suppress (e.g. the covisible
    group for loop detection, reference DetectNBestCandidates semantics).
    Returns (K,) float32 scores in [0, 1], -1 where invalid/excluded.
    """
    s = tree.l1_score(bow_q, db.bow)
    ok = db.valid if exclude is None else (db.valid & ~exclude)
    return jnp.where(ok, s, -1.0)


def top_candidates(db: KeyframeDatabase, bow_q, n: int, exclude=None,
                   min_score: float = 0.0):
    """Top-n candidate keyframes (reference DetectNBestCandidates,
    KeyFrameDatabase.h:74). Returns (ids (n,), scores (n,), ok (n,))."""
    s = query(db, bow_q, exclude)
    vals, ids = jax.lax.top_k(s, n)
    return ids, vals, vals > min_score


def top_candidates_grouped(db: KeyframeDatabase, bow_q, n: int, covis,
                           exclude=None, min_score: float = 0.0):
    """Covisibility-group accumulated candidate scoring (reference
    KeyFrameDatabase::DetectNBestCandidates, KeyFrameDatabase.cc:143-198):

      * only keyframes sharing > 0.8 * maxCommonWords words with the query
        are candidates (the shared-word prefilter);
      * each candidate's GROUP score accumulates the scores of its top-10
        covisible neighbors that are also candidates — a true loop revisit
        lights up a whole covisible cluster, while perceptual aliasing
        lights up isolated keyframes;
      * groups below 0.75 * bestAccScore are dropped, and each retained
        group is represented by its best-scoring member.

    `covis` is the (K, K) covisibility weight matrix of the map the
    database indexes. Returns (ids (n,), scores (n,), ok (n,)) where
    scores are the winners' OWN L1 scores (for absolute gating)."""
    K = db.bow.shape[0]
    s = tree.l1_score(bow_q, db.bow)                       # (K,)
    ok = db.valid if exclude is None else (db.valid & ~exclude)
    shared = jnp.sum((db.bow > 0) & (bow_q > 0)[None, :], axis=1)
    max_shared = jnp.max(jnp.where(ok, shared, 0))
    cand = ok & (shared > 0.8 * max_shared) & (shared > 0)
    # accumulate EXCESS score over the map's baseline similarity, not raw
    # score: with a compact vocabulary every keyframe scores ~0.5 against
    # everything, and a raw-sum group score degenerates into a cluster-SIZE
    # contest that outvotes the true revisit (the reference's 1M-word
    # vocabulary makes raw scores near zero away from the revisit, so its
    # raw sum is implicitly baseline-free)
    n_ok = jnp.sum(ok)
    s_base = jnp.sum(jnp.where(ok, s, 0.0)) / jnp.clip(n_ok, 1, None)
    sc = jnp.where(cand, jnp.maximum(s - s_base, 0.0), 0.0)

    G = min(10, K)
    w_nb, nb = jax.lax.top_k(covis, G)                     # (K, G)
    nb_ok = (w_nb > 0) & cand[nb]
    sc_nb = jnp.where(nb_ok, sc[nb], 0.0)                  # (K, G)
    acc = sc + jnp.sum(sc_nb, axis=1)                      # group score
    # best member of each group (self vs neighbors)
    nb_best_pos = jnp.argmax(sc_nb, axis=1)
    nb_best_val = jnp.take_along_axis(sc_nb, nb_best_pos[:, None],
                                      axis=1)[:, 0]
    self_wins = sc >= nb_best_val
    best_id = jnp.where(
        self_wins, jnp.arange(K),
        jnp.take_along_axis(nb, nb_best_pos[:, None], axis=1)[:, 0])
    acc = jnp.where(cand, acc, -1.0)
    retained = cand & (acc >= 0.75 * jnp.max(acc))
    # per-KF winner score: the best group score among groups it represents
    winner = jax.ops.segment_max(
        jnp.where(retained, acc, -1.0),
        jnp.where(retained, best_id, K), num_segments=K + 1)[:K]
    winner = jnp.maximum(winner, -1.0)
    vals, ids = jax.lax.top_k(winner, n)
    return ids, s[ids], (vals > 0) & (s[ids] > min_score)


def top_candidates_sharded(db: KeyframeDatabase, bow_q, n: int, mesh,
                           exclude=None, min_score: float = 0.0,
                           axis: str = "kf"):
    """Multi-device place-recognition scoring: the (K, n_words) BoW matrix
    is sharded by KEYFRAME BLOCKS across the mesh (the BASELINE's "keyframe
    blocks sharded per host"); each device scores its block and the per-
    device top-n merge via one all-gather of n scores+ids per device.

    `mesh` is a 1-D Mesh whose axis is named `axis`. K must divide the
    mesh size (pad the database capacity accordingly)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    K = db.bow.shape[0]
    n_dev = mesh.devices.size
    assert K % n_dev == 0, (K, n_dev)
    exc = jnp.zeros(K, bool) if exclude is None else exclude

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis), P(axis), P()),
             out_specs=(P(axis), P(axis)))
    def local_top(bow_block, valid_block, exc_block, q):
        s = tree.l1_score(q, bow_block)
        s = jnp.where(valid_block & ~exc_block, s, -1.0)
        vals, ids = jax.lax.top_k(s, n)
        blk = jax.lax.axis_index(axis)
        return vals, ids + blk * (K // n_dev)

    vals, ids = local_top(db.bow, db.valid, exc, bow_q)   # (n_dev*n,) each
    best, sel = jax.lax.top_k(vals, n)
    return ids[sel], best, best > min_score
