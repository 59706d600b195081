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
