"""Batched-hypothesis RANSAC harness.

TPU-native re-expression of the reference's incremental RANSAC loops
(Sim3Solver::iterate /root/reference/src/Sim3Solver.cc, MLPnPsolver::iterate,
TwoViewReconstruction RANSAC): instead of data-dependent early exit, a fixed
budget of hypotheses is fitted and scored entirely in parallel with vmap —
the classic trade of a bit more FLOPs for a single compiled program with no
host round trips.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_indices(key, n_hyp: int, k: int, n: int, valid):
    """(n_hyp, k) int32 index samples drawn from valid entries.

    Sampling is with-replacement across hypotheses, approximately without
    replacement inside a hypothesis (Gumbel top-k over valid mask).
    """
    g = jax.random.gumbel(key, (n_hyp, n))
    g = jnp.where(valid[None, :], g, -jnp.inf)
    _, idx = jax.lax.top_k(g, k)
    return idx


def run(key, fit_fn, score_fn, n_hyp: int, k: int, valid):
    """Generic batched RANSAC.

    Args:
      fit_fn: (idx (k,)) -> model pytree (vmapped over hypotheses).
      score_fn: model -> (score (), inlier_mask (n,)) (vmapped).
      n_hyp: number of hypotheses; k: sample size; valid: (n,) bool.

    Returns:
      (best_model, best_score, best_inliers, all_scores)
    """
    n = valid.shape[0]
    idx = sample_indices(key, n_hyp, k, n, valid)
    models = jax.vmap(fit_fn)(idx)
    scores, inliers = jax.vmap(score_fn)(models)
    best = jnp.argmax(scores)
    best_model = jax.tree.map(lambda x: x[best], models)
    return best_model, scores[best], inliers[best], scores
