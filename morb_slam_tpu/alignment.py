"""Closed-form point-set alignment: Umeyama / Horn similarity estimation.

Used three ways, mirroring the reference:
  * Sim3 hypothesis generation inside place recognition (reference
    src/Sim3Solver.cc ComputeSim3 — Horn 1987 closed form over 3-point samples),
  * trajectory evaluation ATE alignment (reference
    evaluation/evaluate_ate_scale.py:49 `align()`),
  * map-merge gauge estimation.

All functions are batched over leading dims and jit/vmap-safe; the SVD runs on
fixed 3x3 matrices so XLA handles it on TPU.
"""
from __future__ import annotations

import jax.numpy as jnp

from .lie import matmat, matvec


def umeyama(src, dst, weights=None, with_scale=True):
    """Least-squares similarity aligning src -> dst.

    Args:
      src, dst: (..., N, 3) corresponding points.
      weights: optional (..., N) nonnegative weights (masked points -> 0).
      with_scale: estimate scale s (Sim3) or fix s=1 (SE3).

    Returns:
      (s, R, t) with dst ~= s * R @ src + t.
        s: (...,), R: (..., 3, 3), t: (..., 3)
    """
    if weights is None:
        weights = jnp.ones(src.shape[:-1], src.dtype)
    w = weights / jnp.clip(jnp.sum(weights, axis=-1, keepdims=True), 1e-12, None)
    mu_s = jnp.sum(src * w[..., None], axis=-2)
    mu_d = jnp.sum(dst * w[..., None], axis=-2)
    sc = src - mu_s[..., None, :]
    dc = dst - mu_d[..., None, :]
    # covariance dst^T W src  (3x3)
    cov = jnp.einsum('...ni,...n,...nj->...ij', dc, w, sc,
                     precision='highest')
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(matmat(U, Vt))
    d = jnp.ones_like(S).at[..., 2].set(jnp.sign(det))
    R = matmat(U, d[..., :, None] * Vt)
    var_s = jnp.sum(w * jnp.sum(sc * sc, axis=-1), axis=-1)
    if with_scale:
        s = jnp.sum(S * d, axis=-1) / jnp.clip(var_s, 1e-12, None)
    else:
        s = jnp.ones_like(var_s)
    t = mu_d - s[..., None] * matvec(R, mu_s)
    return s, R, t


def ate_rmse(est, gt, with_scale=False, weights=None):
    """RMS absolute trajectory error after Umeyama alignment.

    Port of the evaluation protocol in reference
    evaluation/evaluate_ate_scale.py:49-101 (Horn alignment, optional scale for
    monocular gauge freedom).

    Args:
      est, gt: (N, 3) associated positions.
    Returns:
      (rmse, s, R, t): scalar error and the alignment applied to `est`.
    """
    s, R, t = umeyama(est, gt, weights=weights, with_scale=with_scale)
    aligned = s * matvec(R, est) + t
    err2 = jnp.sum((aligned - gt) ** 2, axis=-1)
    if weights is not None:
        w = weights / jnp.clip(jnp.sum(weights), 1e-12, None)
        rmse = jnp.sqrt(jnp.sum(err2 * w))
    else:
        rmse = jnp.sqrt(jnp.mean(err2))
    return rmse, s, R, t
