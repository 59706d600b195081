"""Batched RANSAC PnP: camera pose from 3D-2D correspondences.

Replaces the reference's MLPnPsolver (/root/reference/src/MLPnPsolver.cpp,
used only by Tracking::Relocalization, Tracking.cc:3384-3412). Behavior-parity
target is relocalization success, not algorithm identity (SURVEY.md B2): each
RANSAC hypothesis fits a 6-point DLT projection matrix whose rotation block is
re-orthonormalized (Procrustes), scored by reprojection inliers; the winner is
then refined by the motion-only BA of optim/ (as the reference refines with
PoseOptimization).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import ransac


class PnPResult(NamedTuple):
    R: jnp.ndarray         # (3, 3) world -> camera
    t: jnp.ndarray         # (3,)
    inliers: jnp.ndarray   # (N,) bool
    n_inliers: jnp.ndarray


def _normalize_3d(X, w):
    """Weighted centering + isotropic scaling of world points; returns
    (X_norm, S (4,4)) with X_norm_h = S X_h (Hartley conditioning for DLT)."""
    wsum = jnp.clip(jnp.sum(w), 1e-9, None)
    mu = jnp.sum(X * w[:, None], axis=0) / wsum
    d = X - mu
    mean_norm = jnp.sum(jnp.linalg.norm(d, axis=-1) * w) / wsum
    s = jnp.sqrt(3.0) / jnp.clip(mean_norm, 1e-9, None)
    S = jnp.eye(4, dtype=X.dtype) * s
    S = S.at[3, 3].set(1.0).at[:3, 3].set(-s * mu)
    return d * s, S


def _fit_dlt(X, x, w=None):
    """6+ points: X (k, 3) world, x (k, 2) normalized -> (R, t).
    Optional weights enable masked all-inlier refits."""
    k = X.shape[0]
    if w is None:
        w = jnp.ones(k, X.dtype)
    Xn, S = _normalize_3d(X, w)
    zeros = jnp.zeros((k, 4), X.dtype)
    Xh = jnp.concatenate([Xn, jnp.ones((k, 1), X.dtype)], axis=-1)
    r1 = jnp.concatenate([Xh, zeros, -x[:, 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)            # (2k, 12)
    A = A * jnp.concatenate([w, w])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    P = Vt[-1, :].reshape(3, 4) @ S                  # denormalize
    M = P[:, :3]
    # sign: points must be in front of the camera
    depths = lie.matvec(M, X) + P[:, 3]
    sgn = jnp.sign(jnp.sum(jnp.sign(depths[:, 2])))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    P = P * sgn
    M = P[:, :3]
    # Procrustes: nearest rotation to M, with scale recovered for t
    U, S, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(lie.matmat(U, Vt))
    d = jnp.asarray([1.0, 1.0, 0.0], X.dtype).at[2].set(det)
    R = lie.matmat(U, d[:, None] * Vt)
    scale = jnp.sum(S * d) / 3.0
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    return R, t


def _score(model, X, x, valid, th2):
    R, t = model
    Xc = lie.matvec(R, X) + t
    z = Xc[:, 2]
    zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    e = Xc[:, :2] / zs[:, None] - x
    err2 = jnp.sum(e * e, axis=-1)
    inl = (err2 < th2) & (z > 0) & valid
    return jnp.sum(inl), inl


def solve_pnp(key, X, x, valid, focal: float, sigma_px: float = 1.0,
              n_hyp: int = 256, chi2_th: float = 5.991) -> PnPResult:
    """RANSAC PnP over fixed-capacity correspondence arrays.

    Args:
      X: (N, 3) world points; x: (N, 2) normalized image coords.
      valid: (N,) bool; focal: px focal length for thresholding.
    """
    th2 = chi2_th * sigma_px ** 2 / focal ** 2

    def fit(idx):
        return _fit_dlt(X[idx], x[idx])

    # 8-point samples: minimal 6-point DLT amplifies pixel noise too much
    model, n_inl, inl, _ = ransac.run(
        key, fit, lambda m: _score(m, X, x, valid, th2), n_hyp, 8, valid)
    # all-inlier refit, two rounds (recovers the full inlier set that a
    # noisy minimal-sample model misses)
    for _ in range(2):
        model = _fit_dlt(X, x, w=inl.astype(X.dtype))
        n_inl, inl = _score(model, X, x, valid, th2)
    R, t = model
    return PnPResult(R=R, t=t, inliers=inl, n_inliers=n_inl)
