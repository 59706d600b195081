"""Batched RANSAC Sim(3) estimation between two matched 3D point sets.

Replaces the reference's Sim3Solver (/root/reference/src/Sim3Solver.cc):
Horn's closed form (via Umeyama SVD) on 3-point samples, scored by two-sided
reprojection error in both cameras, all hypotheses in parallel. Fixed-scale
mode supports stereo/RGB-D (reference bFixScale).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import alignment, lie
from . import ransac


class Sim3Result(NamedTuple):
    s: jnp.ndarray
    R: jnp.ndarray         # maps points of KF2 frame -> KF1 frame
    t: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray


def solve_sim3(key, X1, X2, x1, x2, valid, focal: float, fix_scale: bool,
               th2_px: float = 9.21, n_hyp: int = 128) -> Sim3Result:
    """Estimate (s, R, t) with X1 ~ s R X2 + t.

    Args:
      X1, X2: (N, 3) matched map points in the two KF camera frames.
      x1, x2: (N, 2) normalized image observations in cameras 1, 2.
      valid: (N,) bool; focal: px; th2_px: chi2 gate (reference uses 9.21
        on 2-dof at 99%; Sim3Solver::CheckInliers).
    """
    th2 = th2_px / focal ** 2

    def fit(idx):
        s, R, t = alignment.umeyama(X2[idx], X1[idx],
                                    with_scale=not fix_scale)
        return s, R, t

    def score(model):
        s, R, t = model
        # project X2 into camera 1 via the hypothesis, X1 into camera 2 inverse
        X2in1 = s * lie.matvec(R, X2) + t
        si, Ri, ti = lie.sim3_inv(s, R, t)
        X1in2 = si * lie.matvec(Ri, X1) + ti

        def reproj_err(Xc, obs):
            z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-12, 1e-12, Xc[:, 2])
            e = Xc[:, :2] / z[:, None] - obs
            return jnp.sum(e * e, axis=-1)

        e1 = reproj_err(X2in1, x1)
        e2 = reproj_err(X1in2, x2)
        inl = (e1 < th2) & (e2 < th2) & valid
        return jnp.sum(inl), inl

    model, n_inl, inl, _ = ransac.run(key, fit, score, n_hyp, 3, valid)
    s, R, t = model
    s = jnp.where(fix_scale, 1.0, s)
    return Sim3Result(s=s, R=R, t=t, inliers=inl, n_inliers=n_inl)
