"""Motion-only pose optimization: the per-frame hot path.

TPU-native replacement for the reference's Optimizer::PoseOptimization
(/root/reference/src/Optimizer.cc:762): Gauss-Newton on one SE(3) pose with
all reprojection residuals batched, Huber-robustified, and the reference's
4-round optimize-and-reclassify outlier schedule (chi2 gates 5.991 mono /
7.815 stereo) folded into a fixed-iteration compiled loop.

Pose convention: T_cw (world -> camera), residuals in normalized image
coordinates, information = focal^2 / sigma^2 per observation so the chi2
gates keep their pixel-unit meaning. Updates are left-composed:
T <- exp(dx) T, dx = [rho, phi].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import linalg as tpu_linalg
from .robust import huber_weight

CHI2_MONO = 5.991
CHI2_STEREO = 7.815
HUBER_MONO = jnp.sqrt(5.991)
HUBER_STEREO = jnp.sqrt(7.815)


class PoseOptResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    inliers: jnp.ndarray      # (N,) bool — final chi2 classification
    n_inliers: jnp.ndarray
    chi2: jnp.ndarray         # (N,) final per-obs chi2 (pixel^2 units)


def _residuals_mono(R, t, Xw, obs):
    """(N,) observations in normalized coords -> residual (N, 2), depth (N,)."""
    Xc = lie.se3_apply(R, t, Xw)
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    r = Xc[..., :2] / zs[..., None] - obs
    return r, Xc


def _jacobian_mono(Xc):
    """d(residual)/d(dx) for left-composed se3 update, (N, 2, 6)."""
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    # d r / d Xc
    J_pt = jnp.stack([
        jnp.stack([iz, zero, -x * iz2], axis=-1),
        jnp.stack([zero, iz, -y * iz2], axis=-1),
    ], axis=-2)                                     # (N, 2, 3)
    # d Xc / d dx = [I | -hat(Xc)]
    J_se3 = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3)),
         -lie.so3_hat(Xc)], axis=-1)                # (N, 3, 6)
    return jnp.einsum('...ij,...jk->...ik', J_pt, J_se3)


def optimize_pose(R0, t0, Xw, obs, info, valid, obs_ur=None, baseline=0.0,
                  n_rounds: int = 4, n_iters: int = 10):
    """Motion-only BA.

    Args:
      R0, t0: initial T_cw.
      Xw: (N, 3) world points (fixed).
      obs: (N, 2) normalized image observations.
      info: (N,) information = (focal/sigma)^2 per observation (level-scaled
        like the reference's invSigma2 per octave).
      valid: (N,) bool.
      obs_ur: optional (N,) normalized right-image u for stereo observations
        (NaN/ignored where mono); baseline: stereo baseline in meters.
      n_rounds/n_iters: reclassification rounds x GN iterations (reference
        its=[10,10,10,10], Optimizer.cc:858).

    Returns PoseOptResult.
    """
    has_stereo = obs_ur is not None
    if not has_stereo:
        obs_ur = jnp.full(obs.shape[0], jnp.nan, obs.dtype)
    is_stereo = jnp.isfinite(obs_ur)
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta2 = jnp.where(is_stereo, 7.815, 5.991)

    def gn_step(R, t, active):
        r2, Xc = _residuals_mono(R, t, Xw, obs)
        z = Xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        r_ur = (Xc[..., 0] - baseline) / zs - jnp.nan_to_num(obs_ur)
        r_ur = jnp.where(is_stereo, r_ur, 0.0)
        J2 = _jacobian_mono(Xc)                      # (N, 2, 6)
        # stereo third row
        x = Xc[..., 0]
        iz = 1.0 / zs
        iz2 = iz * iz
        zero = jnp.zeros_like(z)
        Jr_pt = jnp.stack([iz, zero, -(x - baseline) * iz2], axis=-1)  # (N,3)
        J_se3 = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype),
                              Xc.shape[:-1] + (3, 3)),
             -lie.so3_hat(Xc)], axis=-1)
        Jr = jnp.einsum('...j,...jk->...k', Jr_pt, J_se3)  # (N, 6)

        chi2 = (jnp.sum(r2 * r2, axis=-1) + r_ur * r_ur) * info
        w_rob = huber_weight(chi2, delta2)
        w = info * w_rob * active
        # behind-camera observations contribute nothing
        w = jnp.where(z > 0, w, 0.0)

        H = (jnp.einsum('nia,n,nib->ab', J2, w, J2, precision='highest')
             + jnp.einsum('na,n,nb->ab', Jr, w * is_stereo, Jr,
                          precision='highest'))
        g = (jnp.einsum('nia,n,ni->a', J2, w, r2, precision='highest')
             + jnp.einsum('na,n,n->a', Jr, w * is_stereo, r_ur,
                          precision='highest'))
        H = H + 1e-6 * jnp.eye(6, dtype=H.dtype)
        dx = -tpu_linalg.solve_6x6(H, g)
        dR, dt = lie.se3_exp(dx)
        return lie.se3_mul(dR, dt, R, t), chi2

    def round_body(carry, _):
        R, t, active = carry

        def iter_body(i, Rt):
            (R, t), _ = gn_step(*Rt, active)
            return (R, t)

        R, t = jax.lax.fori_loop(0, n_iters, iter_body, (R, t))
        # reclassify (reference: chi2 > th -> outlier for next round)
        _, chi2 = gn_step(R, t, active)
        active = valid & (chi2 < chi2_th)
        return (R, t, active.astype(jnp.float32)), None

    active0 = valid.astype(jnp.float32)
    (R, t, active), _ = jax.lax.scan(
        round_body, (R0, t0, active0), None, length=n_rounds)
    _, chi2 = gn_step(R, t, active)
    inl = valid & (chi2 < chi2_th)
    return PoseOptResult(R=R, t=t, inliers=inl,
                         n_inliers=jnp.sum(inl), chi2=chi2)
