"""Visual-inertial bundle adjustment: reprojection + 9-dof preintegration
+ bias-random-walk + prior edges over 15-dof keyframe states, solved by
Levenberg-Marquardt with a Schur complement over landmarks.

TPU-native replacement for the reference's inertial optimizer stack:
  * Optimizer::FullInertialBA   (/root/reference/src/Optimizer.cc:364)
  * Optimizer::LocalInertialBA  (Optimizer.cc:2324)
  * Optimizer::PoseInertialOptimizationLastKeyFrame / LastFrame
    (Optimizer.cc:4391, 4761) with the marginalized ConstraintPoseImu prior
    (include/G2oTypes.h:706)
and the g2o vertex/edge types they assemble (VertexPose/VertexVelocity/
VertexGyroBias/VertexAccBias, EdgeInertial:495, EdgeGyroRW/EdgeAccRW:635/671,
EdgePriorAcc/Gyro:767/791 in include/G2oTypes.h).

Design: each keyframe carries a 15-dof state [dp, phi, dv, dbg, dba] in the
body frame (body == camera at this layer; callers rotate IMU samples by R_cb
up front). Visual Jacobians are analytic (shared structure with optim/ba.py);
inertial edge Jacobians come from forward-mode autodiff of the 9-dof residual
over the 30-dim (state_i, state_j) perturbation — exactly one (9, 30) block
per edge, vmapped. The window Hessian is assembled DENSE over the 15W state
(windows are <= a few dozen keyframes, so the (15W)^2 system is tiny after
the landmark Schur reduction) — the irregular part (landmark coupling) stays
in segment-sum land like ba.py.

State update conventions:
  R_wb' = R_wb exp(phi^);  p' = p + R_wb dp;  v' = v + dv;  b' = b + db
  (matches the reference's ImuCamPose/VertexPose update, G2oTypes.h:74).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import lie
from . import linalg as tpu_linalg
from .robust import huber_weight

# gravity as a Python constant — a module-level jnp array would be created
# at import time, which may happen inside an active jit trace
G_LIST = (0.0, 0.0, -9.81)
HUBER2_MONO = 5.991
HUBER2_STEREO = 7.815


class VIBAProblem(NamedTuple):
    """Fixed-capacity visual-inertial window problem.

    Window keyframe states (W slots, body frame):
      R_wb: (W,3,3); p_wb: (W,3); v: (W,3); bias: (W,6) [bg, ba].
      fix_pose / fix_vb: (W,) bool — state sub-blocks held fixed.
    Landmarks: X (L,3); lm_opt (L,) bool.
    Visual observations (O,) indexing window slots / landmark slots:
      obs_kf, obs_lm, obs_uv (O,2 normalized), obs_ur (O,), obs_info (O,),
      obs_mask (O,); baseline () stereo baseline.
    Inertial edges (one slot per window KF; slot e connects e_prev[e] -> e):
      e_valid (W,); e_prev (W,); e_dt (W,); e_dR (W,3,3); e_dV/e_dP (W,3);
      e_JRg..e_JPa (W,3,3); e_info (W,9,9); e_bias0 (W,6);
      e_rw_info (W,6) diag info of the bias random walk over this edge.
    Priors: prior_bias_info (W,6) diag info pulling bias toward ZERO
      (reference EdgePriorGyro/Acc used by FullInertialBA during IMU init).
    """
    R_wb: jnp.ndarray
    p_wb: jnp.ndarray
    v: jnp.ndarray
    bias: jnp.ndarray
    fix_pose: jnp.ndarray
    fix_vb: jnp.ndarray
    X: jnp.ndarray
    lm_opt: jnp.ndarray
    obs_kf: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_ur: jnp.ndarray
    obs_info: jnp.ndarray
    obs_mask: jnp.ndarray
    baseline: jnp.ndarray
    e_valid: jnp.ndarray
    e_prev: jnp.ndarray
    e_dt: jnp.ndarray
    e_dR: jnp.ndarray
    e_dV: jnp.ndarray
    e_dP: jnp.ndarray
    e_JRg: jnp.ndarray
    e_JVg: jnp.ndarray
    e_JVa: jnp.ndarray
    e_JPg: jnp.ndarray
    e_JPa: jnp.ndarray
    e_info: jnp.ndarray
    e_bias0: jnp.ndarray
    e_rw_info: jnp.ndarray
    prior_bias_info: jnp.ndarray


# ---------------------------------------------------------------------------
# residual terms
# ---------------------------------------------------------------------------

def floor_info(info9, sig_r: float = 0.003, sig_v: float = 0.01,
               sig_p: float = 0.005):
    """Information with a systematic-error covariance floor: the raw
    preintegration information (1e8-1e10 at frame rate) would let residual
    modeling errors (body==camera approx, f32, discretization) overpower
    the visual edges and drag the window along IMU dead-reckoning — the
    same floor inertial_only_optimize applies (optim/inertial.py)."""
    fl = jnp.diag(jnp.asarray([sig_r ** 2] * 3 + [sig_v ** 2] * 3
                              + [sig_p ** 2] * 3, info9.dtype))
    shape = info9.shape[:-2] + (9, 9)
    cov = jnp.linalg.inv(info9 + 1e-9 * jnp.eye(9, dtype=info9.dtype)) \
        + jnp.broadcast_to(fl, shape)
    out = jnp.linalg.inv(cov)
    return 0.5 * (out + jnp.swapaxes(out, -1, -2))


def _cam_from_body(R_wb, p_wb):
    """T_cw from body state (body == camera frame)."""
    R_cw = jnp.swapaxes(R_wb, -1, -2)
    t_cw = -lie.matvec(R_cw, p_wb)
    return R_cw, t_cw


def _visual_terms(p: VIBAProblem, R_wb, p_wb, X, robust: bool):
    """Reprojection residuals/Jacobians w.r.t. BODY-frame pose tangent
    [dp, phi] (same math as optim/ba.py but J_pose = [-I | hat(Xc)]).

    Returns r (O,3), Jp (O,3,6), Jl (O,3,3), w (O,), chi2 (O,)."""
    R_cw, t_cw = _cam_from_body(R_wb, p_wb)
    Rk = R_cw[p.obs_kf]
    tk = t_cw[p.obs_kf]
    Xl = X[p.obs_lm]
    Xc = lie.se3_apply(Rk, tk, Xl)
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    is_stereo = jnp.isfinite(p.obs_ur)
    r2 = Xc[..., :2] * iz[..., None] - p.obs_uv
    r_ur = jnp.where(is_stereo,
                     (x - p.baseline) * iz - jnp.nan_to_num(p.obs_ur), 0.0)
    r = jnp.concatenate([r2, r_ur[..., None]], axis=-1)

    zero = jnp.zeros_like(z)
    J_pt = jnp.stack([
        jnp.stack([iz, zero, -x * iz2], axis=-1),
        jnp.stack([zero, iz, -y * iz2], axis=-1),
        jnp.stack([jnp.where(is_stereo, iz, zero), zero,
                   jnp.where(is_stereo, -(x - p.baseline) * iz2, zero)],
                  axis=-1),
    ], axis=-2)                                   # (O, 3, 3) dr/dXc
    # body-tangent: Xc' = exp(-phi^)(Xc - dp) -> dXc/ddp = -I,
    # dXc/dphi = hat(Xc)
    J_body = jnp.concatenate(
        [jnp.broadcast_to(-jnp.eye(3, dtype=Xc.dtype),
                          Xc.shape[:-1] + (3, 3)),
         lie.so3_hat(Xc)], axis=-1)               # (O, 3, 6)
    Jp = jnp.einsum('oij,ojk->oik', J_pt, J_body)
    Jl = jnp.einsum('oij,ojk->oik', J_pt, Rk)

    chi2 = jnp.sum(r * r, axis=-1) * p.obs_info
    delta2 = jnp.where(is_stereo, HUBER2_STEREO, HUBER2_MONO)
    w_rob = huber_weight(chi2, delta2) if robust else jnp.ones_like(chi2)
    w = p.obs_info * w_rob * p.obs_mask * (z > 0)
    return r, Jp, Jl, w, chi2


def _edge_residual(x30, Ri, pi, vi, bi, Rj, pj, vj, dt, dR, dV, dP,
                   JRg, JVg, JVa, JPg, JPa, bias0):
    """9-dof preintegration residual of ONE edge as a function of the 30-dim
    (state_i, state_j) perturbation (reference EdgeInertial::computeError,
    G2oTypes.h:495). Autodiff of this gives the exact Jacobian blocks."""
    xi, xj = x30[:15], x30[15:]
    Ri_ = lie.matmat(Ri, lie.so3_exp(xi[3:6]))
    pi_ = pi + lie.matvec(Ri, xi[0:3])
    vi_ = vi + xi[6:9]
    bg = bi[:3] + xi[9:12]
    ba = bi[3:] + xi[12:15]
    Rj_ = lie.matmat(Rj, lie.so3_exp(xj[3:6]))
    pj_ = pj + lie.matvec(Rj, xj[0:3])
    vj_ = vj + xj[6:9]
    dbg = bg - bias0[:3]
    dba = ba - bias0[3:]
    dR_c = lie.matmat(dR, lie.so3_exp(lie.matvec(JRg, dbg)))
    dV_c = dV + lie.matvec(JVg, dbg) + lie.matvec(JVa, dba)
    dP_c = dP + lie.matvec(JPg, dbg) + lie.matvec(JPa, dba)
    RiT = jnp.swapaxes(Ri_, -1, -2)
    g = jnp.asarray(G_LIST, Ri.dtype)
    r_R = lie.so3_log(lie.matmat(jnp.swapaxes(dR_c, -1, -2),
                                 lie.matmat(RiT, Rj_)))
    r_v = lie.matvec(RiT, vj_ - vi_ - g * dt) - dV_c
    r_p = lie.matvec(RiT, pj_ - pi_ - vi_ * dt - 0.5 * g * dt * dt) - dP_c
    return jnp.concatenate([r_R, r_v, r_p])


def _edge_terms(p: VIBAProblem, R_wb, p_wb, v, bias):
    """Residual + (9, 30) Jacobian of every inertial edge, vmapped."""
    prev = jnp.clip(p.e_prev, 0, None)

    def one(e):
        args = (R_wb[prev[e]], p_wb[prev[e]], v[prev[e]], bias[prev[e]],
                R_wb[e], p_wb[e], v[e],
                p.e_dt[e], p.e_dR[e], p.e_dV[e], p.e_dP[e],
                p.e_JRg[e], p.e_JVg[e], p.e_JVa[e], p.e_JPg[e], p.e_JPa[e],
                p.e_bias0[e])
        z = jnp.zeros(30, R_wb.dtype)
        r = _edge_residual(z, *args)
        J = jax.jacfwd(_edge_residual)(z, *args)
        return r, J

    W = p.R_wb.shape[0]
    r, J = jax.vmap(one)(jnp.arange(W))
    w = p.e_valid.astype(R_wb.dtype)
    return r * w[:, None], J * w[:, None, None]


def _quad_costs(p: VIBAProblem, R_wb, p_wb, v, bias):
    """Inertial + bias-RW + prior quadratic costs (for LM accept/reject)."""
    r, _ = _edge_terms(p, R_wb, p_wb, v, bias)
    c_in = jnp.sum(jnp.einsum('ei,eij,ej->e', r, p.e_info, r,
                              precision='highest'))
    prev = jnp.clip(p.e_prev, 0, None)
    r_rw = (bias - bias[prev]) * p.e_valid[:, None]
    c_rw = jnp.sum(r_rw * r_rw * p.e_rw_info)
    c_pr = jnp.sum(bias * bias * p.prior_bias_info)
    return c_in + c_rw + c_pr


def _total_cost(p: VIBAProblem, R_wb, p_wb, v, bias, X):
    r, _, _, w, _ = _visual_terms(p, R_wb, p_wb, X, robust=True)
    c_vis = jnp.sum(w * jnp.sum(r * r, axis=-1))
    return c_vis + _quad_costs(p, R_wb, p_wb, v, bias)


# ---------------------------------------------------------------------------
# the LM solver
# ---------------------------------------------------------------------------

def _free_mask(p: VIBAProblem):
    W = p.R_wb.shape[0]
    free = jnp.concatenate([
        jnp.broadcast_to((~p.fix_pose)[:, None], (W, 6)),
        jnp.broadcast_to((~p.fix_vb)[:, None], (W, 9))], axis=1)
    return free.reshape(15 * W).astype(p.p_wb.dtype)


def _lm_step(p: VIBAProblem, R_wb, p_wb, v, bias, X, lam):
    """One damped LM step of the full visual-inertial window system."""
    W = p.R_wb.shape[0]
    L = p.X.shape[0]
    D = 15 * W
    f32 = p.p_wb.dtype
    lm_opt_f = p.lm_opt.astype(f32)
    eyeL = jnp.eye(3, dtype=f32)
    free = _free_mask(p)
    prev = jnp.clip(p.e_prev, 0, None)
    if True:
        # ---- visual blocks (segment sums, as optim/ba.py) ---------------
        r, Jp, Jl, w, _ = _visual_terms(p, R_wb, p_wb, X, robust=True)
        Hpp6 = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jp, w, Jp, precision='highest'),
            p.obs_kf, num_segments=W)                        # (W,6,6)
        Hll = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jl, w, Jl, precision='highest'),
            p.obs_lm, num_segments=L)
        bp6 = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jp, w, r, precision='highest'),
            p.obs_kf, num_segments=W)                        # (W,6)
        bl = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jl, w, r, precision='highest'),
            p.obs_lm, num_segments=L)
        # coupling only to OPTIMIZED landmarks: a fixed landmark must not
        # enter the Schur complement (its identity-replaced Hll block would
        # subtract a bogus B B^T and break positive-definiteness)
        Wpl = jnp.einsum('oia,o,oib->oab', Jp, w, Jl, precision='highest') \
            * (p.obs_mask * p.lm_opt[p.obs_lm])[:, None, None]

        # ---- dense 15W Hessian ------------------------------------------
        H = jnp.zeros((W, 15, W, 15), f32)
        b = jnp.zeros((W, 15), f32)
        H = H.at[jnp.arange(W), 0:6, jnp.arange(W), 0:6].add(
            jnp.swapaxes(Hpp6, 0, 0))
        # note: advanced indexing above yields (W,6,6) blocks at (w,:,w,:)
        b = b.at[:, 0:6].add(bp6)

        # inertial edges
        re, Je = _edge_terms(p, R_wb, p_wb, v, bias)         # (W,9),(W,9,30)
        JtW = jnp.einsum('eai,eab->ebi', Je, p.e_info,
                         precision='highest')                # (W,9,30)
        He = jnp.einsum('ebi,ebj->eij', JtW, Je,
                        precision='highest')                 # (W,30,30)
        ge = -jnp.einsum('ebi,eb->ei', JtW, re,
                         precision='highest')                # (W,30)
        ii, ij = He[:, :15, :15], He[:, :15, 15:]
        jj = He[:, 15:, 15:]
        ks = jnp.arange(W)
        H = H.at[prev, :, prev, :].add(ii)
        H = H.at[prev, :, ks, :].add(ij)
        H = H.at[ks, :, prev, :].add(jnp.swapaxes(ij, -1, -2))
        H = H.at[ks, :, ks, :].add(jj)
        b = b.at[prev].add(ge[:, :15])
        b = b.at[ks].add(ge[:, 15:])

        # bias random walk: r = b_j - b_i (diag info)
        r_rw = (bias - bias[prev]) * p.e_valid[:, None]      # (W,6)
        rw = p.e_rw_info * p.e_valid[:, None]                # (W,6)
        dia = jax.vmap(jnp.diag)(rw)                         # (W,6,6)
        H = H.at[prev, 9:15, prev, 9:15].add(dia)
        H = H.at[ks, 9:15, ks, 9:15].add(dia)
        H = H.at[prev, 9:15, ks, 9:15].add(-dia)
        H = H.at[ks, 9:15, prev, 9:15].add(-dia)
        b = b.at[prev, 9:15].add(rw * r_rw)
        b = b.at[ks, 9:15].add(-rw * r_rw)

        # bias priors toward zero
        H = H.at[ks, 9:15, ks, 9:15].add(
            jax.vmap(jnp.diag)(p.prior_bias_info))
        b = b.at[:, 9:15].add(-p.prior_bias_info * bias)

        H = H.reshape(D, D)
        b = b.reshape(D)

        # ---- landmark Schur ---------------------------------------------
        eyeL3 = eyeL
        Hll_d = Hll + lam * eyeL3 * jnp.maximum(
            jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeL3
        Hll_d = jnp.where(p.lm_opt[:, None, None], Hll_d,
                          jnp.broadcast_to(eyeL3, Hll_d.shape))
        bl_m = bl * lm_opt_f[:, None]
        Hll_inv = tpu_linalg.inv3x3(Hll_d)

        B = jnp.zeros((W, 6, L, 3), f32)
        B = B.at[p.obs_kf, :, p.obs_lm, :].add(Wpl)
        B = B.reshape(W * 6, L, 3)
        BC = jnp.einsum('mlb,lbc->mlc', B, Hll_inv, precision='highest')
        S_off = jnp.einsum('mlc,nlc->mn', BC, B, precision='highest')
        rhs_off = jnp.einsum('mlc,lc->m', BC, bl_m, precision='highest')

        # embed the pose-row Schur correction into the 15W system
        pose_idx = (jnp.arange(W)[:, None] * 15
                    + jnp.arange(6)[None, :]).reshape(-1)    # (6W,)
        H = H.at[pose_idx[:, None], pose_idx[None, :]].add(-S_off)
        b = b.at[pose_idx].add(-rhs_off)

        # ---- damping + fixing + solve ------------------------------------
        # Marquardt diagonal scaling: the mixed visual(1e5)/inertial(1e8)
        # information scales give the raw system a ~1e17 condition number,
        # beyond f32 Cholesky — symmetric Jacobi scaling brings the diagonal
        # to 1 and the damping becomes +lam*I in the scaled space
        H = 0.5 * (H + H.T)
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-8))
        d = jnp.where(free > 0, d, 1.0)
        Hs = H / d[:, None] / d[None, :]
        Hs = Hs + lam * jnp.eye(D, dtype=f32)
        Hs = Hs * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        bs = (b / d) * free
        dx = (tpu_linalg.solve_spd(Hs, bs) / d).reshape(W, 15) \
            * free.reshape(W, 15)

        # ---- back-substitute landmarks -----------------------------------
        dxp6 = dx[:, 0:6]
        Btdxp = jax.ops.segment_sum(
            jnp.einsum('oab,oa->ob', Wpl, dxp6[p.obs_kf],
                       precision='highest'),
            p.obs_lm, num_segments=L)
        dxl = jnp.einsum('lab,lb->la', Hll_inv, bl_m - Btdxp,
                         precision='highest') * lm_opt_f[:, None]

        # ---- state update -------------------------------------------------
        R_new = lie.matmat(R_wb, lie.so3_exp(dx[:, 3:6]))
        p_new = p_wb + lie.matvec(R_wb, dx[:, 0:3])
        v_new = v + dx[:, 6:9]
        b_new = bias + dx[:, 9:15]
        X_new = X + dxl
        return R_new, p_new, v_new, b_new, X_new


def vi_ba_solve(p: VIBAProblem, n_iters: int = 8, lambda0: float = 1e-3):
    """Visual-inertial LM over the window. Returns
    (R_wb, p_wb, v, bias, X, info)."""
    f32 = p.p_wb.dtype

    def iteration(carry, _):
        R_wb, p_wb, v, bias, X, lam, cost = carry
        out = _lm_step(p, R_wb, p_wb, v, bias, X, lam)
        new_cost = _total_cost(p, *out)
        ok = jnp.isfinite(new_cost) & (new_cost < cost)
        R_wb, p_wb, v, bias, X = jax.tree.map(
            lambda n, o: jnp.where(ok, n, o), out,
            (R_wb, p_wb, v, bias, X))
        cost = jnp.where(ok, new_cost, cost)
        lam = jnp.clip(jnp.where(ok, lam * 0.5, lam * 8.0), 1e-9, 1e7)
        return (R_wb, p_wb, v, bias, X, lam, cost), cost

    cost0 = _total_cost(p, p.R_wb, p.p_wb, p.v, p.bias, p.X)
    (R_wb, p_wb, v, bias, X, lam, cost), costs = jax.lax.scan(
        iteration,
        (p.R_wb, p.p_wb, p.v, p.bias, p.X, jnp.asarray(lambda0, f32),
         cost0), None, length=n_iters)
    return R_wb, p_wb, v, bias, X, {"cost0": cost0, "costs": costs}


def classify_outliers(p: VIBAProblem, R_wb, p_wb, X):
    """Final chi2 classification of visual observations (reference:
    observations with chi2 > 5.991/7.815 erased after inertial BA)."""
    _, _, _, _, chi2 = _visual_terms(p, R_wb, p_wb, X, robust=False)
    th = jnp.where(jnp.isfinite(p.obs_ur), HUBER2_STEREO, HUBER2_MONO)
    return p.obs_mask & (chi2 < th)


# ---------------------------------------------------------------------------
# per-frame pose-inertial optimization (motion-only)
# ---------------------------------------------------------------------------

class PoseInertialResult(NamedTuple):
    R_cw: jnp.ndarray
    t_cw: jnp.ndarray
    v: jnp.ndarray
    bias: jnp.ndarray
    inliers: jnp.ndarray
    n_inliers: jnp.ndarray
    H_marg: jnp.ndarray      # (15,15) marginalized prior info for next frame


@partial(jax.jit, static_argnames=("n_iters", "anchor_fixed"))
def optimize_pose_inertial(R0_cw, t0_cw, v0, bias0,
                           Xw, obs, info, valid, obs_ur, baseline,
                           R_a_wb, p_a, v_a, bias_a,
                           e_dt, e_dR, e_dV, e_dP, e_JRg, e_JVg, e_JVa,
                           e_JPg, e_JPa, e_info, e_bias0, e_rw_info,
                           prior_info=None,
                           n_iters: int = 10, anchor_fixed: bool = True):
    """Per-frame visual + inertial motion-only optimization (reference
    PoseInertialOptimizationLastKeyFrame/LastFrame, Optimizer.cc:4391/4761).

    30-dim GN over (anchor state, current state). The anchor is the last
    keyframe (anchor_fixed=True) or the last frame constrained by the
    marginalized prior `prior_info` from its own optimization
    (anchor_fixed=False; reference ConstraintPoseImu). Returns the CURRENT
    frame's refined camera pose, velocity, bias, the inlier classification
    and the (15,15) marginal Hessian to use as the next frame's prior.
    """
    f32 = t0_cw.dtype
    is_stereo = jnp.isfinite(obs_ur)
    chi2_th = jnp.where(is_stereo, HUBER2_STEREO, HUBER2_MONO)
    delta2 = chi2_th
    if prior_info is None:
        prior_info = jnp.zeros((15, 15), f32)

    # body states of the current frame
    R0_wb = R0_cw.T
    p0 = -lie.matvec(R0_wb, t0_cw)

    edge_args_tail = (e_dt, e_dR, e_dV, e_dP, e_JRg, e_JVg, e_JVa, e_JPg,
                      e_JPa, e_bias0)

    def visual_terms(R_wb, p_wb, active):
        R_cw = R_wb.T
        t_cw = -lie.matvec(R_cw, p_wb)
        Xc = lie.se3_apply(R_cw, t_cw, Xw)
        x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / zs
        iz2 = iz * iz
        r2 = Xc[..., :2] * iz[..., None] - obs
        r_ur = jnp.where(is_stereo,
                         (x - baseline) * iz - jnp.nan_to_num(obs_ur), 0.0)
        r = jnp.concatenate([r2, r_ur[..., None]], axis=-1)
        zero = jnp.zeros_like(z)
        J_pt = jnp.stack([
            jnp.stack([iz, zero, -x * iz2], axis=-1),
            jnp.stack([zero, iz, -y * iz2], axis=-1),
            jnp.stack([jnp.where(is_stereo, iz, zero), zero,
                       jnp.where(is_stereo, -(x - baseline) * iz2, zero)],
                      axis=-1)], axis=-2)
        J_body = jnp.concatenate(
            [jnp.broadcast_to(-jnp.eye(3, dtype=f32),
                              Xc.shape[:-1] + (3, 3)),
             lie.so3_hat(Xc)], axis=-1)
        Jp = jnp.einsum('oij,ojk->oik', J_pt, J_body)      # (N,3,6)
        chi2 = jnp.sum(r * r, axis=-1) * info
        w_rob = huber_weight(chi2, delta2)
        w = info * w_rob * active * (z > 0)
        return r, Jp, w, chi2

    def gn_step(Ra, pa, va, ba_, R_wb, p_wb, v, bias, active):
        r, Jp, w, chi2 = visual_terms(R_wb, p_wb, active)
        Hv = jnp.einsum('nia,n,nib->ab', Jp, w, Jp, precision='highest')
        gv = -jnp.einsum('nia,n,ni->a', Jp, w, r, precision='highest')

        z30 = jnp.zeros(30, f32)
        args = (Ra, pa, va, ba_, R_wb, p_wb, v) + edge_args_tail
        re = _edge_residual(z30, *args)
        Je = jax.jacfwd(_edge_residual)(z30, *args)        # (9,30)
        JtW = jnp.einsum('ai,ab->bi', Je, e_info, precision='highest')
        He = jnp.einsum('bi,bj->ij', JtW, Je, precision='highest')
        ge = -jnp.einsum('bi,b->i', JtW, re, precision='highest')

        H = jnp.zeros((30, 30), f32)
        g = jnp.zeros(30, f32)
        H = H + He
        g = g + ge
        # visual on current pose (dims 15:21)
        H = H.at[15:21, 15:21].add(Hv)
        g = g.at[15:21].add(gv)
        # bias RW anchor->current
        r_rw = bias - ba_
        rw = e_rw_info
        H = H.at[9:15, 9:15].add(jnp.diag(rw))
        H = H.at[24:30, 24:30].add(jnp.diag(rw))
        H = H.at[9:15, 24:30].add(-jnp.diag(rw))
        H = H.at[24:30, 9:15].add(-jnp.diag(rw))
        g = g.at[9:15].add(rw * r_rw)
        g = g.at[24:30].add(-rw * r_rw)
        # prior on the anchor (ConstraintPoseImu): residual = deviation of
        # the anchor from its INPUT state == the GN step itself, so only
        # the Hessian enters (residual is zero at the linearization point)
        H = H.at[:15, :15].add(prior_info)
        if anchor_fixed:
            mask = jnp.concatenate([jnp.zeros(15, f32), jnp.ones(15, f32)])
            H = H * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
            g = g * mask
        # Jacobi scaling (see vi_ba_solve) — the 30-dim system mixes the
        # same 1e5/1e8 information scales
        H = 0.5 * (H + H.T)
        d = jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-8))
        Hs = H / d[:, None] / d[None, :] + 1e-6 * jnp.eye(30, dtype=f32)
        dx = tpu_linalg.solve_spd(Hs, g / d) / d
        xi, xj = dx[:15], dx[15:]
        Ra2 = lie.matmat(Ra, lie.so3_exp(xi[3:6]))
        pa2 = pa + lie.matvec(Ra, xi[0:3])
        va2 = va + xi[6:9]
        ba2 = ba_ + xi[9:15]
        R2 = lie.matmat(R_wb, lie.so3_exp(xj[3:6]))
        p2 = p_wb + lie.matvec(R_wb, xj[0:3])
        v2 = v + xj[6:9]
        b2 = bias + xj[9:15]
        return (Ra2, pa2, va2, ba2, R2, p2, v2, b2), chi2, H

    def round_body(carry, _):
        Ra, pa, va, ba_, R_wb, p_wb, v, bias, active = carry

        def it(i, st):
            out, _, _ = gn_step(*st, active)
            return out

        st = jax.lax.fori_loop(
            0, n_iters, it, (Ra, pa, va, ba_, R_wb, p_wb, v, bias))
        _, chi2, _ = gn_step(*st, active)
        active = valid & (chi2 < chi2_th)
        return st + (active.astype(f32),), None

    init = (R_a_wb, p_a, v_a, bias_a, R0_wb, p0, v0, bias0,
            valid.astype(f32))
    (Ra, pa, va, ba_, R_wb, p_wb, v, bias, active), _ = jax.lax.scan(
        round_body, init, None, length=2)
    _, chi2, H_full = gn_step(Ra, pa, va, ba_, R_wb, p_wb, v, bias, active)
    inl = valid & (chi2 < chi2_th)

    # marginalize the anchor out of the 30-dim Hessian -> 15x15 prior on the
    # current state (reference Marginalize, Optimizer.cc:2898)
    Haa = H_full[:15, :15] + 1e-5 * jnp.eye(15, dtype=f32)
    Hac = H_full[:15, 15:]
    Hcc = H_full[15:, 15:]
    H_marg = Hcc - jnp.einsum('ab,bc->ac', Hac.T,
                              jnp.linalg.solve(Haa, Hac),
                              precision='highest')
    H_marg = 0.5 * (H_marg + H_marg.T)

    R_cw = jnp.swapaxes(R_wb, -1, -2)
    t_cw = -lie.matvec(R_cw, p_wb)
    return PoseInertialResult(R_cw=R_cw, t_cw=t_cw, v=v, bias=bias,
                              inliers=inl, n_inliers=jnp.sum(inl),
                              H_marg=H_marg)
