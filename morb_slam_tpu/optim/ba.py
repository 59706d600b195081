"""Bundle adjustment: robustified Levenberg-Marquardt with Schur-complement
reduction over landmarks, built for the MXU.

TPU-native replacement for the reference's g2o-based
Optimizer::LocalBundleAdjustment / BundleAdjustment / GlobalBundleAdjustemnt
(/root/reference/src/Optimizer.cc:56,1053) and g2o's BlockSolver_6_3 with
Schur (Thirdparty/g2o/g2o/core/block_solver.h). Design (SURVEY.md §7 B3):

  * observations are fixed-capacity COO arrays (obs_kf, obs_lm, uv, info,
    mask) — Jacobian blocks are computed for all observations at once;
  * per-entity Hessian blocks accumulate via segment_sum;
  * the landmark block-diagonal Hll is inverted in closed form (3x3);
  * the reduced camera system S = Hpp - B Hll^-1 B^T is formed DENSELY —
    the window is small (<= a few dozen keyframes), so the (6K, 6K) system
    is tiny and the B-products are plain MXU matmuls; no sparse bookkeeping;
  * LM damping with accept/reject runs as a fixed-iteration scan.

Pose convention matches pose_opt: T_cw, left-composed update
T <- exp(dx) T; landmark update X <- X + dx.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import linalg as tpu_linalg
from .robust import huber_weight

HUBER2_MONO = 5.991      # reference thHuberMonocular^2 (Optimizer.cc:1175)
HUBER2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem.

    R, t: (K, 3, 3), (K, 3) keyframe poses T_cw.
    X: (L, 3) landmark positions (world).
    obs_kf, obs_lm: (O,) int32 indices into the above.
    obs_uv: (O, 2) normalized image coords.
    obs_ur: (O,) normalized right-u for stereo rows; NaN for mono.
    obs_info: (O,) information (focal/sigma)^2.
    obs_mask: (O,) bool.
    kf_opt: (K,) bool — False = pose held fixed (frontier anchors).
    lm_opt: (L,) bool — False = landmark held fixed.
    baseline: () stereo baseline (meters).
    """
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    obs_kf: jnp.ndarray
    obs_lm: jnp.ndarray
    obs_uv: jnp.ndarray
    obs_ur: jnp.ndarray
    obs_info: jnp.ndarray
    obs_mask: jnp.ndarray
    kf_opt: jnp.ndarray
    lm_opt: jnp.ndarray
    baseline: jnp.ndarray


def make_problem(R, t, X, obs_kf, obs_lm, obs_uv, obs_info, obs_mask,
                 kf_opt, lm_opt, obs_ur=None, baseline=0.0) -> BAProblem:
    O = obs_uv.shape[0]
    if obs_ur is None:
        obs_ur = jnp.full((O,), jnp.nan, obs_uv.dtype)
    return BAProblem(R=R, t=t, X=X, obs_kf=obs_kf, obs_lm=obs_lm,
                     obs_uv=obs_uv, obs_ur=obs_ur, obs_info=obs_info,
                     obs_mask=obs_mask, kf_opt=kf_opt, lm_opt=lm_opt,
                     baseline=jnp.asarray(baseline, obs_uv.dtype))


def _obs_terms(p: BAProblem, R, t, X, robust: bool):
    """Per-observation residuals, Jacobians and weights.

    Returns r (O, 3), Jp (O, 3, 6), Jl (O, 3, 3), w (O,), chi2 (O,).
    Third residual row is the stereo right-u (zeroed for mono rows).
    """
    Rk = R[p.obs_kf]
    tk = t[p.obs_kf]
    Xl = X[p.obs_lm]
    Xc = lie.se3_apply(Rk, tk, Xl)
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz
    is_stereo = jnp.isfinite(p.obs_ur)
    r2 = Xc[..., :2] * iz[..., None] - p.obs_uv
    r_ur = jnp.where(is_stereo, (x - p.baseline) * iz - jnp.nan_to_num(p.obs_ur),
                     0.0)
    r = jnp.concatenate([r2, r_ur[..., None]], axis=-1)

    zero = jnp.zeros_like(z)
    J_pt = jnp.stack([
        jnp.stack([iz, zero, -x * iz2], axis=-1),
        jnp.stack([zero, iz, -y * iz2], axis=-1),
        jnp.stack([jnp.where(is_stereo, iz, zero), zero,
                   jnp.where(is_stereo, -(x - p.baseline) * iz2, zero)],
                  axis=-1),
    ], axis=-2)                                      # (O, 3, 3) d r/d Xc
    J_se3 = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3, dtype=Xc.dtype), Xc.shape[:-1] + (3, 3)),
         -lie.so3_hat(Xc)], axis=-1)                 # (O, 3, 6)
    Jp = jnp.einsum('oij,ojk->oik', J_pt, J_se3)     # (O, 3, 6)
    Jl = jnp.einsum('oij,ojk->oik', J_pt, Rk)        # (O, 3, 3)

    chi2 = jnp.sum(r * r, axis=-1) * p.obs_info
    delta2 = jnp.where(is_stereo, HUBER2_STEREO, HUBER2_MONO)
    w_rob = huber_weight(chi2, delta2) if robust else jnp.ones_like(chi2)
    w = p.obs_info * w_rob * p.obs_mask * (z > 0)
    return r, Jp, Jl, w, chi2


def _cost(p: BAProblem, R, t, X):
    r, _, _, w, _ = _obs_terms(p, R, t, X, robust=True)
    # Huber cost ~ w * chi2 is the IRLS surrogate; good enough for accept/reject
    return jnp.sum(w * jnp.sum(r * r, axis=-1))


_inv3x3 = tpu_linalg.inv3x3


def ba_solve(p: BAProblem, n_iters: int = 10, lambda0: float = 1e-4):
    """Levenberg-Marquardt with dense-window Schur reduction.

    Returns (R, t, X, info) where info carries per-iteration costs.

    TPU layout notes (this routine is the framework's hottest solver — it
    runs on every keyframe insert): random-index scatter-adds serialize on
    TPU (~60 ns/row), so the assembly avoids them entirely:

      * observations are sorted ONCE per solve by the joint (landmark,
        keyframe) index, so the landmark-side reductions become a single
        sorted segment_sum producing B, Hll and bl together;
      * the pose-side reductions (K is small) are one-hot matmuls on the
        MXU instead of scatters;
      * each iteration linearizes once: the residual/Jacobian terms of the
        last ACCEPTED state are carried through the scan, so the
        accept/reject cost check shares the linearization with the next
        step (the reference g2o LM re-evaluates chi2 the same way).
    """
    K = p.R.shape[0]
    L = p.X.shape[0]
    O = p.obs_uv.shape[0]
    f32 = p.obs_uv.dtype
    kf_opt_f = p.kf_opt.astype(f32)
    lm_opt_f = p.lm_opt.astype(f32)

    # ---- once-per-solve setup: sort observations by joint index (masked
    # rows pushed past the end so they fall off the segment table).
    j = jnp.where(p.obs_mask, p.obs_lm * K + p.obs_kf, L * K)
    order = jnp.argsort(j)
    obs_kf = p.obs_kf[order]
    obs_lm = p.obs_lm[order]
    j_s = j[order]
    e_kf = jax.nn.one_hot(obs_kf, K, dtype=f32)               # (O, K)
    lm_opt_obs = lm_opt_f[obs_lm] * p.obs_mask[order]         # (O,)
    # per-obs static data, transposed to O-minor layouts (TPU tiles the two
    # minor dims to (8,128): any (O, a, b) block array pads b to 128 — a
    # 28x HBM blowup for 6x6 blocks. Everything per-obs here is (..., O).)
    uvT = p.obs_uv[order].T                                   # (2, O)
    urT = p.obs_ur[order]                                     # (O,)
    infoT = p.obs_info[order]
    maskT = p.obs_mask[order].astype(f32)
    is_stereo = jnp.isfinite(urT)
    ur0 = jnp.nan_to_num(urT)
    delta2 = jnp.where(is_stereo, HUBER2_STEREO, HUBER2_MONO)
    eyeK = jnp.eye(6, dtype=f32)
    eyeL = jnp.eye(3, dtype=f32)
    diagK = jnp.arange(K)
    hi = jax.lax.Precision.HIGHEST

    def terms_of(R, t, X):
        """O-minor residuals/Jacobians: r (3,O), Jp (3,6,O), Jl (3,3,O)."""
        RkT = jnp.einsum('kab,ok->abo', R, e_kf, precision=hi)  # (3,3,O)
        tkT = jnp.einsum('ka,ok->ao', t, e_kf, precision=hi)    # (3, O)
        Xl = X[obs_lm]                                          # (O, 3)
        XcT = jnp.einsum('abo,ob->ao', RkT, Xl, precision=hi) + tkT
        x, y, z = XcT[0], XcT[1], XcT[2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        iz = 1.0 / zs
        iz2 = iz * iz
        r0 = x * iz - uvT[0]
        r1 = y * iz - uvT[1]
        r2 = jnp.where(is_stereo, (x - p.baseline) * iz - ur0, 0.0)
        rT = jnp.stack([r0, r1, r2])                            # (3, O)
        zero = jnp.zeros_like(z)
        J_pt = jnp.stack([
            jnp.stack([iz, zero, -x * iz2]),
            jnp.stack([zero, iz, -y * iz2]),
            jnp.stack([jnp.where(is_stereo, iz, zero), zero,
                       jnp.where(is_stereo, -(x - p.baseline) * iz2, zero)]),
        ])                                                      # (3, 3, O)
        # Jp = J_pt @ [I | -hat(Xc)] per obs; write the blocks directly
        mx, my, mz = -x, -y, -z
        hatT = jnp.stack([
            jnp.stack([zero, -mz, my]),
            jnp.stack([mz, zero, -mx]),
            jnp.stack([-my, mx, zero]),
        ])                                                      # (3,3,O) -hat
        JpT = jnp.concatenate(
            [J_pt, jnp.einsum('ijo,jko->iko', J_pt, hatT)], axis=1)  # (3,6,O)
        JlT = jnp.einsum('ijo,jko->iko', J_pt, RkT)             # (3,3,O)
        chi2 = jnp.sum(rT * rT, axis=0) * infoT
        w_rob = huber_weight(chi2, delta2)
        w = infoT * w_rob * maskT * (z > 0)
        return rT, JpT, JlT, w

    def cost_of(terms):
        rT, _, _, w = terms
        return jnp.sum(w * jnp.sum(rT * rT, axis=0))

    def lm_step(terms, R, t, X, lam):
        rT, JpT, JlT, w = terms

        # pose side: one-hot matmuls (MXU), no scatter
        hpp_o = jnp.einsum('iao,ibo->abo', JpT, JpT).reshape(36, O) \
            * w[None, :]
        Hpp = jnp.einsum('xo,ok->kx', hpp_o, e_kf,
                         precision=hi).reshape(K, 6, 6)
        gp_o = jnp.einsum('iao,io->ao', JpT, rT) * w[None, :]
        bp = -jnp.einsum('xo,ok->kx', gp_o, e_kf, precision=hi)

        # landmark + off-diagonal side: ONE sorted segment_sum over the
        # joint (lm, kf) index carrying [Wpl | Hll | bl] per observation
        Wpl = jnp.einsum('iao,ibo->abo', JpT, JlT).reshape(18, O) \
            * (w * lm_opt_obs)[None, :]
        hll_o = jnp.einsum('iao,ibo->abo', JlT, JlT).reshape(9, O) \
            * w[None, :]
        gl_o = jnp.einsum('iao,io->ao', JlT, rT) * w[None, :]
        payload = jnp.concatenate([Wpl, hll_o, gl_o], axis=0).T  # (O, 30)
        seg = jax.ops.segment_sum(payload, j_s, num_segments=L * K + 1,
                                  indices_are_sorted=True)[:L * K]
        seg = seg.reshape(L, K, 30)
        Bt = seg[:, :, :18].reshape(L, K, 6, 3)
        Hll = seg[:, :, 18:27].sum(axis=1).reshape(L, 3, 3)
        bl = -seg[:, :, 27:30].sum(axis=1)

        # damping (LM): scale diagonals
        Hpp = Hpp + lam * eyeK * jnp.maximum(
            jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeK
        Hll_d = Hll + lam * eyeL * jnp.maximum(
            jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeL

        # fixed landmarks: make their block identity, rhs zero (their B
        # columns are already zeroed via lm_opt_obs)
        Hll_d = jnp.where(p.lm_opt[:, None, None], Hll_d,
                          jnp.broadcast_to(eyeL, Hll_d.shape))
        bl = bl * lm_opt_f[:, None]
        Hll_inv = _inv3x3(Hll_d)                              # (L, 3, 3)

        B = Bt.transpose(1, 2, 0, 3).reshape(K * 6, L, 3)

        # S = Hpp_dense - B Hll^-1 B^T   (MXU)
        BC = jnp.einsum('mlb,lbc->mlc', B, Hll_inv,
                        precision='highest')                  # (6K, L, 3)
        S_off = jnp.einsum('mlc,nlc->mn', BC, B, precision='highest')
        Hpp_dense = jnp.zeros((K, 6, K, 6), f32)
        Hpp_dense = Hpp_dense.at[diagK, :, diagK, :].set(Hpp)
        S = Hpp_dense.reshape(K * 6, K * 6) - S_off
        b_schur = (bp.reshape(K * 6)
                   - jnp.einsum('mlc,lc->m', BC, bl, precision='highest'))

        # fixed keyframes: identity rows/cols, zero rhs
        free = jnp.repeat(kf_opt_f, 6)
        S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b_schur = b_schur * free

        dxp = tpu_linalg.solve_spd(S, b_schur)                # (6K,)
        # back-substitute landmarks: dxl = Hll^-1 (bl - B^T dxp)
        Btdxp = jnp.einsum('mlc,m->lc', B, dxp, precision='highest')
        dxl = jnp.einsum('lab,lb->la', Hll_inv, bl - Btdxp,
                         precision='highest') * lm_opt_f[:, None]
        dxp = dxp.reshape(K, 6) * kf_opt_f[:, None]

        dR, dt = lie.se3_exp(dxp)
        R_new, t_new = lie.se3_mul(dR, dt, R, t)
        X_new = X + dxl
        return R_new, t_new, X_new

    def iteration(carry, _):
        R, t, X, terms, lam, cost = carry
        R_c, t_c, X_c = lm_step(terms, R, t, X, lam)
        terms_c = terms_of(R_c, t_c, X_c)
        new_cost = cost_of(terms_c)
        accept = new_cost < cost
        sel = lambda n, o: jnp.where(accept, n, o)
        R, t, X = jax.tree.map(sel, (R_c, t_c, X_c), (R, t, X))
        terms = jax.tree.map(sel, terms_c, terms)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e4)
        return (R, t, X, terms, lam, cost), cost

    terms0 = terms_of(p.R, p.t, p.X)
    cost0 = cost_of(terms0)
    (R, t, X, _, lam, cost), costs = jax.lax.scan(
        iteration, (p.R, p.t, p.X, terms0, jnp.asarray(lambda0, f32), cost0),
        None, length=n_iters)
    return R, t, X, {"cost0": cost0, "costs": costs, "lambda": lam}


def _assemble_blocks(p: BAProblem, R, t, X, lam):
    """Shared LM-iteration assembly: damped per-entity Hessian blocks.

    Returns (Hpp (K,6,6) damped, Hll_inv (L,3,3), bp (K,6), bl (L,3),
    Wpl (O,6,3) masked). Observation-count memory only — no dense B.
    """
    K = p.R.shape[0]
    L = p.X.shape[0]
    f32 = p.obs_uv.dtype
    r, Jp, Jl, w, _ = _obs_terms(p, R, t, X, robust=True)
    Hpp = jax.ops.segment_sum(
        jnp.einsum('oia,o,oib->oab', Jp, w, Jp, precision='highest'),
        p.obs_kf, num_segments=K)
    Hll = jax.ops.segment_sum(
        jnp.einsum('oia,o,oib->oab', Jl, w, Jl, precision='highest'),
        p.obs_lm, num_segments=L)
    bp = -jax.ops.segment_sum(
        jnp.einsum('oia,o,oi->oa', Jp, w, r, precision='highest'),
        p.obs_kf, num_segments=K)
    bl = -jax.ops.segment_sum(
        jnp.einsum('oia,o,oi->oa', Jl, w, r, precision='highest'),
        p.obs_lm, num_segments=L)
    Wpl = jnp.einsum('oia,o,oib->oab', Jp, w, Jl, precision='highest')
    Wpl = Wpl * p.obs_mask[:, None, None]

    eyeK = jnp.eye(6, dtype=f32)
    eyeL = jnp.eye(3, dtype=f32)
    Hpp = Hpp + lam * eyeK * jnp.maximum(
        jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeK
    Hll_d = Hll + lam * eyeL * jnp.maximum(
        jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeL
    Hll_d = jnp.where(p.lm_opt[:, None, None], Hll_d,
                      jnp.broadcast_to(eyeL, Hll_d.shape))
    bl = bl * p.lm_opt.astype(f32)[:, None]
    return Hpp, _inv3x3(Hll_d), bp, bl, Wpl


def ba_solve_pcg(p: BAProblem, n_iters: int = 8, cg_iters: int = 40,
                 lambda0: float = 1e-4, carry=None):
    """Scalable LM with the Schur system solved by preconditioned CG using an
    IMPLICIT matvec — never materializes the (6K, 3L) off-diagonal block.

    `carry`: optional (R, t, X, lam, cost) from a previous call's
    info["carry"] — resumes the LM iteration mid-solve. This time-slicing
    is the TPU-native expression of the reference's DETACHED GBA thread
    (LoopClosing.cc:1227-1240): the full-map solve advances in bounded
    slices interleaved with the frame loop (pipeline/global_ba.GBAJob)
    instead of a concurrent CPU thread.

    S x = Hpp x - B Hll^-1 B^T x, where B^T x and B y are two gather +
    segment_sum passes over the observation array (SURVEY.md §7 hard part 3:
    irregular co-observation structure as segment reductions). The
    preconditioner is the block-diagonal pose Hessian (6x6 inverses).

    This is the full-map GBA path (reference
    Optimizer::GlobalBundleAdjustemnt, Optimizer.cc:47, run in the detached
    thread at LoopClosing.cc:2284): dense-Schur ba_solve is preferred for
    small windows; this one scales to thousands of keyframes and is the
    basis of the observation-sharded distributed solve.
    """
    K = p.R.shape[0]
    f32 = p.obs_uv.dtype
    kf_opt_f = p.kf_opt.astype(f32)
    lm_opt_f = p.lm_opt.astype(f32)

    def lm_step(R, t, X, lam):
        Hpp, Hll_inv, bp, bl, Wpl = _assemble_blocks(p, R, t, X, lam)

        def S_matvec(xp):                      # xp (K, 6)
            xp = xp * kf_opt_f[:, None]
            Btx = jax.ops.segment_sum(
                jnp.einsum('oab,oa->ob', Wpl, xp[p.obs_kf],
                           precision='highest'),
                p.obs_lm, num_segments=p.X.shape[0])          # (L, 3)
            y = jnp.einsum('lab,lb->la', Hll_inv, Btx,
                           precision='highest') * lm_opt_f[:, None]
            By = jax.ops.segment_sum(
                jnp.einsum('oab,ob->oa', Wpl, y[p.obs_lm],
                           precision='highest'),
                p.obs_kf, num_segments=K)                     # (K, 6)
            Sx = jnp.einsum('kab,kb->ka', Hpp, xp,
                            precision='highest') - By
            return Sx * kf_opt_f[:, None]

        # rhs: bp - B Hll^-1 bl
        y0 = jnp.einsum('lab,lb->la', Hll_inv, bl, precision='highest')
        By0 = jax.ops.segment_sum(
            jnp.einsum('oab,ob->oa', Wpl, y0[p.obs_lm], precision='highest'),
            p.obs_kf, num_segments=K)
        rhs = (bp - By0) * kf_opt_f[:, None]

        Minv = _inv6x6(Hpp)                                   # preconditioner

        def precond(v):
            return jnp.einsum('kab,kb->ka', Minv, v,
                              precision='highest') * kf_opt_f[:, None]

        def cg_body(carry, _):
            x, r, z, pdir, rz = carry
            Ap = S_matvec(pdir)
            pAp = jnp.sum(pdir * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * pdir
            r = r - alpha * Ap
            z = precond(r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            pdir = z + beta * pdir
            return (x, r, z, pdir, rz_new), rz_new

        x0 = jnp.zeros_like(rhs)
        z0 = precond(rhs)
        (dxp, _, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs, z0, z0, jnp.sum(rhs * z0)), None,
            length=cg_iters)
        dxp = dxp * kf_opt_f[:, None]

        # back-substitute landmarks: dxl = Hll^-1 (bl - B^T dxp)
        Btdxp = jax.ops.segment_sum(
            jnp.einsum('oab,oa->ob', Wpl, dxp[p.obs_kf], precision='highest'),
            p.obs_lm, num_segments=p.X.shape[0])
        dxl = jnp.einsum('lab,lb->la', Hll_inv, bl - Btdxp,
                         precision='highest') * lm_opt_f[:, None]

        dR, dt = lie.se3_exp(dxp)
        R_new, t_new = lie.se3_mul(dR, dt, R, t)
        return R_new, t_new, X + dxl

    def iteration(carry, _):
        R, t, X, lam, cost = carry
        R_new, t_new, X_new = lm_step(R, t, X, lam)
        new_cost = _cost(p, R_new, t_new, X_new)
        accept = new_cost < cost
        R, t, X = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), (R_new, t_new, X_new),
            (R, t, X))
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-9, 1e4)
        return (R, t, X, lam, cost), cost

    if carry is None:
        cost0 = _cost(p, p.R, p.t, p.X)
        carry0 = (p.R, p.t, p.X, jnp.asarray(lambda0, f32), cost0)
    else:
        carry0 = carry
        cost0 = carry[4]
    (R, t, X, lam, cost), costs = jax.lax.scan(
        iteration, carry0, None, length=n_iters)
    return R, t, X, {"cost0": cost0, "costs": costs, "lambda": lam,
                     "carry": (R, t, X, lam, cost)}


_inv6x6 = tpu_linalg.inv6x6


def classify_outliers(p: BAProblem, R, t, X):
    """Final chi2 classification (reference: erase observations with
    chi2 > 5.991/7.815 after local BA, Optimizer.cc:1350-1400)."""
    _, _, _, _, chi2 = _obs_terms(p, R, t, X, robust=False)
    is_stereo = jnp.isfinite(p.obs_ur)
    th = jnp.where(is_stereo, HUBER2_STEREO, HUBER2_MONO)
    return p.obs_mask & (chi2 < th)
