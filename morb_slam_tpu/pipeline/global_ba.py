"""Global bundle adjustment over the whole map.

TPU-native replacement for the reference's detached GBA thread
(LoopClosing::RunGlobalBundleAdjustment, /root/reference/src/LoopClosing.cc:
2284-2536, calling Optimizer::GlobalBundleAdjustemnt, Optimizer.cc:47): one
jitted LM+PCG program over every valid keyframe and landmark. The reference
runs GBA in a detached std::thread and afterwards propagates the correction
to keyframes/points created meanwhile through the spanning tree
(LoopClosing.cc:2393-2460); here jit dispatch is already asynchronous and the
functional MapState cannot grow mid-solve, so the post-hoc propagation
machinery disappears — the caller simply assigns the returned state.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..mapstate import state as ms
from ..optim import ba
from .local_mapping import LocalMapConfig


@partial(jax.jit, static_argnames=("cfg", "n_iters", "cg_iters"))
def global_bundle_adjustment(m: ms.MapState, cfg: LocalMapConfig,
                             n_iters: int = 8, cg_iters: int = 40):
    """Full-map BA: all valid KFs (except KF0, the gauge anchor) and all
    valid landmarks, solved with the implicit-Schur PCG path (scales to the
    whole map where the dense-B window solver cannot).

    Returns (new_map, info). Outlier observations (chi2 above the reference's
    5.991/7.815 gates) are detached afterwards, like the reference erases
    them after GBA/local BA (Optimizer.cc:1350-1400).
    """
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]

    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, 0)
    obs_ok = (m.kf_feat_lm >= 0) & m.kf_feat_valid & m.kf_valid[:, None] \
        & m.lm_valid[slot_lm]
    inv_sig2 = cfg.sigma2_inv[jnp.clip(m.kf_feat_octave, 0,
                                       cfg.n_levels - 1)]
    info_w = (cfg.focal ** 2) * inv_sig2

    prob = ba.make_problem(
        R=m.kf_R, t=m.kf_t, X=m.lm_pos,
        obs_kf=jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, F)).reshape(-1),
        obs_lm=slot_lm.reshape(-1),
        obs_uv=m.kf_feat_xn.reshape(K * F, 2),
        obs_info=info_w.reshape(-1),
        obs_mask=obs_ok.reshape(-1),
        kf_opt=m.kf_valid & (jnp.arange(K) != 0),
        lm_opt=m.lm_valid,
        obs_ur=m.kf_feat_ur.reshape(-1),
        baseline=cfg.baseline,
    )
    Rn, tn, Xn, info = ba.ba_solve_pcg(prob, n_iters=n_iters,
                                       cg_iters=cg_iters)

    m = m._replace(
        kf_R=jnp.where(prob.kf_opt[:, None, None], Rn, m.kf_R),
        kf_t=jnp.where(prob.kf_opt[:, None], tn, m.kf_t),
        lm_pos=jnp.where(m.lm_valid[:, None], Xn, m.lm_pos),
    )
    keep = ba.classify_outliers(prob, Rn, tn, Xn)
    drop = (~keep.reshape(K, F)) & obs_ok
    m = m._replace(kf_feat_lm=jnp.where(drop, -1, m.kf_feat_lm))
    return m, info


def _build_global_problem(m: ms.MapState, cfg: LocalMapConfig):
    K, F = m.kf_feat_lm.shape
    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, 0)
    obs_ok = (m.kf_feat_lm >= 0) & m.kf_feat_valid & m.kf_valid[:, None] \
        & m.lm_valid[slot_lm]
    inv_sig2 = cfg.sigma2_inv[jnp.clip(m.kf_feat_octave, 0,
                                       cfg.n_levels - 1)]
    info_w = (cfg.focal ** 2) * inv_sig2
    return ba.make_problem(
        R=m.kf_R, t=m.kf_t, X=m.lm_pos,
        obs_kf=jnp.broadcast_to(
            jnp.arange(K, dtype=jnp.int32)[:, None], (K, F)).reshape(-1),
        obs_lm=slot_lm.reshape(-1),
        obs_uv=m.kf_feat_xn.reshape(K * F, 2),
        obs_info=info_w.reshape(-1),
        obs_mask=obs_ok.reshape(-1),
        kf_opt=m.kf_valid & (jnp.arange(K) != 0),
        lm_opt=m.lm_valid,
        obs_ur=m.kf_feat_ur.reshape(-1),
        baseline=cfg.baseline,
    )


@partial(jax.jit, static_argnames=("n_iters", "cg_iters"))
def _gba_slice(prob, carry, n_iters: int, cg_iters: int):
    _, _, _, info = ba.ba_solve_pcg(prob, n_iters=n_iters,
                                    cg_iters=cg_iters, carry=carry)
    return info["carry"]


@jax.jit
def gba_reconcile(m_now: ms.MapState, snap_kf_valid, snap_kf_ts,
                  snap_lm_valid, snap_lm_ts, R_g, t_g, X_g):
    """Apply a finished detached-GBA result to the LIVE map (reference
    RunGlobalBundleAdjustment's correction pass, LoopClosing.cc:2393-2460):
    keyframes that existed at the snapshot adopt their refined poses;
    keyframes created meanwhile are corrected through their nearest
    snapshot ANCESTOR on the temporal chain (the reference walks the
    spanning tree with mnBAGlobalForKF bookkeeping); landmarks follow —
    snapshot landmarks take their refined positions, newer ones move with
    their reference keyframe. Slot identity across the GBA is checked by
    timestamp (slots recycle), so a slot reused by a different keyframe or
    landmark is treated as new."""
    from .. import lie
    K = m_now.kf_valid.shape[0]
    idx = jnp.arange(K)
    same_kf = snap_kf_valid & m_now.kf_valid & \
        (m_now.kf_ts == snap_kf_ts)

    # nearest snapshot ancestor along kf_prev (bounded walk)
    anc = idx
    found = same_kf
    for _ in range(16):
        prv = m_now.kf_prev[anc]
        step = (~found) & (prv >= 0)
        anc = jnp.where(step, jnp.clip(prv, 0, K - 1), anc)
        found = found | same_kf[anc]
    a = jnp.where(found, anc, 0)
    # T_k_new = T_k_now o T_a_now^-1 o T_a_gba  (== T_k_gba when a == k)
    Rai, tai = lie.se3_inv(m_now.kf_R[a], m_now.kf_t[a])
    Rm, tm = lie.se3_mul(Rai, tai, R_g[a], t_g[a])
    R_new, t_new = lie.se3_mul(m_now.kf_R, m_now.kf_t, Rm, tm)
    upd = m_now.kf_valid & found
    R_out = jnp.where(upd[:, None, None], R_new, m_now.kf_R)
    t_out = jnp.where(upd[:, None], t_new, m_now.kf_t)
    # world-frame velocities rotate with each keyframe's orientation
    # correction (reference SetVelocity(Rcor * Vw), LoopClosing.cc:1120)
    R_cor = lie.matmat(jnp.swapaxes(R_out, -1, -2), m_now.kf_R)
    v_out = jnp.where(upd[:, None], lie.matvec(R_cor, m_now.kf_v),
                      m_now.kf_v)

    L = m_now.lm_valid.shape[0]
    same_lm = snap_lm_valid & m_now.lm_valid & \
        (m_now.lm_first_ts == snap_lm_ts)
    ref = jnp.clip(m_now.lm_ref_kf, 0, K - 1)
    Xc = lie.se3_apply(m_now.kf_R[ref], m_now.kf_t[ref], m_now.lm_pos)
    Rri, tri = lie.se3_inv(R_out[ref], t_out[ref])
    X_via_ref = lie.se3_apply(Rri, tri, Xc)
    ref_ok = upd[ref] & (m_now.lm_ref_kf >= 0)
    X_out = jnp.where(same_lm[:, None], X_g,
                      jnp.where((m_now.lm_valid & ref_ok)[:, None],
                                X_via_ref, m_now.lm_pos))
    return m_now._replace(kf_R=R_out, kf_t=t_out, kf_v=v_out, lm_pos=X_out)


class GBAJob:
    """Detached global BA, time-sliced (reference LoopClosing's GBA thread
    + mbStopGBA protocol): the solve over a SNAPSHOT of the map advances a
    bounded number of LM iterations per keyframe insert while tracking and
    mapping continue on the live map; when the last slice lands the result
    is reconciled (gba_reconcile). Abort by dropping the object."""

    def __init__(self, m_snapshot: ms.MapState, cfg: LocalMapConfig,
                 total_iters: int = 8, slice_iters: int = 2,
                 cg_iters: int = 40):
        self.prob = _build_global_problem(m_snapshot, cfg)
        self.snap = (m_snapshot.kf_valid, m_snapshot.kf_ts,
                     m_snapshot.lm_valid, m_snapshot.lm_first_ts)
        self.carry = None
        self.left = total_iters
        self.slice_iters = slice_iters
        self.cg_iters = cg_iters

    def advance(self) -> bool:
        """Dispatch one slice; True when the solve is complete."""
        self.carry = _gba_slice(self.prob, self.carry, self.slice_iters,
                                self.cg_iters)
        self.left -= self.slice_iters
        return self.left <= 0

    def reconcile(self, m_now: ms.MapState) -> ms.MapState:
        R, t, X, _, _ = self.carry
        return gba_reconcile(m_now, *self.snap, R, t, X)
