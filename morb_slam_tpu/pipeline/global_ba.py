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
