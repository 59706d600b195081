"""Per-keyframe mapping pipeline: new-landmark triangulation, statistics
refresh, landmark culling and local bundle adjustment — jitted programs over
the functional MapState.

TPU-native replacement for the reference's LocalMapping thread body
(/root/reference/src/LocalMapping.cc:76-313): ProcessNewKeyFrame (:326),
CreateNewMapPoints (:403, epipolar search + triangulation against the best
covisible neighbors), MapPointCulling (:368), SearchInNeighbors fuse (:713)
and LocalBundleAdjustment (Optimizer.cc:1053). The reference runs these in a
free-running thread with queues and an interruptible g2o solve; here the
whole per-keyframe pipeline is a deterministic functional update of MapState
invoked after each keyframe insertion (jit dispatch is already async, so the
host can overlap it with the next frames' tracking).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie, matching
from ..mapstate import state as ms
from ..optim import ba, vi_ba
from ..solvers import triangulation

# static capacities
N_TRI_NEIGHBORS = 8       # covisible neighbors for triangulation
                          # (reference nn=10/20/30, LocalMapping.cc:417-425;
                          # the FxF popcount Hamming matrix per neighbor is
                          # MXU-friendly batch work, and the free-feature
                          # mask shrinks each pass so later neighbors add
                          # only unseen ground)
BA_WINDOW = 12            # optimized KFs in local BA
BA_FIXED = 6              # frontier KFs held fixed
BA_ITERS = 5              # LM iterations (accept/reject; converges in ~4)
MAX_LOCAL_LM = 6144
MAX_NEW_PER_PAIR = 384    # new landmarks accepted per neighbor pair


class LocalMapConfig(NamedTuple):
    focal: float
    scale: float = 1.2
    n_levels: int = 8
    baseline: float = 0.0
    # keyframe culling breaks the KF-to-KF preintegration chain; the
    # reference merges preintegrations on cull (KeyFrame culling ->
    # MergePrevious) — until that lands, inertial configs keep all KFs
    inertial: bool = False

    @property
    def sigma2_inv(self):
        """Per-octave information (reference mvInvLevelSigma2)."""
        return 1.0 / (self.scale ** (2 * jnp.arange(self.n_levels,
                                                    dtype=jnp.float32)))


def _relative_pose(R1, t1, R2, t2):
    """T_21 = T_2w T_1w^-1 for world->cam poses."""
    R21 = lie.matmat(R2, jnp.swapaxes(R1, -1, -2))
    t21 = t2 - lie.matvec(R21, t1)
    return R21, t21


@partial(jax.jit, static_argnames=("cfg",))
def create_new_landmarks(m: ms.MapState, kf_id, cfg: LocalMapConfig,
                         win=None):
    """Triangulate new landmarks between KF `kf_id` and its best covisible
    neighbors (reference LocalMapping::CreateNewMapPoints,
    LocalMapping.cc:403). `win` optionally supplies a precomputed
    (idx, ok) covisible window (center first) — the covisibility row is a
    map-wide gather worth computing once per mapping step."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    n_neigh = min(N_TRI_NEIGHBORS, K - 1)
    if win is None:
        win = ms.local_window(m, kf_id, n_neigh + 1, min_weight=10)
    neigh_idx = win[0][1:n_neigh + 1]                   # drop self
    neigh_ok = win[1][1:n_neigh + 1]
    # always include the temporal-chain predecessor (reference adds it to
    # the covisible neighbor set, LocalMapping.cc:417-425) — right after
    # initialization the covisibility graph is too thin to surface it
    prev = m.kf_prev[kf_id]
    prev_ok = (prev >= 0) & m.kf_valid[jnp.clip(prev, 0, None)] & \
        jnp.all(neigh_idx != prev)
    neigh_idx = jnp.where(jnp.arange(n_neigh) == n_neigh - 1,
                          jnp.where(prev_ok, jnp.clip(prev, 0, None),
                                    neigh_idx),
                          neigh_idx)
    neigh_ok = jnp.where(jnp.arange(n_neigh) == n_neigh - 1,
                         neigh_ok | prev_ok, neigh_ok)

    xn1 = m.kf_feat_xn[kf_id]
    desc1 = m.kf_feat_desc[kf_id]
    oct1 = m.kf_feat_octave[kf_id]
    valid1 = m.kf_feat_valid[kf_id]
    R1, t1 = m.kf_R[kf_id], m.kf_t[kf_id]

    # cap must not exceed the feature capacity (top_k over an F-sized
    # array): small n_feat configs crashed here before this derivation
    n_new_cap = min(MAX_NEW_PER_PAIR, F)

    def per_neighbor(m, nkf, ok):
        free1 = m.kf_feat_lm[kf_id] < 0
        R2, t2 = m.kf_R[nkf], m.kf_t[nkf]
        R21, t21 = _relative_pose(R1, t1, R2, t2)
        E12 = lie.matmat(lie.so3_hat(t21), R21)
        baseline = jnp.linalg.norm(t21)
        idx = matching.search_for_triangulation(
            xn1, desc1, oct1, valid1, free1,
            m.kf_feat_xn[nkf], m.kf_feat_desc[nkf], m.kf_feat_octave[nkf],
            m.kf_feat_valid[nkf], m.kf_feat_lm[nkf] < 0,
            E12, cfg.focal, cfg.scale)
        matched = (idx >= 0) & ok & (baseline > 0.01)
        j = jnp.clip(idx, 0, None)
        x2 = m.kf_feat_xn[nkf][j]
        X1 = triangulation.triangulate_two_view(xn1, x2, R21, t21)
        good, cosp = triangulation.depth_and_reproj_checks(
            X1, xn1, x2, R21, t21, th2=5.991 / cfg.focal ** 2)
        good = good & (cosp < 0.9998) & matched
        Rwc1 = R1.T
        Xw = lie.se3_apply(Rwc1, -lie.matvec(Rwc1, t1), X1)

        score = jnp.where(good, 1.0 - cosp, -1.0)
        _, sel = jax.lax.top_k(score, n_new_cap)
        sel_good = good[sel]
        # allocate into FREE slots (culled slots are reused — an append-only
        # high-water allocator exhausts capacity and silently stops mapping)
        free_score = (~m.lm_valid).astype(jnp.int32)
        n_free_ok, free_slots = jax.lax.top_k(free_score, n_new_cap)
        rank = jnp.cumsum(sel_good.astype(jnp.int32)) - 1
        sel_good = sel_good & (n_free_ok == 1)[jnp.clip(rank, 0, None)]
        slot = jnp.where(sel_good, free_slots[jnp.clip(rank, 0, None)], L)

        feat1 = sel
        feat2 = j[sel]
        dist1 = jnp.linalg.norm(
            Xw[sel] + lie.matvec(Rwc1, t1)[None, :], axis=-1)
        dmax = dist1 * cfg.scale ** oct1[feat1].astype(jnp.float32)
        m = m._replace(
            lm_pos=m.lm_pos.at[slot].set(
                jnp.where(sel_good[:, None], Xw[sel], m.lm_pos[slot])),
            lm_valid=m.lm_valid.at[slot].set(sel_good | m.lm_valid[slot]),
            lm_ref_kf=m.lm_ref_kf.at[slot].set(
                jnp.where(sel_good, kf_id, m.lm_ref_kf[slot])),
            lm_first_ts=m.lm_first_ts.at[slot].set(
                jnp.where(sel_good, m.kf_ts[kf_id], m.lm_first_ts[slot])),
            lm_desc=m.lm_desc.at[slot].set(
                jnp.where(sel_good[:, None], desc1[feat1], m.lm_desc[slot])),
            lm_dist_max=m.lm_dist_max.at[slot].set(
                jnp.where(sel_good, dmax, m.lm_dist_max[slot])),
            lm_visible=m.lm_visible.at[slot].set(
                jnp.where(sel_good, 1, m.lm_visible[slot])),
            lm_found=m.lm_found.at[slot].set(
                jnp.where(sel_good, 1, m.lm_found[slot])),
            kf_feat_lm=m.kf_feat_lm
                .at[kf_id, feat1].set(
                    jnp.where(sel_good, slot, m.kf_feat_lm[kf_id, feat1]))
                .at[nkf, feat2].set(
                    jnp.where(sel_good, slot, m.kf_feat_lm[nkf, feat2])),
            n_lm=m.n_lm + jnp.sum(sel_good),
        )
        return m

    for i in range(n_neigh):
        m = per_neighbor(m, neigh_idx[i], neigh_ok[i])
    return m


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def fuse_in_neighbors(m: ms.MapState, kf_id, cam_params, cam_kind,
                      cfg: LocalMapConfig, win=None):
    """Project the current KF's landmarks into covisible neighbor KFs and
    bind them to free features there (and the reverse direction), so young
    landmarks accumulate the observations that keep them alive through
    culling. Replaces LocalMapping::SearchInNeighbors + ORBmatcher::Fuse
    (reference LocalMapping.cc:713, ORBmatcher.cc:1044). Without this, every
    pair-triangulated point dies at the age-2 / 3-observation cull."""
    from .. import cameras
    cam = cameras.Camera(cam_kind, cam_params)
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    n_neigh = min(N_TRI_NEIGHBORS, K - 1)
    if win is None:
        win = ms.local_window(m, kf_id, n_neigh + 1, min_weight=10)
    neigh_idx = win[0][1:n_neigh + 1]
    neigh_ok = win[1][1:n_neigh + 1]

    def fuse_into(m, src_kf, dst_kf, ok):
        """Bind src KF's landmarks to free features of dst KF."""
        lm_ids = m.kf_feat_lm[src_kf]                      # (F,)
        lm_ok = (lm_ids >= 0) & m.kf_feat_valid[src_kf] & ok
        ids = jnp.clip(lm_ids, 0, None)
        # already observed in dst? skip (scan dst's slots)
        dst_lm = m.kf_feat_lm[dst_kf]
        seen = jnp.zeros(L + 1, bool).at[
            jnp.where(dst_lm >= 0, dst_lm, L)].set(True)
        lm_ok &= ~seen[ids]
        res = matching.search_by_projection(
            m.lm_pos[ids], m.lm_normal[ids], m.lm_dist_max[ids],
            m.lm_desc[ids], lm_ok & m.lm_valid[ids],
            m.kf_R[dst_kf], m.kf_t[dst_kf],
            lambda Xc: cameras.project(cam, Xc),
            m.kf_feat_uv[dst_kf], m.kf_feat_octave[dst_kf],
            m.kf_feat_desc[dst_kf],
            m.kf_feat_valid[dst_kf] & (dst_lm < 0),
            (10000, 10000), radius_px=3.0, scale=cfg.scale,
            n_levels=cfg.n_levels, max_dist_th=50, ratio=1.0)
        new_lm = jnp.where(res.feat_lm >= 0,
                           ids[jnp.clip(res.feat_lm, 0, None)], dst_lm)
        return m._replace(kf_feat_lm=m.kf_feat_lm.at[dst_kf].set(new_lm))

    for i in range(n_neigh):
        m = fuse_into(m, kf_id, neigh_idx[i], neigh_ok[i])
        m = fuse_into(m, neigh_idx[i], kf_id, neigh_ok[i])
    return m


@jax.jit
def cull_landmarks(m: ms.MapState, kf_id):
    """Recent-landmark culling (reference LocalMapping::MapPointCulling,
    LocalMapping.cc:368): found/visible ratio < 0.25, or young landmarks
    that failed to accumulate observations. Both tests apply ONLY to
    recently created landmarks (reference mlpRecentAddedMapPoints — a
    point that survives its probation is kept until BA/fuse detaches it):
    applying the ratio test map-wide erased everything behind a sweeping
    camera, destroying loop-closure and relocalization ground."""
    n_obs = ms.lm_obs_count(m)
    # probation age measured in keyframe INSERTS via timestamp rank (slot
    # arithmetic breaks once slots recycle): a landmark created within the
    # last 4 inserts is "recent"; one created >= 2 inserts ago must have
    # accumulated observations
    K = m.kf_valid.shape[0]
    ts_v = jnp.where(m.kf_valid, m.kf_ts, -jnp.inf)
    top4 = jax.lax.top_k(ts_v, min(4, K))[0]
    thr_recent = top4[-1]          # ts of the 4th-newest keyframe
    thr_age2 = top4[min(2, K - 1)]  # ts of the 3rd-newest keyframe
    recent = jnp.isfinite(m.lm_first_ts) & (m.lm_first_ts >= thr_recent)
    aged2 = m.lm_first_ts <= thr_age2
    ratio = m.lm_found.astype(jnp.float32) / jnp.clip(
        m.lm_visible.astype(jnp.float32), 1.0, None)
    seen_enough = jnp.where(recent & aged2, n_obs >= 3, True)
    ratio_ok = jnp.where(recent & (m.lm_visible > 4), ratio > 0.25, True)
    keep = m.lm_valid & seen_enough & ratio_ok & (n_obs >= 1)
    L = m.lm_valid.shape[0]
    dropped_lookup = jnp.concatenate([~keep, jnp.asarray([False])])
    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    detach = dropped_lookup[slot_lm]
    return m._replace(lm_valid=keep,
                      kf_feat_lm=jnp.where(detach, -1, m.kf_feat_lm))


@partial(jax.jit, static_argnames=("cfg",))
def local_bundle_adjustment(m: ms.MapState, kf_id, cfg: LocalMapConfig,
                            win=None):
    """Local BA over the covisible window (reference
    Optimizer::LocalBundleAdjustment, Optimizer.cc:1053): window KFs
    optimized, frontier anchors fixed, local landmarks refined; outlier
    observations detached afterwards (Optimizer.cc:1350-1400)."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    KW = min(BA_WINDOW + BA_FIXED, K)
    n_opt = min(BA_WINDOW, K)
    if win is None:
        win = ms.local_window(m, kf_id, KW, min_weight=10)
    win_idx, win_ok = win[0][:KW], win[1][:KW]
    # fix the two oldest KFs in the window: one fixed camera leaves the
    # monocular scale gauge free and the map inflates run-away (observed
    # x3 in 4 keyframes); two pinned poses pin the scale
    oldest = jnp.sort(jnp.where(win_ok, win_idx, 1 << 30))[:2]
    opt_mask = (win_ok & (jnp.arange(KW) < n_opt) & (win_idx != 0)
                & (win_idx != oldest[0]) & (win_idx != oldest[1]))

    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    win_slots = jnp.where(win_ok[:, None], slot_lm[win_idx], L)   # (KW, F)

    # local landmark set
    lm_in = jnp.zeros(L + 1, bool).at[win_slots.reshape(-1)].set(True)
    lm_in = lm_in[:L] & m.lm_valid
    n_local = min(MAX_LOCAL_LM, L)
    _, lm_sel = jax.lax.top_k(lm_in.astype(jnp.int32), n_local)
    lm_sel_ok = lm_in[lm_sel]
    g2l = jnp.full(L + 1, -1, jnp.int32).at[lm_sel].set(
        jnp.where(lm_sel_ok, jnp.arange(n_local, dtype=jnp.int32), -1))

    obs_lm_local = g2l[win_slots]                                 # (KW, F)
    obs_ok = (obs_lm_local >= 0) & m.kf_feat_valid[win_idx] & win_ok[:, None]
    inv_sig2 = cfg.sigma2_inv[jnp.clip(m.kf_feat_octave[win_idx], 0,
                                       cfg.n_levels - 1)]
    info = (cfg.focal ** 2) * inv_sig2                            # (KW, F)

    prob = ba.make_problem(
        R=m.kf_R[win_idx], t=m.kf_t[win_idx],
        X=m.lm_pos[lm_sel],
        obs_kf=jnp.broadcast_to(
            jnp.arange(KW, dtype=jnp.int32)[:, None], (KW, F)).reshape(-1),
        obs_lm=jnp.clip(obs_lm_local, 0, None).reshape(-1),
        obs_uv=m.kf_feat_xn[win_idx].reshape(KW * F, 2),
        obs_info=info.reshape(-1),
        obs_mask=obs_ok.reshape(-1),
        kf_opt=opt_mask,
        lm_opt=lm_sel_ok,
        obs_ur=m.kf_feat_ur[win_idx].reshape(-1),
        baseline=cfg.baseline,
    )
    Rn, tn, Xn, _ = ba.ba_solve(prob, n_iters=BA_ITERS)

    # write back
    m = m._replace(
        kf_R=m.kf_R.at[win_idx].set(
            jnp.where(opt_mask[:, None, None], Rn, m.kf_R[win_idx])),
        kf_t=m.kf_t.at[win_idx].set(
            jnp.where(opt_mask[:, None], tn, m.kf_t[win_idx])),
        lm_pos=m.lm_pos.at[lm_sel].set(
            jnp.where(lm_sel_ok[:, None], Xn, m.lm_pos[lm_sel])),
    )

    # outlier detachment
    keep = ba.classify_outliers(prob._replace(R=Rn, t=tn, X=Xn), Rn, tn, Xn)
    drop = (~keep.reshape(KW, F)) & obs_ok
    new_feat_lm = jnp.where(drop, -1, m.kf_feat_lm[win_idx])
    m = m._replace(
        kf_feat_lm=m.kf_feat_lm.at[win_idx].set(
            jnp.where(win_ok[:, None], new_feat_lm, m.kf_feat_lm[win_idx])))
    return m


def _vi_window_problem(m: ms.MapState, ki, win_idx, win_ok, opt_pose,
                       opt_vb, cfg: LocalMapConfig, prior_bias_info,
                       n_local_lm: int):
    """Gather a VIBAProblem over window keyframes `win_idx` (W,) from the
    map + preintegration store. opt_pose/opt_vb: (W,) bool."""

    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    W = win_idx.shape[0]
    f32 = m.kf_t.dtype

    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    win_slots = jnp.where(win_ok[:, None], slot_lm[win_idx], L)     # (W, F)
    lm_in = jnp.zeros(L + 1, bool).at[win_slots.reshape(-1)].set(True)
    lm_in = lm_in[:L] & m.lm_valid
    n_local = min(n_local_lm, L)
    _, lm_sel = jax.lax.top_k(lm_in.astype(jnp.int32), n_local)
    lm_sel_ok = lm_in[lm_sel]
    g2l_lm = jnp.full(L + 1, -1, jnp.int32).at[lm_sel].set(
        jnp.where(lm_sel_ok, jnp.arange(n_local, dtype=jnp.int32), -1))

    obs_lm_local = g2l_lm[win_slots]
    obs_ok = (obs_lm_local >= 0) & m.kf_feat_valid[win_idx] & win_ok[:, None]
    inv_sig2 = cfg.sigma2_inv[jnp.clip(m.kf_feat_octave[win_idx], 0,
                                       cfg.n_levels - 1)]
    info = (cfg.focal ** 2) * inv_sig2

    # body states (body == camera)
    R_wb = jnp.swapaxes(m.kf_R[win_idx], -1, -2)
    p_wb = -lie.matvec(R_wb, m.kf_t[win_idx])

    # inertial edges: edge at window slot w connects g2l[prev[kf_w]] -> w
    g2l_kf = jnp.full(K + 1, -1, jnp.int32).at[
        jnp.where(win_ok, win_idx, K)].set(
        jnp.where(win_ok, jnp.arange(W, dtype=jnp.int32), -1), mode="drop")
    kf_g = win_idx
    prev_g = jnp.clip(ki.prev[kf_g], 0, K - 1)
    e_prev_l = g2l_kf[jnp.where(ki.prev[kf_g] >= 0, prev_g, K)]
    e_valid = (ki.valid[kf_g] & win_ok & (e_prev_l >= 0))
    e_prev_l = jnp.where(e_valid, e_prev_l, 0)

    return vi_ba.VIBAProblem(
        R_wb=R_wb, p_wb=p_wb, v=m.kf_v[win_idx], bias=m.kf_bias[win_idx],
        fix_pose=~opt_pose, fix_vb=~opt_vb,
        X=m.lm_pos[lm_sel], lm_opt=lm_sel_ok,
        obs_kf=jnp.broadcast_to(
            jnp.arange(W, dtype=jnp.int32)[:, None], (W, F)).reshape(-1),
        obs_lm=jnp.clip(obs_lm_local, 0, None).reshape(-1),
        obs_uv=m.kf_feat_xn[win_idx].reshape(W * F, 2),
        obs_ur=m.kf_feat_ur[win_idx].reshape(-1),
        obs_info=info.reshape(-1),
        obs_mask=obs_ok.reshape(-1),
        baseline=jnp.asarray(cfg.baseline, f32),
        e_valid=e_valid, e_prev=e_prev_l,
        e_dt=ki.dt[kf_g], e_dR=ki.dR[kf_g], e_dV=ki.dV[kf_g],
        e_dP=ki.dP[kf_g],
        e_JRg=ki.J_Rg[kf_g], e_JVg=ki.J_Vg[kf_g], e_JVa=ki.J_Va[kf_g],
        e_JPg=ki.J_Pg[kf_g], e_JPa=ki.J_Pa[kf_g],
        e_info=vi_ba.floor_info(ki.info[kf_g]), e_bias0=ki.bias0[kf_g],
        e_rw_info=ki.rw_info[kf_g],
        prior_bias_info=jnp.broadcast_to(prior_bias_info, (W, 6)),
    ), lm_sel, lm_sel_ok, obs_ok


def _vi_write_back(m: ms.MapState, prob, win_idx, win_ok, opt_pose, opt_vb,
                   R_wb, p_wb, v, bias, X, lm_sel, lm_sel_ok, obs_ok):

    W, F = obs_ok.shape
    R_cw = jnp.swapaxes(R_wb, -1, -2)
    t_cw = -lie.matvec(R_cw, p_wb)
    wp = (opt_pose & win_ok)
    wv = (opt_vb & win_ok)
    m = m._replace(
        kf_R=m.kf_R.at[win_idx].set(
            jnp.where(wp[:, None, None], R_cw, m.kf_R[win_idx])),
        kf_t=m.kf_t.at[win_idx].set(
            jnp.where(wp[:, None], t_cw, m.kf_t[win_idx])),
        kf_v=m.kf_v.at[win_idx].set(
            jnp.where(wv[:, None], v, m.kf_v[win_idx])),
        kf_bias=m.kf_bias.at[win_idx].set(
            jnp.where(wv[:, None], bias, m.kf_bias[win_idx])),
        lm_pos=m.lm_pos.at[lm_sel].set(
            jnp.where(lm_sel_ok[:, None], X, m.lm_pos[lm_sel])),
    )
    keep = vi_ba.classify_outliers(prob, R_wb, p_wb, X).reshape(W, F)
    drop = (~keep) & obs_ok
    new_feat_lm = jnp.where(drop, -1, m.kf_feat_lm[win_idx])
    return m._replace(
        kf_feat_lm=m.kf_feat_lm.at[win_idx].set(
            jnp.where(win_ok[:, None], new_feat_lm,
                      m.kf_feat_lm[win_idx])))


def _chain_window(ki, kf_valid, kf_id, W):
    """Temporal keyframe window built by walking the preintegration chain
    `ki.prev` backwards from `kf_id` (the reference builds LocalInertialBA
    windows via mPrevKF chaining, Optimizer.cc:2324 — NOT by keyframe id
    arithmetic: slot ids stop being temporal once culling recycles slots).
    Returns (win_idx oldest->newest (W,), win_ok)."""
    K = kf_valid.shape[0]

    def step(cur, _):
        c = jnp.clip(cur, 0, K - 1)
        nxt = ki.prev[c]
        ok = (cur >= 0) & (nxt >= 0) & kf_valid[jnp.clip(nxt, 0, K - 1)]
        return jnp.where(ok, nxt, -1), cur

    _, newest_first = jax.lax.scan(step, kf_id, None, length=W)
    win_idx = newest_first[::-1]
    win_ok = (win_idx >= 0) & kf_valid[jnp.clip(win_idx, 0, K - 1)]
    return jnp.clip(win_idx, 0, K - 1), win_ok


@partial(jax.jit, static_argnames=("cfg",))
def local_inertial_ba(m: ms.MapState, ki, kf_id, cfg: LocalMapConfig):
    """Visual-inertial local BA over the TEMPORAL keyframe window (reference
    Optimizer::LocalInertialBA, Optimizer.cc:2324): the last N_OPT keyframes
    optimize pose+velocity+bias, connected by preintegration and bias-RW
    edges; a frontier of older keyframes is held fixed to anchor the gauge;
    window landmarks refine; outliers detach."""

    K = m.kf_valid.shape[0]
    N_OPT = 10       # reference: 10 opt KFs (25 when bLarge)
    N_FIX = 4
    W = min(N_OPT + N_FIX, K)
    win_idx, win_ok = _chain_window(ki, m.kf_valid, kf_id, W)
    is_opt = (jnp.arange(W) >= W - min(N_OPT, W)) & (win_idx != 0) & win_ok
    prob, lm_sel, lm_sel_ok, obs_ok = _vi_window_problem(
        m, ki, win_idx, win_ok, is_opt, is_opt, cfg,
        jnp.zeros(6, m.kf_t.dtype), MAX_LOCAL_LM)
    R_wb, p_wb, v, bias, X, _ = vi_ba.vi_ba_solve(prob, n_iters=6)
    return _vi_write_back(m, prob, win_idx, win_ok, is_opt, is_opt,
                          R_wb, p_wb, v, bias, X, lm_sel, lm_sel_ok, obs_ok)


@partial(jax.jit, static_argnames=("cfg", "window", "fix_landmarks"))
def full_inertial_ba(m: ms.MapState, ki, last_kf, cfg: LocalMapConfig,
                     window: int = 32, prior_gyro=1.0, prior_acc=1e4,
                     fix_landmarks: bool = False):
    """Full visual-inertial BA over (up to `window`) keyframes — the
    reference's FullInertialBA used by the staged IMU initialization
    (Optimizer.cc:364, called from LocalMapping::InitializeIMU/VIBA1/VIBA2,
    LocalMapping.cc:212-272). Bias priors pull toward zero with the stage's
    priorG/priorA weights. KF0 pose stays fixed (gauge)."""
    K = m.kf_valid.shape[0]

    W = min(window, K)
    win_idx, win_ok = _chain_window(ki, m.kf_valid, last_kf, W)
    is_opt = win_ok & (win_idx != 0)
    prior = jnp.concatenate([jnp.full(3, prior_gyro, m.kf_t.dtype),
                             jnp.full(3, prior_acc, m.kf_t.dtype)])
    prob, lm_sel, lm_sel_ok, obs_ok = _vi_window_problem(
        m, ki, win_idx, win_ok, is_opt, win_ok, cfg, prior, MAX_LOCAL_LM)
    if fix_landmarks:
        prob = prob._replace(lm_opt=jnp.zeros_like(prob.lm_opt))
    R_wb, p_wb, v, bias, X, info = vi_ba.vi_ba_solve(prob, n_iters=10)
    m = _vi_write_back(m, prob, win_idx, win_ok, is_opt, win_ok,
                       R_wb, p_wb, v, bias, X, lm_sel, lm_sel_ok, obs_ok)
    return m, info["costs"]


@partial(jax.jit, static_argnames=("n_min_others", "max_oct"))
def _redundant_rows(m: ms.MapState, rows, n_min_others: int = 3,
                    max_oct: int = 8):
    """(R, F) bool — for keyframes `rows` (R,), whether each slot's landmark
    is observed by >= n_min_others OTHER keyframes at the same or finer
    scale (reference KeyFrameCulling's scaleLevel_i <= scaleLevel + 1
    condition, LocalMapping.cc:906-928), via a per-landmark octave
    histogram + cumulative count. The histogram covers the whole map; the
    support gather touches only the candidate rows (the map-wide gather
    was one of the mapping step's top costs)."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    slot_ok = m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_feat_lm >= 0)
    lm = jnp.where(slot_ok, m.kf_feat_lm, L)
    oct_ = jnp.clip(m.kf_feat_octave, 0, max_oct - 1)
    idx = lm * max_oct + jnp.where(slot_ok, oct_, 0)
    hist = jax.ops.segment_sum(
        slot_ok.reshape(-1).astype(jnp.int32), idx.reshape(-1),
        num_segments=(L + 1) * max_oct)[:L * max_oct].reshape(L, max_oct)
    cum = jnp.cumsum(hist, axis=1)           # obs with octave <= column
    cum = jnp.concatenate([cum, jnp.zeros((1, max_oct), cum.dtype)])
    lm_r = lm[rows]                          # (R, F)
    ok_r = slot_ok[rows]
    j = jnp.clip(oct_[rows] + 1, 0, max_oct - 1)
    support = cum[lm_r, j] - 1               # exclude the slot itself
    return (support >= n_min_others) & ok_r, ok_r


def cull_keyframes(m: ms.MapState, kf_id, win=None):
    """Redundant-keyframe culling (reference LocalMapping::KeyFrameCulling,
    LocalMapping.cc:886): a covisible KF is dropped when >= 90% of its
    landmarks are observed by at least 3 other keyframes at the same or
    finer scale; the temporal window bound (Nd=21) is inherited from the
    covisible-window candidate set. KF0 and the newest KF are never
    culled."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    nc = min(12, K)
    if win is None:
        win = ms.local_window(m, kf_id, nc, min_weight=10)
    cand, cand_ok = win[0][:nc], win[1][:nc]
    redundant, has = _redundant_rows(m, cand)        # (nc, F)
    n_lm_cand = jnp.sum(has, axis=1)
    frac_cand = jnp.sum(redundant, axis=1) / jnp.clip(n_lm_cand, 1, None)
    # scatter candidate stats back onto (K,) for the cull decision
    frac = jnp.zeros(K, m.kf_t.dtype).at[cand].set(
        jnp.where(cand_ok, frac_cand, 0.0), mode="drop")
    n_lm_kf = jnp.zeros(K, n_lm_cand.dtype).at[cand].set(
        jnp.where(cand_ok, n_lm_cand, 0), mode="drop")
    is_cand = jnp.zeros(K, bool).at[jnp.where(cand_ok, cand, 0)].set(
        cand_ok, mode="drop")
    cull = (is_cand & m.kf_valid & (frac > 0.9) & (n_lm_kf > 20)
            & (jnp.arange(K) != 0) & (jnp.arange(K) != kf_id))
    # cull at most 2 per step (stability): keep the highest-frac ones
    score = jnp.where(cull, frac, -1.0)
    _, top2 = jax.lax.top_k(score, 2)
    keep_cull = jnp.zeros(K, bool).at[top2].set(score[top2] > 0)
    # splice the temporal chain around every culled KF so no kf_prev edge
    # dangles into a dead (and later recyclable) slot — the reference's
    # SetBadFlag reparents spanning-tree children the same way. Two
    # passes cover a chain of two culled keyframes.
    prev = m.kf_prev
    for _ in range(2):
        p = jnp.clip(prev, 0, K - 1)
        dangling = (prev >= 0) & keep_cull[p]
        prev = jnp.where(dangling, m.kf_prev[p], prev)
    m = m._replace(kf_valid=m.kf_valid & ~keep_cull, kf_prev=prev)
    # landmarks referencing a culled keyframe re-parent to a surviving
    # observer (reference KeyFrame::SetBadFlag)
    return ms.reparent_landmark_refs(m)


def _stats_window(m: ms.MapState, kf_id):
    """Keyframe window whose landmarks need a stats refresh after mapping:
    the BA window covers everything triangulation/fusion/BA touched."""
    KW = min(BA_WINDOW + BA_FIXED, m.kf_valid.shape[0])
    return ms.local_window(m, kf_id, KW, min_weight=10)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def mapping_step(m: ms.MapState, kf_id, cam_params, cam_kind,
                 cfg: LocalMapConfig):
    """Full per-keyframe mapping pipeline (reference LocalMapping::Run body):
    triangulate -> fuse -> cull points -> local BA -> cull KFs -> stats.
    Landmark statistics refresh WINDOWED to the touched keyframes (the
    full-map refresh dominated the mapping budget)."""
    K = m.kf_valid.shape[0]
    KW = min(BA_WINDOW + BA_FIXED, K)
    # ONE covisibility-window computation feeds triangulation, stats,
    # fusion; a refresh after fusion feeds BA + culling (each
    # covisibility row is a map-wide gather — formerly recomputed 6x)
    win = ms.local_window(m, kf_id, KW, min_weight=10)
    m = create_new_landmarks(m, kf_id, cfg, win=win)
    m = ms.update_landmark_stats_window(m, win[0], win[1])
    m = fuse_in_neighbors(m, kf_id, cam_params, cam_kind, cfg, win=win)
    m = cull_landmarks(m, kf_id)
    win = ms.local_window(m, kf_id, KW, min_weight=10)
    m = local_bundle_adjustment(m, kf_id, cfg, win=win)
    if not cfg.inertial:
        m = cull_keyframes(m, kf_id, win=win)
    m = ms.update_landmark_stats_window(m, win[0], win[1])
    return m


@jax.jit
def cull_keyframes_inertial(m: ms.MapState, ki, kf_id, win=None):
    """Redundant-keyframe culling for INERTIAL maps: the culled keyframe's
    preintegration merges into its temporal successor so the IMU chain
    stays exact (reference KeyFrameCulling + Preintegrated::MergePrevious,
    LocalMapping.cc:886 + ImuTypes.cc:248). Culls at most ONE keyframe per
    step; the merged span is bounded (reference: < 3 s)."""
    from ..optim import inertial as inertial_mod
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    nc = min(12, K)
    if win is None:
        win = ms.local_window(m, kf_id, nc, min_weight=10)
    cand, cand_ok = win[0][:nc], win[1][:nc]
    redundant, has = _redundant_rows(m, cand)
    n_lm_cand = jnp.sum(has, axis=1)
    frac_cand = jnp.sum(redundant, axis=1) / jnp.clip(n_lm_cand, 1, None)
    frac = jnp.zeros(K, m.kf_t.dtype).at[cand].set(
        jnp.where(cand_ok, frac_cand, 0.0), mode="drop")
    n_lm_kf = jnp.zeros(K, n_lm_cand.dtype).at[cand].set(
        jnp.where(cand_ok, n_lm_cand, 0), mode="drop")
    is_cand = jnp.zeros(K, bool).at[jnp.where(cand_ok, cand, 0)].set(
        cand_ok, mode="drop")
    # each culled KF must have a valid preintegration AND a successor edge
    is_next_of = lambda k: (ki.prev == k) & ki.valid
    cull = (is_cand & m.kf_valid & (frac > 0.9) & (n_lm_kf > 20)
            & (jnp.arange(K) != 0) & (jnp.arange(K) != kf_id)
            & ki.valid)
    score = jnp.where(cull, frac, -1.0)
    k = jnp.argmax(score)
    nxt_mask = is_next_of(k)
    nxt = jnp.argmax(nxt_mask)
    can = ((score[k] > 0) & jnp.any(nxt_mask)
           & (ki.dt[k] + ki.dt[nxt] < 3.0))
    ki2 = inertial_mod.merge_entry_into_next(ki, k, nxt)
    m2 = m._replace(kf_valid=m.kf_valid.at[k].set(False),
                    kf_prev=m.kf_prev.at[nxt].set(m.kf_prev[k]))
    m2 = ms.reparent_landmark_refs(m2)
    m_out = jax.tree.map(lambda a, b: jnp.where(can, a, b), m2, m)
    ki_out = jax.tree.map(lambda a, b: jnp.where(can, a, b), ki2, ki)
    return m_out, ki_out


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def mapping_step_inertial(m: ms.MapState, ki, kf_id, cam_params, cam_kind,
                          cfg: LocalMapConfig):
    """Per-keyframe mapping with LocalInertialBA in place of the visual
    local BA (reference LocalMapping::Run switching to LocalInertialBA once
    the map is IMU-initialized, LocalMapping.cc:147-187). Returns
    (map, kf_imu) — inertial culling merges preintegration entries."""
    K = m.kf_valid.shape[0]
    KW = min(BA_WINDOW + BA_FIXED, K)
    win = ms.local_window(m, kf_id, KW, min_weight=10)
    m = create_new_landmarks(m, kf_id, cfg, win=win)
    m = ms.update_landmark_stats_window(m, win[0], win[1])
    m = fuse_in_neighbors(m, kf_id, cam_params, cam_kind, cfg, win=win)
    m = cull_landmarks(m, kf_id)
    m = local_inertial_ba(m, ki, kf_id, cfg)
    win = ms.local_window(m, kf_id, KW, min_weight=10)
    m, ki = cull_keyframes_inertial(m, ki, kf_id, win=win)
    m = ms.update_landmark_stats_window(m, win[0], win[1])
    return m, ki
