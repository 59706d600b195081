"""Multi-map Atlas: stashed maps, new-map recovery, and Sim(3) map merging.

TPU-native replacement for the reference's Atlas multi-map store
(/root/reference/src/Atlas.cc, include/Atlas.h:48-158) and the LoopClosing
merge path (MergeLocal, /root/reference/src/LoopClosing.cc:1245): when
tracking is lost beyond recovery the tracker stashes the active MapState and
starts a fresh one (reference Tracking::CreateMapInAtlas, Tracking.cc:2479);
when place recognition later finds the stashed map again, `merge_maps`
transforms the stashed map through the welding Sim(3) and appends its
keyframes/landmarks into the active map's free capacity — a pure array
concatenation with id remapping, instead of the reference's multi-week
pointer surgery (KFDB migration, spanning-tree splicing, LoopClosing.cc:
1245-1817).

The merged map keeps the ACTIVE map's ids stable (old entities land at
offsets), so the tracker's live references (ref_kf, feature->landmark
associations) survive the merge untouched.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .. import lie
from . import state as ms


@dataclass
class StashedMap:
    """Host-side record of one inactive map (reference Atlas::mspMaps
    entry)."""
    gen: int                   # map generation id (reference Map::mnId)
    m: ms.MapState
    db: object                 # keyframe database (BoW index) of this map
    n_kf: int
    kf_imu: object = None      # inertial per-KF preintegration store
    merged_into_gen: int = -1  # set when welded into a later map
    kf_offset: int = 0         # id offset applied by the merge


def sim3_from_cam_pair(s_c, R_c, t_c, R_kf_new, t_kf_new, R_kf_old,
                       t_kf_old):
    """World-level welding Sim3 from a camera-level Sim3 match.

    (s_c, R_c, t_c) maps old-cand-CAMERA points -> new-kf-CAMERA points
    (solve_sim3 convention X1 ~ S X2). Returns S_wn<-wo mapping old-map WORLD
    coords into active-map WORLD coords:
        S_wn_wo = T_cw_new^-1  *  S_c  *  T_cw_old
    """
    one = jnp.ones_like(s_c)
    # T_cw_old as Sim3
    a = lie.sim3_mul(s_c, R_c, t_c, one, R_kf_old, t_kf_old)
    Ri, ti = lie.se3_inv(R_kf_new, t_kf_new)
    return lie.sim3_mul(one, Ri, ti, *a)


@jax.jit
def transform_map(m: ms.MapState, s, R, t) -> ms.MapState:
    """Apply a world-frame Sim3 to every keyframe pose and landmark
    (reference Map::ApplyScaledRotation, Map.h:118, generalized to full
    Sim3). Keyframe T_cw' = T_cw * S^-1 renormalized to SE3; landmark
    X' = S X; velocities rotate+scale."""
    si, Ri, ti = lie.sim3_inv(s, R, t)
    # per-KF: Sim3(1, R_cw, t_cw) * S^-1 = (si, R_cw Ri, R_cw ti + t_cw)
    Rn = lie.matmat(m.kf_R, jnp.broadcast_to(Ri, m.kf_R.shape))
    tn = lie.matvec(m.kf_R, jnp.broadcast_to(ti, m.kf_t.shape)) + m.kf_t
    # SE3 normalization: divide translation by the scale si of the composite
    tn = tn / si
    X = lie.sim3_apply(s, R, t, m.lm_pos)
    v = s * lie.matvec(jnp.broadcast_to(R, (m.kf_v.shape[0], 3, 3)), m.kf_v)
    return m._replace(kf_R=Rn, kf_t=tn, lm_pos=X, kf_v=v)


@jax.jit
def merge_maps(m_act: ms.MapState, m_old: ms.MapState, s, R, t):
    """Weld m_old (transformed by world Sim3 (s,R,t): old-world ->
    active-world) into m_act's free capacity.

    Old keyframe k lands at slot n_kf_act + k; old landmark l at
    n_lm_act + l. Returns (merged map, kf_offset, lm_offset). The caller
    must ensure n_kf_act + n_kf_old <= capacity (host-side check).
    """
    K, F = m_act.kf_feat_lm.shape
    L = m_act.lm_valid.shape[0]
    mo = transform_map(m_old, s, R, t)

    kf_off = m_act.n_kf
    lm_off = m_act.n_lm
    n_kf_old = mo.n_kf
    n_lm_old = mo.n_lm

    kf_ids = jnp.arange(K)
    lm_ids = jnp.arange(L)
    # which ACTIVE slots receive an old entity
    take_kf = (kf_ids >= kf_off) & (kf_ids < kf_off + n_kf_old)
    take_lm = (lm_ids >= lm_off) & (lm_ids < lm_off + n_lm_old)
    src_kf = jnp.clip(kf_ids - kf_off, 0, K - 1)
    src_lm = jnp.clip(lm_ids - lm_off, 0, L - 1)

    def kf_field(dst, src):
        shp = (K,) + (1,) * (dst.ndim - 1)
        return jnp.where(take_kf.reshape(shp), src[src_kf], dst)

    def lm_field(dst, src):
        shp = (L,) + (1,) * (dst.ndim - 1)
        return jnp.where(take_lm.reshape(shp), src[src_lm], dst)

    # remap old ids in the copied tables
    old_feat_lm = jnp.where(mo.kf_feat_lm >= 0, mo.kf_feat_lm + lm_off, -1)
    old_prev = jnp.where(mo.kf_prev >= 0, mo.kf_prev + kf_off, -1)
    old_ref = jnp.where(mo.lm_ref_kf >= 0, mo.lm_ref_kf + kf_off, -1)

    merged = m_act._replace(
        kf_R=kf_field(m_act.kf_R, mo.kf_R),
        kf_t=kf_field(m_act.kf_t, mo.kf_t),
        kf_valid=kf_field(m_act.kf_valid, mo.kf_valid),
        kf_ts=kf_field(m_act.kf_ts, mo.kf_ts),
        kf_feat_uv=kf_field(m_act.kf_feat_uv, mo.kf_feat_uv),
        kf_feat_xn=kf_field(m_act.kf_feat_xn, mo.kf_feat_xn),
        kf_feat_ur=kf_field(m_act.kf_feat_ur, mo.kf_feat_ur),
        kf_feat_octave=kf_field(m_act.kf_feat_octave, mo.kf_feat_octave),
        kf_feat_angle=kf_field(m_act.kf_feat_angle, mo.kf_feat_angle),
        kf_feat_desc=kf_field(m_act.kf_feat_desc, mo.kf_feat_desc),
        kf_feat_valid=kf_field(m_act.kf_feat_valid, mo.kf_feat_valid),
        kf_feat_lm=kf_field(m_act.kf_feat_lm, old_feat_lm),
        kf_v=kf_field(m_act.kf_v, mo.kf_v),
        kf_bias=kf_field(m_act.kf_bias, mo.kf_bias),
        kf_prev=kf_field(m_act.kf_prev, old_prev),
        lm_pos=lm_field(m_act.lm_pos, mo.lm_pos),
        lm_valid=lm_field(m_act.lm_valid, mo.lm_valid),
        lm_desc=lm_field(m_act.lm_desc, mo.lm_desc),
        lm_normal=lm_field(m_act.lm_normal, mo.lm_normal),
        lm_dist_max=lm_field(m_act.lm_dist_max, mo.lm_dist_max),
        lm_ref_kf=lm_field(m_act.lm_ref_kf, old_ref),
        lm_first_ts=lm_field(m_act.lm_first_ts, mo.lm_first_ts),
        lm_visible=lm_field(m_act.lm_visible, mo.lm_visible),
        lm_found=lm_field(m_act.lm_found, mo.lm_found),
        n_kf=m_act.n_kf + n_kf_old,
        n_lm=m_act.n_lm + n_lm_old,
    )
    return merged, kf_off, lm_off
