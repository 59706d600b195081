"""High-level data-association searches over fixed-capacity feature/landmark
arrays.

TPU-native replacement for the reference's ORBmatcher search family
(/root/reference/src/ORBmatcher.cc): SearchByProjection (frame vs local map
:42, frame vs last frame :1521), SearchForInitialization (:603),
SearchForTriangulation (:821) and Fuse (:1044). Each scalar candidate loop
becomes a dense masked (landmarks x features) Hamming matrix with windowed
gating, argmin assignment, and conflict resolution by segment-min — the whole
search is one compiled program regardless of counts.

Constants follow the reference: TH_HIGH=100, TH_LOW=50, ratio tests 0.9/0.75,
rotation histogram 30 bins (ORBmatcher.cc:35-37).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie
from .ops import hamming

BIG = jnp.int32(1 << 20)


def predict_scale(dist, max_dist, scale: float, n_levels: int):
    """Scale level prediction from viewing distance (reference
    MapPoint::PredictScale, MapPoint.h:152)."""
    ratio = jnp.clip(max_dist / jnp.clip(dist, 1e-6, None), 1.0, None)
    level = jnp.ceil(jnp.log(ratio) / jnp.log(scale)).astype(jnp.int32)
    return jnp.clip(level, 0, n_levels - 1)


class ProjectionMatches(NamedTuple):
    feat_lm: jnp.ndarray     # (N,) int32 — matched landmark per feature, -1
    n_matches: jnp.ndarray


def _resolve_conflicts(best_feat, best_dist, lm_mask, n_feats: int):
    """Per-landmark winners -> per-feature landmark assignment, keeping only
    the best landmark when several claim one feature."""
    key = jnp.where(lm_mask, best_dist, BIG)
    feat_min = jax.ops.segment_min(key, best_feat, num_segments=n_feats)
    won = lm_mask & (key == feat_min[best_feat])
    # tie-break duplicates by landmark index: keep the lowest lm id
    lm_ids = jnp.arange(best_feat.shape[0], dtype=jnp.int32)
    id_key = jnp.where(won, lm_ids, jnp.int32(1 << 30))
    first_lm = jax.ops.segment_min(id_key, best_feat, num_segments=n_feats)
    return jnp.where(first_lm < (1 << 30), first_lm, -1)


def search_by_projection(lm_pos, lm_normal, lm_dist_max, lm_desc, lm_valid,
                         R_cw, t_cw, cam_project, feat_uv, feat_octave,
                         feat_desc, feat_valid, image_wh,
                         radius_px: float, scale: float, n_levels: int,
                         max_dist_th: int = hamming.TH_HIGH,
                         ratio: float = 0.8,
                         check_view_angle: bool = True):
    """Project landmarks into the frame and match within a search window
    (reference ORBmatcher::SearchByProjection frame-vs-local-map, :42, with
    the isInFrustum gates of Frame.h:103).

    Args:
      lm_*: (M, ...) landmark arrays. cam_project: fn (M,3)->(M,2) px.
      feat_*: (N, ...) frame feature arrays (pixel uv).
      radius_px: base window (reference th=1 -> r 2.5/4.0 px by view angle).
    Returns ProjectionMatches with per-feature landmark index.
    """
    M = lm_pos.shape[0]
    N = feat_uv.shape[0]
    scale_factors = scale ** jnp.arange(n_levels, dtype=jnp.float32)

    Xc = lie.se3_apply(R_cw, t_cw, lm_pos)
    z = Xc[..., 2]
    uv = cam_project(Xc)
    in_img = ((uv[:, 0] >= 0) & (uv[:, 0] < image_wh[0]) &
              (uv[:, 1] >= 0) & (uv[:, 1] < image_wh[1]))
    cam_center = -lie.matvec(R_cw.T, t_cw)
    view = lm_pos - cam_center
    dist = jnp.linalg.norm(view, axis=-1)
    # scale-band gate (reference: 0.8 dmin < d < 1.2 dmax with
    # dmin = dmax / scale^{nlevels-1})
    lm_dist_min = lm_dist_max / (scale ** (n_levels - 1))
    in_band = (dist > 0.8 * lm_dist_min) & (dist < 1.2 * lm_dist_max)
    visible = lm_valid & (z > 0.2) & in_img & in_band
    if check_view_angle:
        cosv = jnp.sum(view * lm_normal, axis=-1) / jnp.clip(
            dist * jnp.linalg.norm(lm_normal, axis=-1), 1e-9, None)
        visible &= cosv > 0.5

    pred = predict_scale(dist, lm_dist_max, scale, n_levels)      # (M,)
    r = radius_px * scale_factors[pred]                            # (M,)

    # window + octave gating
    d_uv = uv[:, None, :] - feat_uv[None, :, :]
    close = jnp.max(jnp.abs(d_uv), axis=-1) <= r[:, None]
    oct_ok = (feat_octave[None, :] >= pred[:, None] - 1) & \
             (feat_octave[None, :] <= pred[:, None] + 1)
    cand = close & oct_ok & visible[:, None] & feat_valid[None, :]

    dmat = hamming.hamming_matrix(lm_desc, feat_desc)
    dmat = jnp.where(cand, dmat, BIG)
    best_dist, best_feat, second = hamming.top2_min(dmat)
    ok = (best_dist <= max_dist_th) & (
        best_dist.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    feat_lm = _resolve_conflicts(best_feat.astype(jnp.int32),
                                 best_dist, ok, N)
    return ProjectionMatches(feat_lm=feat_lm,
                             n_matches=jnp.sum(feat_lm >= 0))


def search_for_initialization(uv1, desc1, valid1, ang1, uv2, desc2, valid2,
                              ang2, window_px: float = 100.0,
                              ratio: float = 0.9):
    """Match two monocular frames for initialization (reference
    ORBmatcher::SearchForInitialization, ORBmatcher.cc:603): window-gated NN
    with ratio test, cross-check and rotation-consistency histogram.

    Returns (idx (N1,) int32 match into frame 2 or -1).
    """
    d_uv = uv1[:, None, :] - uv2[None, :, :]
    close = jnp.max(jnp.abs(d_uv), axis=-1) <= window_px
    cand = close & valid1[:, None] & valid2[None, :]
    dmat = jnp.where(cand, hamming.hamming_matrix(desc1, desc2), BIG)
    idx, _ = hamming.match_nn(dmat, valid1, valid2,
                              max_dist=hamming.TH_LOW, ratio=ratio,
                              cross_check=True)
    keep = hamming.rotation_consistency_mask(ang1, ang2, idx)
    return jnp.where(keep, idx, -1)


def search_last_frame(last_uv, last_desc, last_lm, last_valid, cur_uv,
                      cur_octave, cur_desc, cur_valid, proj_uv, proj_pred,
                      radius_px: float, scale: float,
                      last_angle=None, cur_angle=None, ratio: float = 0.9):
    """Match current features against last frame's landmark-bearing features
    after motion-model projection (reference SearchByProjection
    frame-vs-last-frame, ORBmatcher.cc:1521).

    Args:
      last_*: (N, ...) last-frame feature arrays; last_lm landmark per slot.
      proj_uv: (N, 2) projected pixel position of last frame's landmarks in
        the current frame (NaN if projection failed).
      proj_pred: (N,) predicted octave.
    Returns per-current-feature landmark index (-1 if none).
    """
    has_lm = last_valid & (last_lm >= 0) & jnp.isfinite(proj_uv[:, 0])
    scale_factors = scale ** jnp.arange(16, dtype=jnp.float32)
    r = radius_px * scale_factors[jnp.clip(proj_pred, 0, 15)]
    d_uv = proj_uv[:, None, :] - cur_uv[None, :, :]
    close = jnp.max(jnp.abs(jnp.nan_to_num(d_uv, nan=1e9)), axis=-1) <= r[:, None]
    oct_ok = (cur_octave[None, :] >= proj_pred[:, None] - 1) & \
             (cur_octave[None, :] <= proj_pred[:, None] + 1)
    cand = close & oct_ok & has_lm[:, None] & cur_valid[None, :]
    dmat = jnp.where(cand, hamming.hamming_matrix(last_desc, cur_desc), BIG)
    best_dist, best_feat, second = hamming.top2_min(dmat)
    # ratio test guards against the repetitive-texture false matches that
    # would otherwise confirm an overshooting motion-model prediction
    ok = (best_dist <= hamming.TH_HIGH) & (
        best_dist.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if last_angle is not None:
        # rotation-consistency histogram (reference mbCheckOrientation)
        ok &= hamming.rotation_consistency_mask(
            last_angle, cur_angle, jnp.where(ok, best_feat, -1))
    winner = _resolve_conflicts(best_feat.astype(jnp.int32), best_dist, ok,
                                cur_uv.shape[0])
    # winner holds the *last-frame slot* index; map to landmark ids
    feat_lm = jnp.where(winner >= 0, last_lm[jnp.clip(winner, 0, None)], -1)
    return feat_lm


def search_for_triangulation(xn1, desc1, oct1, valid1, free1,
                             xn2, desc2, oct2, valid2, free2,
                             E12, focal: float, scale: float,
                             ratio: float = 0.75):
    """Epipolar-gated matching of un-associated features between two
    keyframes for new-landmark triangulation (reference
    ORBmatcher::SearchForTriangulation, ORBmatcher.cc:821).

    Args:
      xn*: (N, 2) precomputed normalized camera coords.
      free*: (N,) bool — feature currently has NO landmark.
      E12: essential matrix between the KFs (x2n^T E x1n = 0).
      focal: for the epipolar distance threshold (px gate at kp2's scale).
    Returns idx (N1,) int32 match into KF2 features or -1.
    """
    ones = jnp.ones_like(xn1[..., :1])
    x1h = jnp.concatenate([xn1, ones], axis=-1)
    x2h = jnp.concatenate([xn2, jnp.ones_like(xn2[..., :1])], axis=-1)
    Ex1 = jnp.einsum('ij,nj->ni', E12, x1h, precision='highest')   # (N1, 3)
    # point-line distance of x2 to the epipolar line of x1
    num = jnp.einsum('nj,mj->nm', Ex1, x2h)  # (N1, N2): line_n . x2_m
    den = jnp.sqrt(jnp.clip(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2, 1e-12, None))
    dist_epi = jnp.abs(num) / den[:, None]                         # normalized
    sf2 = scale ** oct2[None, :].astype(jnp.float32)
    epi_ok = dist_epi * focal < 3.84 * sf2                         # ~ref gate
    cand = (epi_ok & valid1[:, None] & valid2[None, :] &
            free1[:, None] & free2[None, :])
    dmat = jnp.where(cand, hamming.hamming_matrix(desc1, desc2), BIG)
    idx, _ = hamming.match_nn(dmat, valid1 & free1, valid2 & free2,
                              max_dist=hamming.TH_LOW, ratio=ratio,
                              cross_check=True)
    return idx
