"""Functional struct-of-arrays SLAM map state.

TPU-native replacement for the reference's pointer-graph map model
(Map/KeyFrame/MapPoint, /root/reference/include/{Map,KeyFrame,MapPoint}.h):
one immutable pytree of fixed-capacity masked arrays. All mutation is
functional (`new_state = f(state)`), which removes the reference's whole
mutex hierarchy (Map.h:141 mMutexMapUpdate etc.) — tracking always reads a
consistent snapshot (SURVEY.md §7 design stance #1).

Observations are stored as the per-keyframe feature-slot table `kf_feat_lm`
(slot -> landmark id), the dual of the reference's
MapPoint::mObservations / KeyFrame::mvpMapPoints pair. Covisibility is
derived on demand with one MXU matmul over the incidence matrix instead of
being maintained incrementally under locks (reference
KeyFrame::UpdateConnections, KeyFrame.cc:483).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class MapState(NamedTuple):
    """One SLAM map (one reference `Map`). Capacities are static.

    Keyframes (capacity K):
      kf_R, kf_t: (K, 3, 3), (K, 3) — T_cw.
      kf_valid: (K,) bool; kf_ts: (K,) float64-ish timestamps (f32 offsets ok)
      kf_feat_uv: (K, F, 2) pixel coords (undistorted).
      kf_feat_xn: (K, F, 2) normalized camera coords (K^-1 applied once at
        insertion — BA and triangulation never re-unproject).
      kf_feat_ur: (K, F) normalized right-u (NaN = mono).
      kf_feat_octave: (K, F) int32; kf_feat_angle: (K, F) float32.
      kf_feat_desc: (K, F, 8) uint32; kf_feat_valid: (K, F) bool.
      kf_feat_lm: (K, F) int32 landmark id per slot (-1 none) == observations.
      kf_v / kf_bias: (K, 3), (K, 6) inertial state (velocity, [bg ba]).
      kf_prev: (K,) int32 temporal chain (reference mPrevKF).

    Landmarks (capacity L):
      lm_pos: (L, 3); lm_valid: (L,) bool.
      lm_desc: (L, 8) uint32 distinctive descriptor.
      lm_normal: (L, 3); lm_dist_max: (L,) scale band (dmin derived).
      lm_ref_kf: (L,) int32; lm_first_ts: (L,) f32 timestamp of the keyframe
        that created the landmark (probation culling compares timestamps —
        slot ids stop being temporal once keyframe slots recycle).
      lm_visible / lm_found: (L,) int32 counters (reference
        IncreaseVisible/IncreaseFound, used by the found-ratio cull).

    Counters: n_kf, n_lm — append-only high-water marks.
    """
    kf_R: jnp.ndarray
    kf_t: jnp.ndarray
    kf_valid: jnp.ndarray
    kf_ts: jnp.ndarray
    kf_feat_uv: jnp.ndarray
    kf_feat_xn: jnp.ndarray
    kf_feat_ur: jnp.ndarray
    kf_feat_octave: jnp.ndarray
    kf_feat_angle: jnp.ndarray
    kf_feat_desc: jnp.ndarray
    kf_feat_valid: jnp.ndarray
    kf_feat_lm: jnp.ndarray
    kf_v: jnp.ndarray
    kf_bias: jnp.ndarray
    kf_prev: jnp.ndarray
    lm_pos: jnp.ndarray
    lm_valid: jnp.ndarray
    lm_desc: jnp.ndarray
    lm_normal: jnp.ndarray
    lm_dist_max: jnp.ndarray
    lm_ref_kf: jnp.ndarray
    lm_first_ts: jnp.ndarray
    lm_visible: jnp.ndarray
    lm_found: jnp.ndarray
    n_kf: jnp.ndarray
    n_lm: jnp.ndarray


def empty_map(max_kf: int, n_feat: int, max_lm: int) -> MapState:
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        kf_R=jnp.broadcast_to(jnp.eye(3, dtype=f32), (max_kf, 3, 3)).copy(),
        kf_t=jnp.zeros((max_kf, 3), f32),
        kf_valid=jnp.zeros(max_kf, bool),
        kf_ts=jnp.zeros(max_kf, f32),
        kf_feat_uv=jnp.zeros((max_kf, n_feat, 2), f32),
        kf_feat_xn=jnp.zeros((max_kf, n_feat, 2), f32),
        kf_feat_ur=jnp.full((max_kf, n_feat), jnp.nan, f32),
        kf_feat_octave=jnp.zeros((max_kf, n_feat), i32),
        kf_feat_angle=jnp.zeros((max_kf, n_feat), f32),
        kf_feat_desc=jnp.zeros((max_kf, n_feat, 8), jnp.uint32),
        kf_feat_valid=jnp.zeros((max_kf, n_feat), bool),
        kf_feat_lm=jnp.full((max_kf, n_feat), -1, i32),
        kf_v=jnp.zeros((max_kf, 3), f32),
        kf_bias=jnp.zeros((max_kf, 6), f32),
        kf_prev=jnp.full(max_kf, -1, i32),
        lm_pos=jnp.zeros((max_lm, 3), f32),
        lm_valid=jnp.zeros(max_lm, bool),
        lm_desc=jnp.zeros((max_lm, 8), jnp.uint32),
        lm_normal=jnp.zeros((max_lm, 3), f32),
        lm_dist_max=jnp.ones(max_lm, f32),
        lm_ref_kf=jnp.full(max_lm, -1, i32),
        lm_first_ts=jnp.full(max_lm, -jnp.inf, f32),
        lm_visible=jnp.zeros(max_lm, i32),
        lm_found=jnp.zeros(max_lm, i32),
        n_kf=jnp.asarray(0, i32),
        n_lm=jnp.asarray(0, i32),
    )


# ---------------------------------------------------------------------------
# covisibility (derived, not maintained)
# ---------------------------------------------------------------------------

def covisibility_matrix(m: MapState):
    """(K, K) int32 — number of landmarks shared by each keyframe pair
    (reference covisibility weights, KeyFrame::UpdateConnections).

    One incidence matmul on the MXU: A[k, l] = 1 iff kf k observes lm l.
    """
    K = m.kf_valid.shape[0]
    L = m.lm_valid.shape[0]
    lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)  # (K, F) — L = dump row
    A = jnp.zeros((K, L + 1), jnp.bfloat16)
    A = A.at[jnp.arange(K)[:, None], lm].set(1.0)
    A = A[:, :L] * m.lm_valid[None, :].astype(jnp.bfloat16)
    W = jax.lax.dot_general(A, A, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    W = W.astype(jnp.int32)
    W = W * (1 - jnp.eye(K, dtype=jnp.int32))
    return W * (m.kf_valid[:, None] & m.kf_valid[None, :])


def covisibility_row(m: MapState, center_kf):
    """(K,) int32 — landmarks shared between `center_kf` and every other
    keyframe. One row of the covisibility matrix, O(K*F) — the full-matrix
    matmul is only needed by loop closing."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    lm_c = m.kf_feat_lm[center_kf]
    in_c = jnp.zeros(L + 1, bool).at[
        jnp.where((lm_c >= 0) & m.kf_feat_valid[center_kf], lm_c, L)
    ].set(True)[:L] & m.lm_valid
    lookup = jnp.concatenate([in_c, jnp.asarray([False])])
    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    shared = jnp.sum(lookup[slot_lm] & m.kf_feat_valid, axis=1)
    shared = shared * m.kf_valid
    return shared.at[center_kf].set(0).astype(jnp.int32)


def local_window(m: MapState, center_kf, size: int, min_weight: int = 15):
    """Top covisible keyframes of `center_kf` (incl. itself first).

    Returns (kf_idx (size,), valid (size,)) — the reference's
    GetBestCovisibilityKeyFrames (KeyFrame.h:224) as one top-k.
    """
    w = covisibility_row(m, center_kf)
    w = jnp.where(jnp.arange(w.shape[0]) == center_kf, 1 << 30, w)
    vals, idx = jax.lax.top_k(w, size)
    valid = (vals >= min_weight) | (idx == center_kf)
    return idx, valid & m.kf_valid[idx]


# ---------------------------------------------------------------------------
# landmark statistics maintenance
# ---------------------------------------------------------------------------

def lm_obs_count(m: MapState):
    """(L,) int32 observation count per landmark."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    slot_ok = m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_feat_lm >= 0)
    lm = jnp.where(slot_ok, m.kf_feat_lm, L).reshape(-1)
    return jax.ops.segment_sum(jnp.ones_like(lm), lm,
                               num_segments=L + 1)[:L]


def update_landmark_stats(m: MapState) -> MapState:
    """Recompute every landmark's representative descriptor, viewing normal
    and scale band from the observation table, in one pass of segment ops.

    Replaces MapPoint::ComputeDistinctiveDescriptors (reference
    MapPoint.h:144) and UpdateNormalAndDepth (MapPoint.h:148). The descriptor
    is the per-bit MAJORITY VOTE over observations — the Hamming centroid —
    instead of the reference's min-median-distance member; a deliberate
    TPU-shaped substitution (centroid via segment_sum beats O(n^2) pairwise
    distances, and a centroid is at least as representative).
    """
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    f32 = jnp.float32
    slot_ok = m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_feat_lm >= 0)
    lm_of_slot = jnp.where(slot_ok, m.kf_feat_lm, L)                # (K, F)
    cam_centers = -lie_matvec(jnp.swapaxes(m.kf_R, -1, -2), m.kf_t)  # (K, 3)

    # --- accumulate per-landmark bit counts + normals, chunked over KFs
    # (a per-KF scan serializes into K tiny scatters; 32-KF chunks keep the
    # working set ~40MB while cutting the sequential depth 32x)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    CHUNK = min(32, K)
    n_chunks = -(-K // CHUNK)
    pad_k = n_chunks * CHUNK - K

    def pad0(x):
        return jnp.concatenate(
            [x, jnp.zeros((pad_k,) + x.shape[1:], x.dtype)]) if pad_k else x

    lm_cs = pad0(lm_of_slot).reshape(n_chunks, CHUNK * F)
    desc_cs = pad0(m.kf_feat_desc).reshape(n_chunks, CHUNK * F, 8)
    ok_cs = pad0(slot_ok).reshape(n_chunks, CHUNK * F)
    ctr_cs = pad0(cam_centers).reshape(n_chunks, CHUNK, 3)
    lm_pad = jnp.concatenate([m.lm_pos, jnp.zeros((1, 3), f32)])

    def body(carry, inp):
        bit_sum, n_sum, nrm_sum = carry
        lm_k, desc_k, valid_k, center_k = inp
        lm_k = jnp.where(valid_k, lm_k, L)
        bits = ((desc_k[:, :, None] >> shifts) & jnp.uint32(1)) \
            .reshape(CHUNK * F, 256).astype(f32)
        bit_sum = bit_sum.at[lm_k].add(bits)
        n_sum = n_sum.at[lm_k].add(valid_k.astype(f32))
        ctr = jnp.repeat(center_k, F, axis=0)               # (CHUNK*F, 3)
        v = lm_pad[lm_k] - ctr
        vn = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True),
                          1e-9, None)
        nrm_sum = nrm_sum.at[lm_k].add(vn * valid_k[:, None])
        return (bit_sum, n_sum, nrm_sum), None

    init = (jnp.zeros((L + 1, 256), f32), jnp.zeros(L + 1, f32),
            jnp.zeros((L + 1, 3), f32))
    (bit_sum, n_sum, nrm_sum), _ = jax.lax.scan(
        body, init, (lm_cs, desc_cs, ok_cs, ctr_cs))
    bit_sum, n_sum, nrm_sum = bit_sum[:L], n_sum[:L], nrm_sum[:L]

    maj = (2.0 * bit_sum > n_sum[:, None])                          # (L, 256)
    words = maj.reshape(L, 8, 32).astype(jnp.uint32)
    new_desc = jnp.sum(words << shifts, axis=-1).astype(jnp.uint32)
    normal = nrm_sum / jnp.clip(jnp.linalg.norm(nrm_sum, axis=-1,
                                                keepdims=True), 1e-9, None)

    # --- scale band from the reference keyframe observation ---------------
    ref = jnp.clip(m.lm_ref_kf, 0, K - 1)                           # (L,)
    dist_ref = jnp.linalg.norm(m.lm_pos - cam_centers[ref], axis=-1)
    # octave of this landmark's slot in its ref KF: segment_max over slots
    # restricted to rows where k == ref_kf[lm]
    k_ids = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F))
    in_ref = slot_ok & (k_ids == ref[jnp.clip(m.kf_feat_lm, 0, L - 1)])
    lm_flat = jnp.where(in_ref, m.kf_feat_lm, L).reshape(-1)
    oct_ref = jax.ops.segment_max(
        m.kf_feat_octave.reshape(-1), lm_flat, num_segments=L + 1)[:L]
    oct_ref = jnp.clip(oct_ref, 0, 15)
    dmax = dist_ref * (1.2 ** oct_ref.astype(f32))

    upd = m.lm_valid & (n_sum > 0)
    return m._replace(
        lm_desc=jnp.where(upd[:, None], new_desc, m.lm_desc),
        lm_normal=jnp.where(upd[:, None], normal, m.lm_normal),
        lm_dist_max=jnp.where(upd, jnp.maximum(dmax, 1e-3), m.lm_dist_max),
    )


def update_landmark_stats_window(m: MapState, win_idx, win_ok) -> MapState:
    """Windowed landmark-statistics refresh: recompute descriptor/normal/
    scale band only for landmarks observed by the given keyframe window,
    using the WINDOW's observations (the mapping hot path touches only
    these; a full-map refresh is O(K*F*256) and dominated the per-keyframe
    mapping cost). Mature landmarks outside the window keep their stats —
    mirrors the reference updating only touched MapPoints
    (MapPoint::UpdateNormalAndDepth after each change)."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    W = win_idx.shape[0]
    f32 = jnp.float32
    slot_ok = (m.kf_feat_valid[win_idx] & win_ok[:, None]
               & (m.kf_feat_lm[win_idx] >= 0)
               & m.kf_valid[win_idx][:, None])
    lm_of = jnp.where(slot_ok, m.kf_feat_lm[win_idx], L).reshape(-1)  # (W*F,)
    desc = m.kf_feat_desc[win_idx].reshape(W * F, 8)
    okf = slot_ok.reshape(-1)

    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = ((desc[:, :, None] >> shifts) & jnp.uint32(1)) \
        .reshape(W * F, 256).astype(f32)
    bit_sum = jax.ops.segment_sum(bits * okf[:, None], lm_of,
                                  num_segments=L + 1)[:L]
    n_sum = jax.ops.segment_sum(okf.astype(f32), lm_of,
                                num_segments=L + 1)[:L]

    cam_centers = -lie_matvec(jnp.swapaxes(m.kf_R[win_idx], -1, -2),
                              m.kf_t[win_idx])                  # (W, 3)
    ctr = jnp.repeat(cam_centers, F, axis=0)                    # (W*F, 3)
    lm_pad = jnp.concatenate([m.lm_pos, jnp.zeros((1, 3), f32)])
    v = lm_pad[lm_of] - ctr
    vn = v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-9,
                      None)
    nrm_sum = jax.ops.segment_sum(vn * okf[:, None], lm_of,
                                  num_segments=L + 1)[:L]

    maj = (2.0 * bit_sum > n_sum[:, None])
    words = maj.reshape(L, 8, 32).astype(jnp.uint32)
    new_desc = jnp.sum(words << shifts, axis=-1).astype(jnp.uint32)
    normal = nrm_sum / jnp.clip(
        jnp.linalg.norm(nrm_sum, axis=-1, keepdims=True), 1e-9, None)

    # scale band: max over window observations of dist * scale^octave
    dist = jnp.linalg.norm(v, axis=-1)
    octv = m.kf_feat_octave[win_idx].reshape(-1).astype(f32)
    dmax_obs = dist * (1.2 ** jnp.clip(octv, 0, 15))
    dmax = jax.ops.segment_max(jnp.where(okf, dmax_obs, 0.0), lm_of,
                               num_segments=L + 1)[:L]

    upd = m.lm_valid & (n_sum > 0)
    return m._replace(
        lm_desc=jnp.where(upd[:, None], new_desc, m.lm_desc),
        lm_normal=jnp.where(upd[:, None], normal, m.lm_normal),
        lm_dist_max=jnp.where(upd & (dmax > 0),
                              jnp.maximum(dmax, 1e-3), m.lm_dist_max),
    )


def lie_matvec(M, v):
    return jnp.sum(M * v[..., None, :], axis=-1)


def reparent_landmark_refs(m: MapState) -> MapState:
    """Re-parent lm_ref_kf entries whose reference keyframe is no longer
    valid onto the landmark's NEWEST surviving observer (reference
    KeyFrame::SetBadFlag re-parents MapPoint references on deletion).
    Without this, a recycled slot's new occupant silently becomes the
    reference of unrelated landmarks — loop corrections then move them with
    the wrong keyframe's Sim3, and scale bands are computed from the wrong
    viewpoint. Landmarks with no surviving observer keep their stale ref
    (the n_obs >= 1 cull removes them on the next mapping step)."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    slot_ok = m.kf_feat_valid & m.kf_valid[:, None] & (m.kf_feat_lm >= 0)
    lm_of = jnp.where(slot_ok, m.kf_feat_lm, L).reshape(-1)
    ts_b = jnp.broadcast_to(
        jnp.where(m.kf_valid, m.kf_ts, -jnp.inf)[:, None], (K, F)
    ).reshape(-1)
    best_ts = jax.ops.segment_max(
        jnp.where(slot_ok.reshape(-1), ts_b, -jnp.inf), lm_of,
        num_segments=L + 1)[:L]
    in_best = slot_ok.reshape(-1) & (ts_b == best_ts[jnp.clip(
        lm_of, 0, L - 1)]) & (lm_of < L)
    k_b = jnp.broadcast_to(jnp.arange(K)[:, None], (K, F)).reshape(-1)
    new_ref = jax.ops.segment_max(
        jnp.where(in_best, k_b, -1), lm_of, num_segments=L + 1)[:L]
    ref_bad = m.lm_valid & (
        (m.lm_ref_kf < 0) | ~m.kf_valid[jnp.clip(m.lm_ref_kf, 0, K - 1)])
    return m._replace(
        lm_ref_kf=jnp.where(ref_bad & (new_ref >= 0),
                            new_ref.astype(m.lm_ref_kf.dtype),
                            m.lm_ref_kf))
