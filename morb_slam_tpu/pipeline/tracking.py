"""The frame-rate tracking state machine (monocular path).

TPU-native replacement for the reference's Tracking thread
(/root/reference/src/Tracking.cc): Track() state machine (:1696),
MonocularInitialization (:2278) + CreateInitialMapMonocular (:2345),
TrackWithMotionModel (:2655), TrackReferenceKeyFrame (:2535), TrackLocalMap
(:2745) and NeedNewKeyFrame (:2840). Host Python handles only the state
transitions and keyframe decisions; every per-frame compute step is one of
two jitted programs (extract, track) over fixed-capacity arrays, keeping the
per-frame path at <= 2 device dispatches (SURVEY.md §7 hard part #4).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import cameras, frontend, lie, matching
from ..ops import hamming
from ..mapstate import state as ms
from ..optim import ba, pose_opt
from ..solvers import pnp, two_view
from . import local_mapping

MAX_LOCAL_LM = 4096
LOCAL_KFS = 10


def _start_fetch(arr):
    """Kick off the device->host copy of a decision vector as soon as the
    producing program is dispatched. Each *fresh* fetch over the device link
    costs a full round trip; issuing it early overlaps that latency with the
    device compute, so the later np.asarray is (close to) free."""
    try:
        arr.copy_to_host_async()
    except AttributeError:
        pass


def tracking_replace_inertial(cfg):
    import dataclasses
    return dataclasses.replace(cfg, inertial=True)


@dataclass(frozen=True)
class TrackerConfig:
    width: int
    height: int
    focal: float
    n_feat: int = 1200
    max_kf: int = 512
    max_lm: int = 32768
    scale: float = 1.2
    n_levels: int = 8
    min_init_matches: int = 100
    min_init_points: int = 50
    min_track_points: int = 10
    min_local_points: int = 30
    # KF trigger c2 fires when the frame's local-map inliers drop below
    # this fraction of the inlier count at the LAST keyframe's insertion.
    # The reference compares against the reference KF's TrackedMapPoints
    # (minObs=3) count (Tracking.cc:2853-2860) — a DIFFERENT population
    # than the frame's pose-opt inliers, systematically larger here, which
    # fired the trigger at the max rate (rounds 1+3 both hit this); the
    # decayed-inliers-since-insert test keeps c2's intent (insert when
    # tracking support erodes) while comparing like with like.
    kf_ref_ratio: float = 0.95
    max_kf_interval: int = 12
    min_kf_interval: int = 3
    # Fraction of the measured inter-frame ROTATION carried into the
    # constant-velocity prediction. The reference predicts with the full
    # rotation (Tracking.cc mVelocity); we default to 0 because a rotation
    # overshoot moves every projection coherently, and the windowed search
    # then finds a self-consistent wrong association set (observed ~1
    # deg/frame self-confirming drift). Translation prediction keeps the
    # motion-model benefit without that failure mode.
    vel_rot_damp: float = 0.0
    baseline: float = 0.0      # stereo baseline (m); 0 = monocular
    th_depth: float = 35.0     # close-point gate in baseline units
    # System.thFarPoints (reference System.cc:213-219 -> Tracking's
    # mThFarPoints): depth-measured features beyond this distance (m) are
    # discarded at keyframe landmark creation; 0 disables the gate
    th_far_points: float = 0.0
    min_stereo_init_feats: int = 400
    # failure detection (reference Tracking.cc:1713 timestamp-jump map
    # spawn; LocalMapping.cc:159 bad-IMU forced reset)
    ts_jump: float = 1.0           # seconds; > this starts a fresh map
    bad_imu_timeout: float = 20.0  # s without IMU init -> forced reset
    # visual dropout survived on pure IMU dead-reckoning before LOST
    # (reference time_recently_lost, Tracking.cc:1838-1851)
    time_recently_lost: float = 5.0
    # Frames a dispatched program's host decision may lag behind (the
    # reference's pipeline parallelism P1: tracking never blocks on its own
    # frame). Depth 1 hides device compute only; a remote-chip link adds a
    # ~30-40 ms fetch round trip on top of compute, so the decision vector
    # of frame N-1 is still in flight when frame N is dispatched — depth 2
    # hides compute + RTT (measured 22.7 -> ~50 fps on the tunnel).
    pipeline_depth: int = 2

    @property
    def orb(self):
        return frontend.OrbConfig(n_features=self.n_feat,
                                  n_levels=self.n_levels, scale=self.scale)

    inertial: bool = False

    @property
    def lm_cfg(self):
        return local_mapping.LocalMapConfig(
            focal=self.focal, scale=self.scale, n_levels=self.n_levels,
            baseline=self.baseline, inertial=self.inertial)


class FrameData(NamedTuple):
    uv: jnp.ndarray        # (F, 2) undistorted pixel coords
    xn: jnp.ndarray        # (F, 2) normalized camera coords
    octave: jnp.ndarray
    angle: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray
    ur: jnp.ndarray        # (F,) normalized right-image u (NaN = mono)
    depth: jnp.ndarray     # (F,) stereo/RGB-D depth (-1 = none)


class TrackOutput(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    feat_lm: jnp.ndarray   # (F,) final landmark association (outliers cleared)
    n_mm: jnp.ndarray      # matches from motion model stage
    n_inl: jnp.ndarray     # final local-map inliers
    m: ms.MapState         # map with updated visible/found counters
    ref_kf: jnp.ndarray    # new reference keyframe id


# ---------------------------------------------------------------------------
# jitted stages
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def extract_frame(img, cam_params, cam_kind, cfg: TrackerConfig) -> FrameData:
    cam = cameras.Camera(cam_kind, cam_params)
    # images may arrive uint8 (4x cheaper host->device transfer over a
    # remote-chip link); all frontend math is f32
    img = img.astype(jnp.float32)
    feats = frontend.extract_orb(img, cfg.orb)
    uv = cameras.undistort_points(cam, feats.uv)
    # normalized coords via the camera model (KB8 fisheye needs the Newton
    # unprojection — a pinhole K-normalize would be badly wrong off-axis)
    xn = cameras.unproject(cam, uv)[:, :2]
    F = uv.shape[0]
    return FrameData(uv=uv, xn=xn, octave=feats.octave, angle=feats.angle,
                     desc=feats.desc, valid=feats.valid,
                     ur=jnp.full(F, jnp.nan, jnp.float32),
                     depth=jnp.full(F, -1.0, jnp.float32))


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_frame(m: ms.MapState, fr: FrameData, last: FrameData,
                last_feat_lm, R_last, t_last, vel_R, vel_t, ref_kf,
                cam_params, cam_kind, cfg: TrackerConfig) -> TrackOutput:
    """Motion-model matching + pose opt + local-map tracking, one program.

    Mirrors reference TrackWithMotionModel (Tracking.cc:2655) then
    TrackLocalMap (:2745)."""
    cam = cameras.Camera(cam_kind, cam_params)
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    inv_sig2 = cfg.lm_cfg.sigma2_inv
    info_of = lambda octv: (cfg.focal ** 2) * inv_sig2[
        jnp.clip(octv, 0, cfg.n_levels - 1)]

    # ---- stage 1: motion model + last-frame matching --------------------
    R_pred, t_pred = lie.se3_mul(vel_R, vel_t, R_last, t_last)
    last_lm = jnp.where(last.valid, last_feat_lm, -1)
    lm_idx = jnp.clip(last_lm, 0, None)
    lm_ok = (last_lm >= 0) & m.lm_valid[lm_idx]
    pos = m.lm_pos[lm_idx]
    Xc = lie.se3_apply(R_pred, t_pred, pos)
    proj = cameras.project(cam, Xc)
    proj = jnp.where((lm_ok & (Xc[:, 2] > 0.1))[:, None], proj, jnp.nan)
    cur_lm = matching.search_last_frame(
        last.uv, last.desc, last_lm, last.valid,
        fr.uv, fr.octave, fr.desc, fr.valid,
        proj, last.octave, radius_px=8.0, scale=cfg.scale,
        last_angle=last.angle, cur_angle=fr.angle)
    n_mm = jnp.sum(cur_lm >= 0)

    lm_i = jnp.clip(cur_lm, 0, None)
    res1 = pose_opt.optimize_pose(
        R_pred, t_pred, m.lm_pos[lm_i], fr.xn,
        info_of(fr.octave), (cur_lm >= 0) & m.lm_valid[lm_i],
        obs_ur=fr.ur, baseline=cfg.baseline,
        n_rounds=2, n_iters=8)
    cur_lm = jnp.where(res1.inliers, cur_lm, -1)

    # ---- stage 2: local map ---------------------------------------------
    # vote for local KFs by current matches (reference UpdateLocalKeyFrames)
    match_mask = jnp.zeros(L + 1, bool).at[
        jnp.where(cur_lm >= 0, cur_lm, L)].set(True)[:L]
    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    votes = jnp.sum(
        jnp.concatenate([match_mask, jnp.asarray([False])])[slot_lm]
        & m.kf_feat_valid, axis=1) * m.kf_valid          # (K,)
    new_ref = jnp.argmax(votes).astype(jnp.int32)
    new_ref = jnp.where(votes[new_ref] > 0, new_ref, ref_kf)
    _, top_kfs = jax.lax.top_k(votes, min(LOCAL_KFS, K))

    # local landmark set = landmarks of top KFs
    lm_in = jnp.zeros(L + 1, bool).at[
        jnp.where(m.kf_feat_valid[top_kfs], slot_lm[top_kfs], L)
        .reshape(-1)].set(True)
    lm_in = lm_in[:L] & m.lm_valid
    _, lm_sel = jax.lax.top_k(lm_in.astype(jnp.int32), min(MAX_LOCAL_LM, L))
    lm_sel_ok = lm_in[lm_sel] & ~match_mask[lm_sel]   # skip already-matched

    # search ALL features against the local map (not just unmatched ones):
    # the multi-view landmarks are the authority — letting stage-1 pairs
    # stand unchallenged lets a velocity-overshoot-biased association
    # survive into the final optimization (observed as ~1 deg/frame
    # self-confirming rotation drift)
    lm_sel_ok2 = lm_in[lm_sel]
    proj_m = matching.search_by_projection(
        m.lm_pos[lm_sel], m.lm_normal[lm_sel], m.lm_dist_max[lm_sel],
        m.lm_desc[lm_sel], lm_sel_ok2,
        res1.R, res1.t, lambda Xc: cameras.project(cam, Xc),
        fr.uv, fr.octave, fr.desc, fr.valid,
        (cfg.width, cfg.height), radius_px=4.0, scale=cfg.scale,
        n_levels=cfg.n_levels)
    ext_lm = jnp.where(proj_m.feat_lm >= 0,
                       lm_sel[jnp.clip(proj_m.feat_lm, 0, None)], -1)
    cur_lm2 = jnp.where(ext_lm >= 0, ext_lm, cur_lm)

    lm_i2 = jnp.clip(cur_lm2, 0, None)
    res2 = pose_opt.optimize_pose(
        res1.R, res1.t, m.lm_pos[lm_i2], fr.xn,
        info_of(fr.octave), (cur_lm2 >= 0) & m.lm_valid[lm_i2],
        obs_ur=fr.ur, baseline=cfg.baseline,
        n_rounds=2, n_iters=8)
    final_lm = jnp.where(res2.inliers, cur_lm2, -1)

    # ---- counters (reference IncreaseVisible/IncreaseFound) -------------
    vis_ids = jnp.where(lm_sel_ok, lm_sel, L)
    m = m._replace(
        lm_visible=m.lm_visible.at[vis_ids].add(1)[:L],
        lm_found=m.lm_found.at[jnp.where(final_lm >= 0, final_lm, L)]
        .add(1)[:L])
    return TrackOutput(R=res2.R, t=res2.t, feat_lm=final_lm, n_mm=n_mm,
                       n_inl=res2.n_inliers, m=m, ref_kf=new_ref)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def extract_stereo_frame(img_l, img_r, cam_params, cam_kind,
                         cfg: TrackerConfig) -> FrameData:
    """Extract both images and run rectified row matching (reference
    Frame stereo ctor, Frame.cc:194 + ComputeStereoMatches)."""
    from ..ops import stereo as stereo_ops
    cam = cameras.Camera(cam_kind, cam_params)
    img_l = img_l.astype(jnp.float32)
    img_r = img_r.astype(jnp.float32)
    feats_l = frontend.extract_orb(img_l, cfg.orb)
    feats_r = frontend.extract_orb(img_r, cfg.orb)
    sf = jnp.asarray([cfg.scale ** i for i in range(cfg.n_levels)],
                     jnp.float32)
    sm = stereo_ops.match_stereo(feats_l, feats_r, img_l, img_r, sf,
                                 bf=cfg.baseline * cfg.focal,
                                 min_z=cfg.baseline)
    uv = cameras.undistort_points(cam, feats_l.uv)
    xn = cameras.unproject(cam, uv)[:, :2]
    ur_n = jnp.where(sm.valid, (sm.u_right - cam_params[2]) / cam_params[0],
                     jnp.nan)
    return FrameData(uv=uv, xn=xn,
                     octave=feats_l.octave, angle=feats_l.angle,
                     desc=feats_l.desc, valid=feats_l.valid,
                     ur=ur_n, depth=jnp.where(sm.valid, sm.depth, -1.0))


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def extract_rgbd_frame(img, depth_map, cam_params, cam_kind,
                       cfg: TrackerConfig) -> FrameData:
    """RGB-D extraction: ORB on the color/gray image, depth read at keypoint
    locations with a synthetic right-u (reference
    Frame::ComputeStereoFromRGBD, Frame.cc)."""
    from ..ops import stereo as stereo_ops
    cam = cameras.Camera(cam_kind, cam_params)
    img = img.astype(jnp.float32)
    feats = frontend.extract_orb(img, cfg.orb)
    sm = stereo_ops.depth_from_rgbd(feats, depth_map,
                                    bf=cfg.baseline * cfg.focal)
    uv = cameras.undistort_points(cam, feats.uv)
    xn = cameras.unproject(cam, uv)[:, :2]
    ur_n = jnp.where(sm.valid, (sm.u_right - cam_params[2]) / cam_params[0],
                     jnp.nan)
    return FrameData(uv=uv, xn=xn, octave=feats.octave,
                     angle=feats.angle, desc=feats.desc, valid=feats.valid,
                     ur=ur_n, depth=jnp.where(sm.valid, sm.depth, -1.0))


@partial(jax.jit, static_argnames=("cfg", "cam_kind", "cam2_kind"))
def extract_stereo_general_frame(img_l, img_r, cam_params, cam_kind,
                                 cam2_params, cam2_kind, R_rl, t_rl,
                                 cfg: TrackerConfig) -> FrameData:
    """Non-rectified two-camera extraction (KB8 fisheye stereo): dual ORB
    extraction + epipolar-gated descriptor matching + midpoint triangulation
    (reference Frame two-camera ctor, Frame.cc:194 Nleft/Nright, +
    KannalaBrandt8::TriangulateMatches). Depth seeds metric landmarks; the
    BA treats these observations as monocular (ur = NaN) since there is no
    rectified right-u."""
    from ..ops import stereo as stereo_ops
    cam = cameras.Camera(cam_kind, cam_params)
    cam2 = cameras.Camera(cam2_kind, cam2_params)
    img_l = img_l.astype(jnp.float32)
    img_r = img_r.astype(jnp.float32)
    feats_l = frontend.extract_orb(img_l, cfg.orb)
    feats_r = frontend.extract_orb(img_r, cfg.orb)
    bear_l = cameras.unproject_bearing(cam, feats_l.uv)
    bear_r = cameras.unproject_bearing(cam2, feats_r.uv)
    sigma2 = cfg.scale ** (2.0 * feats_l.octave.astype(jnp.float32))
    sm = stereo_ops.match_stereo_general(
        feats_l, feats_r, bear_l, bear_r, feats_l.uv, feats_r.uv,
        lambda X: cameras.project_distorted(cam, X),
        lambda X: cameras.project_distorted(cam2, X),
        R_rl, t_rl, sigma2)
    uv = cameras.undistort_points(cam, feats_l.uv)
    xn = cameras.unproject(cam, uv)[:, :2]
    F = uv.shape[0]
    return FrameData(uv=uv, xn=xn, octave=feats_l.octave,
                     angle=feats_l.angle, desc=feats_l.desc,
                     valid=feats_l.valid,
                     ur=jnp.full(F, jnp.nan, jnp.float32),
                     depth=jnp.where(sm.valid, sm.depth, -1.0))


@partial(jax.jit, static_argnames=("cfg",))
def stereo_initialize(m: ms.MapState, fr: FrameData, ts, cfg: TrackerConfig):
    """First-frame stereo map (reference Tracking::StereoInitialization,
    Tracking.cc:2168): every feature with valid depth becomes a landmark."""
    L = m.lm_valid.shape[0]
    F = fr.uv.shape[0]
    good = fr.valid & (fr.depth > 0)
    if cfg.th_far_points > 0:
        good = good & (fr.depth < cfg.th_far_points)
    X = fr.xn * fr.depth[:, None]
    Xw = jnp.concatenate([X, fr.depth[:, None]], axis=-1)  # z = depth
    n_new = jnp.cumsum(good.astype(jnp.int32)) - 1
    slot = jnp.where(good, n_new, L - 1)
    # landmarks must exist BEFORE the keyframe association is written
    # (insert_keyframe drops associations to invalid landmarks)
    m, k0 = insert_keyframe(m, fr, jnp.full(fr.uv.shape[0], -1, jnp.int32),
                            jnp.eye(3), jnp.zeros(3), ts)
    dmax = fr.depth * cfg.scale ** fr.octave.astype(jnp.float32)
    m = m._replace(
        kf_feat_lm=m.kf_feat_lm.at[k0].set(jnp.where(good, slot, -1)),
        lm_pos=m.lm_pos.at[slot].set(
            jnp.where(good[:, None], Xw, m.lm_pos[slot])),
        lm_valid=m.lm_valid.at[slot].set(good | m.lm_valid[slot]),
        lm_desc=m.lm_desc.at[slot].set(
            jnp.where(good[:, None], fr.desc, m.lm_desc[slot])),
        lm_ref_kf=m.lm_ref_kf.at[slot].set(jnp.where(good, k0,
                                                     m.lm_ref_kf[slot])),
        lm_first_ts=m.lm_first_ts.at[slot].set(
            jnp.where(good, m.kf_ts[k0], m.lm_first_ts[slot])),
        lm_dist_max=m.lm_dist_max.at[slot].set(
            jnp.where(good, dmax, m.lm_dist_max[slot])),
        lm_normal=m.lm_normal.at[slot].set(
            jnp.where(good[:, None], jnp.asarray([0.0, 0.0, -1.0])[None, :],
                      m.lm_normal[slot])),
        lm_visible=m.lm_visible.at[slot].set(1),
        lm_found=m.lm_found.at[slot].set(1),
        n_lm=jnp.sum(good))
    m = ms.update_landmark_stats(m)
    return m, k0


@partial(jax.jit, static_argnames=("cfg",))
def create_close_landmarks(m: ms.MapState, kf_id, fr: FrameData,
                           cfg: TrackerConfig):
    """New landmarks straight from stereo depth for unmatched close features
    (reference Tracking::CreateNewKeyFrame close-point creation,
    Tracking.cc:2996): points nearer than th_depth * baseline, best 128."""
    L = m.lm_valid.shape[0]
    th = cfg.th_depth * cfg.baseline
    if cfg.th_far_points > 0:
        th = min(th, cfg.th_far_points)
    freeF = (m.kf_feat_lm[kf_id] < 0) & fr.valid & (fr.depth > 0) &         (fr.depth < th)
    MAXC = min(128, fr.uv.shape[0])
    score = jnp.where(freeF, -fr.depth, -jnp.inf)    # closest first
    _, sel = jax.lax.top_k(score, MAXC)
    sel_good = freeF[sel]
    free_score = (~m.lm_valid).astype(jnp.int32)
    n_free_ok, free_slots = jax.lax.top_k(free_score, MAXC)
    rank = jnp.cumsum(sel_good.astype(jnp.int32)) - 1
    sel_good = sel_good & (n_free_ok == 1)[jnp.clip(rank, 0, None)]
    slot = jnp.where(sel_good, free_slots[jnp.clip(rank, 0, None)], L)
    z = fr.depth[sel]
    Xc = jnp.concatenate([fr.xn[sel] * z[:, None], z[:, None]], axis=-1)
    Rwc = m.kf_R[kf_id].T
    Xw = lie.se3_apply(Rwc, -lie.matvec(Rwc, m.kf_t[kf_id]), Xc)
    dmax = z * cfg.scale ** fr.octave[sel].astype(jnp.float32)
    m = m._replace(
        lm_pos=m.lm_pos.at[slot].set(
            jnp.where(sel_good[:, None], Xw, m.lm_pos[slot])),
        lm_valid=m.lm_valid.at[slot].set(sel_good | m.lm_valid[slot]),
        lm_desc=m.lm_desc.at[slot].set(
            jnp.where(sel_good[:, None], fr.desc[sel], m.lm_desc[slot])),
        lm_ref_kf=m.lm_ref_kf.at[slot].set(
            jnp.where(sel_good, kf_id, m.lm_ref_kf[slot])),
        lm_first_ts=m.lm_first_ts.at[slot].set(
            jnp.where(sel_good, m.kf_ts[kf_id], m.lm_first_ts[slot])),
        lm_dist_max=m.lm_dist_max.at[slot].set(
            jnp.where(sel_good, dmax, m.lm_dist_max[slot])),
        lm_visible=m.lm_visible.at[slot].set(
            jnp.where(sel_good, 1, m.lm_visible[slot])),
        lm_found=m.lm_found.at[slot].set(
            jnp.where(sel_good, 1, m.lm_found[slot])),
        kf_feat_lm=m.kf_feat_lm.at[kf_id, sel].set(
            jnp.where(sel_good, slot, m.kf_feat_lm[kf_id, sel])),
        n_lm=m.n_lm + jnp.sum(sel_good))
    return m


def _track_core(fr, m, last, last_feat_lm, R_last, t_last, vel_R, vel_t,
                has_vel, ref_kf, cam_params, cam_kind, cfg,
                vel_rot_trusted=False):
    damp = cfg.vel_rot_damp
    if damp == 0.0:
        vel_R_damped = jnp.eye(3)
    elif damp < 1.0:
        vel_R_damped = lie.so3_exp(damp * lie.so3_log(vel_R))
    else:
        vel_R_damped = vel_R
    # IMU-derived predictions carry a gyro-integrated rotation — trusted,
    # no damping (the damping exists to tame visual velocity feedback)
    vel_R_used = jnp.where(vel_rot_trusted, vel_R, vel_R_damped)
    vel_R_used = jnp.where(has_vel, vel_R_used, jnp.eye(3))
    vel_t_used = jnp.where(has_vel, vel_t, jnp.zeros(3))
    out = track_frame(m, fr, last, last_feat_lm, R_last, t_last,
                      vel_R_used, vel_t_used, ref_kf, cam_params, cam_kind,
                      cfg)
    # velocity for the next frame: T_cur T_last^-1
    Ri, ti = lie.se3_inv(R_last, t_last)
    vel_new = lie.se3_mul(out.R, out.t, Ri, ti)
    # trajectory entry relative to the (new) reference KF
    Rr, tr_ = m.kf_R[out.ref_kf], m.kf_t[out.ref_kf]
    Rri, tri = lie.se3_inv(Rr, tr_)
    rel = lie.se3_mul(out.R, out.t, Rri, tri)
    # every host decision scalar packed into ONE small vector so the frame
    # needs exactly one device->host fetch (each fresh fetch over the
    # device link costs a full round trip — SURVEY.md §7 #4 latency
    # discipline): [n_inl, ref_kf, vel_finite, n_mm, ref_tracked,
    # n_close_tracked, n_close_untracked] — the last three feed the full
    # NeedNewKeyFrame condition set (reference Tracking.cc:2840-2994:
    # nRefMatches for c2's thRefRatio test, close-point starvation for c1c)
    # reference nRefMatches = mpReferenceKF->TrackedMapPoints(nMinObs) with
    # nMinObs = 3 (2 while the map holds <= 2 KFs) — Tracking.cc:2853-2860.
    # Only the STEREO close-point starvation condition (c1c) consumes this
    # count (c2's baseline is the host-side decayed-inliers test), so the
    # mono program skips the per-frame observation histogram entirely.
    ref_lm2 = m.kf_feat_lm[out.ref_kf]
    lm_c = jnp.clip(ref_lm2, 0, None)
    if cfg.baseline > 0:
        obs = ms.lm_obs_count(m)
        min_obs = jnp.where(m.n_kf <= 2, 2, 3)
        ref_tracked = jnp.sum((ref_lm2 >= 0) & m.kf_feat_valid[out.ref_kf]
                              & m.lm_valid[lm_c] & (obs[lm_c] >= min_obs))
    else:
        ref_tracked = jnp.sum((ref_lm2 >= 0) & m.kf_feat_valid[out.ref_kf]
                              & m.lm_valid[lm_c])
    close_m = cfg.th_depth * cfg.baseline if cfg.baseline > 0 else 0.0
    close = fr.valid & (fr.depth > 0) & (fr.depth < close_m)
    tracked = out.feat_lm >= 0
    info = jnp.stack([
        out.n_inl.astype(jnp.float32),
        out.ref_kf.astype(jnp.float32),
        jnp.isfinite(vel_new[1]).all().astype(jnp.float32),
        out.n_mm.astype(jnp.float32),
        ref_tracked.astype(jnp.float32),
        jnp.sum(close & tracked).astype(jnp.float32),
        jnp.sum(close & ~tracked).astype(jnp.float32)])
    return fr, out, vel_new, rel, info


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step(img, m: ms.MapState, last: FrameData, last_feat_lm,
               R_last, t_last, vel_R, vel_t, has_vel, ref_kf,
               cam_params, cam_kind, cfg: TrackerConfig,
               vel_rot_trusted=False):
    """Fused per-frame program: ORB extraction + tracking + velocity update
    + trajectory-relative pose, ONE device dispatch (the per-frame path must
    stay at <= 2 dispatches incl. the scalar readback; SURVEY.md §7 #4)."""
    fr = extract_frame(img, cam_params, cam_kind, cfg)
    return _track_core(fr, m, last, last_feat_lm, R_last, t_last, vel_R,
                       vel_t, has_vel, ref_kf, cam_params, cam_kind, cfg,
                       vel_rot_trusted)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step_framedata(fr: FrameData, m: ms.MapState, last: FrameData,
                         last_feat_lm, R_last, t_last, vel_R, vel_t,
                         has_vel, ref_kf, cam_params, cam_kind,
                         cfg: TrackerConfig, vel_rot_trusted=False):
    return _track_core(fr, m, last, last_feat_lm, R_last, t_last, vel_R,
                       vel_t, has_vel, ref_kf, cam_params, cam_kind, cfg,
                       vel_rot_trusted)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step_stereo(img_l, img_r, m: ms.MapState, last: FrameData,
                      last_feat_lm, R_last, t_last, vel_R, vel_t, has_vel,
                      ref_kf, cam_params, cam_kind, cfg: TrackerConfig,
                      vel_rot_trusted=False):
    """Stereo per-frame program: dual extraction + row matching + tracking,
    one dispatch."""
    fr = extract_stereo_frame(img_l, img_r, cam_params, cam_kind, cfg)
    return _track_core(fr, m, last, last_feat_lm, R_last, t_last, vel_R,
                       vel_t, has_vel, ref_kf, cam_params, cam_kind, cfg,
                       vel_rot_trusted)


@partial(jax.jit, static_argnames=("cfg",))
def track_reference_kf(m: ms.MapState, fr: FrameData, ref_kf, R0, t0,
                       cfg: TrackerConfig):
    """Prediction-free fallback: brute-force descriptor match against the
    reference keyframe's landmark-bearing features, then pose optimization
    from the last pose (reference Tracking::TrackReferenceKeyFrame,
    Tracking.cc:2535 — BoW-bucketed there; dense Hamming is cheap here)."""
    ref_desc = m.kf_feat_desc[ref_kf]
    ref_lm = m.kf_feat_lm[ref_kf]
    ref_ok = m.kf_feat_valid[ref_kf] & (ref_lm >= 0) & \
        m.lm_valid[jnp.clip(ref_lm, 0, None)]
    dmat = jnp.where(ref_ok[:, None] & fr.valid[None, :],
                     hamming.hamming_matrix(ref_desc, fr.desc),
                     matching.BIG)
    idx, _ = hamming.match_nn(dmat, ref_ok, fr.valid,
                              max_dist=hamming.TH_LOW, ratio=0.7,
                              cross_check=True)
    keep = hamming.rotation_consistency_mask(
        m.kf_feat_angle[ref_kf], fr.angle, idx)
    idx = jnp.where(keep, idx, -1)
    # scatter: current feature slot -> landmark
    F = fr.uv.shape[0]
    cur_lm = jnp.full(F, -1, jnp.int32)
    cur_lm = cur_lm.at[jnp.where(idx >= 0, idx, F)].set(ref_lm, mode="drop")
    inv_sig2 = cfg.lm_cfg.sigma2_inv
    info = (cfg.focal ** 2) * inv_sig2[
        jnp.clip(fr.octave, 0, cfg.n_levels - 1)]
    lm_i = jnp.clip(cur_lm, 0, None)
    res = pose_opt.optimize_pose(
        R0, t0, m.lm_pos[lm_i], fr.xn, info,
        (cur_lm >= 0) & m.lm_valid[lm_i], n_rounds=3, n_iters=10)
    return res.R, res.t, jnp.where(res.inliers, cur_lm, -1), res.n_inliers


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def relocalize_candidate(m: ms.MapState, fr: FrameData, kf_id, key,
                         cfg: TrackerConfig, cam_params=None,
                         cam_kind=None):
    """One relocalization attempt against a candidate keyframe (reference
    Tracking::Relocalization, Tracking.cc:3360): brute-force descriptor
    match to the KF's landmarks, PnP RANSAC, motion-only refinement, then
    a guided SearchByProjection second pass over the candidate's local map
    + final refinement (reference Tracking.cc:3447-3508 — the second pass
    rescues borderline relocalizations with 30-49 first-pass inliers)."""
    K, F = m.kf_feat_lm.shape
    L = m.lm_valid.shape[0]
    ref_desc = m.kf_feat_desc[kf_id]
    ref_lm = m.kf_feat_lm[kf_id]
    ref_ok = m.kf_feat_valid[kf_id] & (ref_lm >= 0) & \
        m.lm_valid[jnp.clip(ref_lm, 0, None)]
    dmat = jnp.where(ref_ok[:, None] & fr.valid[None, :],
                     hamming.hamming_matrix(ref_desc, fr.desc),
                     matching.BIG)
    idx, _ = hamming.match_nn(dmat, ref_ok, fr.valid,
                              max_dist=hamming.TH_LOW, ratio=0.75,
                              cross_check=True)
    cur_lm = jnp.full(F, -1, jnp.int32)
    cur_lm = cur_lm.at[jnp.where(idx >= 0, idx, F)].set(ref_lm, mode="drop")
    lm_i = jnp.clip(cur_lm, 0, None)
    has = (cur_lm >= 0) & m.lm_valid[lm_i]
    pnp_res = pnp.solve_pnp(key, m.lm_pos[lm_i], fr.xn, has,
                            focal=cfg.focal, n_hyp=192)
    inv_sig2 = cfg.lm_cfg.sigma2_inv
    info = (cfg.focal ** 2) * inv_sig2[
        jnp.clip(fr.octave, 0, cfg.n_levels - 1)]
    res = pose_opt.optimize_pose(pnp_res.R, pnp_res.t, m.lm_pos[lm_i],
                                 fr.xn, info, has, n_rounds=3, n_iters=10)
    cur_lm = jnp.where(res.inliers, cur_lm, -1)
    if cam_params is None:
        return res.R, res.t, cur_lm, res.n_inliers
    # guided second pass: project the candidate's covisible-window
    # landmarks with the PnP-refined pose and window-search
    cam = cameras.Camera(cam_kind, cam_params)
    win_idx, win_ok = ms.local_window(m, kf_id, min(LOCAL_KFS, K),
                                      min_weight=10)
    slot_lm = jnp.where(m.kf_feat_lm >= 0, m.kf_feat_lm, L)
    lm_in = jnp.zeros(L + 1, bool).at[
        jnp.where((m.kf_feat_valid[win_idx] & win_ok[:, None]),
                  slot_lm[win_idx], L).reshape(-1)].set(True)
    lm_in = lm_in[:L] & m.lm_valid
    lm_sel_n = min(MAX_LOCAL_LM, L)
    _, lm_sel = jax.lax.top_k(lm_in.astype(jnp.int32), lm_sel_n)
    proj_m = matching.search_by_projection(
        m.lm_pos[lm_sel], m.lm_normal[lm_sel], m.lm_dist_max[lm_sel],
        m.lm_desc[lm_sel], lm_in[lm_sel],
        res.R, res.t, lambda Xc: cameras.project(cam, Xc),
        fr.uv, fr.octave, fr.desc, fr.valid,
        (cfg.width, cfg.height), radius_px=10.0, scale=cfg.scale,
        n_levels=cfg.n_levels)
    ext_lm = jnp.where(proj_m.feat_lm >= 0,
                       lm_sel[jnp.clip(proj_m.feat_lm, 0, None)], -1)
    cur_lm2 = jnp.where(ext_lm >= 0, ext_lm, cur_lm)
    lm_i2 = jnp.clip(cur_lm2, 0, None)
    res2 = pose_opt.optimize_pose(
        res.R, res.t, m.lm_pos[lm_i2], fr.xn, info,
        (cur_lm2 >= 0) & m.lm_valid[lm_i2], n_rounds=3, n_iters=10)
    # keep the better of the two passes
    better = res2.n_inliers >= res.n_inliers
    R_f = jnp.where(better, res2.R, res.R)
    t_f = jnp.where(better, res2.t, res.t)
    lm_f = jnp.where(better, jnp.where(res2.inliers, cur_lm2, -1), cur_lm)
    n_f = jnp.maximum(res2.n_inliers, res.n_inliers)
    return R_f, t_f, lm_f, n_f


@jax.jit
def insert_keyframe(m: ms.MapState, fr: FrameData, feat_lm, R, t, ts,
                    slot=None, prev_id=None):
    """Write the current frame into keyframe slot `slot` (reference
    Tracking::CreateNewKeyFrame + LocalMapping::ProcessNewKeyFrame).
    Default slot is the append position `n_kf`; the host allocator passes
    a culled keyframe's slot once the high-water mark reaches capacity
    (reference maps grow/cull indefinitely — KeyFrame::SetBadFlag frees
    the object; here the fixed-capacity slot is recycled). `prev_id` is
    the temporal-chain predecessor (reference mPrevKF) — the previously
    NEWEST keyframe, which is no longer `slot - 1` once slots recycle."""
    k = m.n_kf if slot is None else slot
    prev = k - 1 if prev_id is None else prev_id
    lm_i = jnp.clip(feat_lm, 0, None)
    assoc = (feat_lm >= 0) & m.lm_valid[lm_i]
    m = m._replace(
        kf_R=m.kf_R.at[k].set(R),
        kf_t=m.kf_t.at[k].set(t),
        kf_valid=m.kf_valid.at[k].set(True),
        kf_ts=m.kf_ts.at[k].set(ts),
        kf_feat_uv=m.kf_feat_uv.at[k].set(fr.uv),
        kf_feat_xn=m.kf_feat_xn.at[k].set(fr.xn),
        kf_feat_octave=m.kf_feat_octave.at[k].set(fr.octave),
        kf_feat_angle=m.kf_feat_angle.at[k].set(fr.angle),
        kf_feat_desc=m.kf_feat_desc.at[k].set(fr.desc),
        kf_feat_valid=m.kf_feat_valid.at[k].set(fr.valid),
        kf_feat_ur=m.kf_feat_ur.at[k].set(fr.ur),
        kf_feat_lm=m.kf_feat_lm.at[k].set(jnp.where(assoc, feat_lm, -1)),
        kf_prev=m.kf_prev.at[k].set(prev),
        n_kf=jnp.maximum(m.n_kf, k + 1),
    )
    return m, k


@partial(jax.jit, static_argnames=("cfg",))
def create_initial_map(m: ms.MapState, fr0: FrameData, fr1: FrameData,
                       match01, R21, t21, points, good, ts0, ts1,
                       cfg: TrackerConfig):
    """Monocular initial map (reference CreateInitialMapMonocular,
    Tracking.cc:2345): two KFs, triangulated landmarks, median-depth gauge
    normalization, then a small full BA."""
    L = m.lm_valid.shape[0]
    F = fr0.uv.shape[0]
    # median depth normalization (reference: invMedianDepth scaling)
    depths = jnp.where(good, points[:, 2], jnp.nan)
    med = jnp.nanmedian(depths)
    inv_med = 1.0 / jnp.clip(med, 1e-3, None)
    pts = points * inv_med
    t21n = t21 * inv_med

    m, k0 = insert_keyframe(m, fr0, jnp.full(F, -1, jnp.int32),
                            jnp.eye(3), jnp.zeros(3), ts0)
    m, k1 = insert_keyframe(m, fr1, jnp.full(F, -1, jnp.int32), R21, t21n,
                            ts1)

    # allocate landmarks for good matches
    n_new = jnp.cumsum(good.astype(jnp.int32)) - 1
    slot = jnp.where(good, n_new, L - 1)
    j = jnp.clip(match01, 0, None)
    dist0 = jnp.linalg.norm(pts, axis=-1)
    dmax = dist0 * cfg.scale ** fr0.octave.astype(jnp.float32)
    m = m._replace(
        lm_pos=m.lm_pos.at[slot].set(
            jnp.where(good[:, None], pts, m.lm_pos[slot])),
        lm_valid=m.lm_valid.at[slot].set(good | m.lm_valid[slot]),
        lm_desc=m.lm_desc.at[slot].set(
            jnp.where(good[:, None], fr0.desc, m.lm_desc[slot])),
        lm_ref_kf=m.lm_ref_kf.at[slot].set(
            jnp.where(good, k0, m.lm_ref_kf[slot])),
        lm_first_ts=m.lm_first_ts.at[slot].set(
            jnp.where(good, m.kf_ts[k0], m.lm_first_ts[slot])),
        lm_dist_max=m.lm_dist_max.at[slot].set(
            jnp.where(good, dmax, m.lm_dist_max[slot])),
        lm_visible=m.lm_visible.at[slot].set(1),
        lm_found=m.lm_found.at[slot].set(1),
        kf_feat_lm=m.kf_feat_lm
            .at[k0, jnp.arange(F)].set(jnp.where(good, slot, -1))
            .at[k1, j].set(jnp.where(good, slot, m.kf_feat_lm[k1, j])),
        n_lm=jnp.sum(good),
    )
    m = ms.update_landmark_stats(m)
    # init BA (reference GlobalBundleAdjustemnt(map, 20))
    m = local_mapping.local_bundle_adjustment(m, k1, cfg.lm_cfg)
    m = ms.update_landmark_stats(m)
    return m, k1


@jax.jit
def imu_predict(R_cw, t_cw, v, bias, acc, gyro, dts, mask, calib):
    """Dead-reckon from the last frame's state with this frame's IMU batch
    (reference Tracking::PredictStateIMU, Tracking.cc:1632). Body frame ==
    camera frame at this layer. Returns predicted (R_cw, t_cw)."""
    from .. import imu as imu_mod
    pre = imu_mod.preintegrate(acc, gyro, dts, mask, bias, calib)
    R_wb = R_cw.T
    p = -lie.matvec(R_wb, t_cw)
    R_wb2, p2, v2 = imu_mod.predict_state(R_wb, p, v, bias, pre)
    R_cw2 = R_wb2.T
    t_cw2 = -lie.matvec(R_cw2, p2)
    return R_cw2, t_cw2, v2


@jax.jit
def continue_preintegration(pre, acc, gyro, dts, mask, calib):
    """Extend the running since-last-KF preintegration with one frame's IMU
    batch (reference mpImuPreintegratedFromLastKF, Tracking.cc:1528)."""
    from .. import imu as imu_mod
    return imu_mod.preintegrate(acc, gyro, dts, mask, pre.bias, calib,
                                init=pre)


@jax.jit
def imu_predict_from_kf(m: ms.MapState, anchor_kf, bias, pre):
    """Predict the current camera pose + velocity by dead-reckoning the
    since-last-KF preintegration from the (possibly BA-updated) anchor
    keyframe state (reference PredictStateIMU with mbMapUpdated,
    Tracking.cc:1632)."""
    from .. import imu as imu_mod
    R_kf = m.kf_R[anchor_kf]
    R_wb = R_kf.T
    p = -lie.matvec(R_wb, m.kf_t[anchor_kf])
    v = m.kf_v[anchor_kf]
    R_wb2, p2, v2 = imu_mod.predict_state(R_wb, p, v, bias, pre)
    R_cw2 = R_wb2.T
    t_cw2 = -lie.matvec(R_cw2, p2)
    return R_cw2, t_cw2, v2


@partial(jax.jit, static_argnames=("cfg",))
def pose_inertial_step(m: ms.MapState, fr: FrameData, feat_lm, R, t,
                       v0, bias0, anchor_kf, pre, ref_kf,
                       cfg: TrackerConfig):
    """Per-frame visual-inertial pose refinement (reference
    PoseInertialOptimizationLastKeyFrame, Optimizer.cc:4391): fuse the
    visual associations from the tracking step with the since-last-KF
    preintegration, anchored on the last keyframe's state. Returns the
    refined pose/velocity/bias + recomputed velocity model + trajectory
    entry."""
    from ..optim import vi_ba
    lm_i = jnp.clip(feat_lm, 0, None)
    valid = (feat_lm >= 0) & m.lm_valid[lm_i]
    inv_sig2 = cfg.lm_cfg.sigma2_inv
    info = (cfg.focal ** 2) * inv_sig2[
        jnp.clip(fr.octave, 0, cfg.n_levels - 1)]
    R_a = m.kf_R[anchor_kf]
    R_a_wb = R_a.T
    p_a = -lie.matvec(R_a_wb, m.kf_t[anchor_kf])
    from ..optim import vi_ba as vi_ba_mod
    info9 = jnp.linalg.inv(pre.C[:9, :9]
                           + 1e-9 * jnp.eye(9, dtype=pre.C.dtype))
    info9 = vi_ba_mod.floor_info(0.5 * (info9 + info9.T))
    rw = 1.0 / jnp.clip(jnp.diagonal(pre.C[9:, 9:]), 1e-12, None)
    res = vi_ba.optimize_pose_inertial(
        R, t, v0, bias0,
        m.lm_pos[lm_i], fr.xn, info, valid, fr.ur,
        jnp.asarray(cfg.baseline, jnp.float32),
        R_a_wb, p_a, m.kf_v[anchor_kf], m.kf_bias[anchor_kf],
        pre.dt, pre.dR, pre.dV, pre.dP, pre.J_Rg, pre.J_Vg, pre.J_Va,
        pre.J_Pg, pre.J_Pa, info9, pre.bias, rw, n_iters=6)
    # refreshed trajectory entry relative to the reference keyframe
    Rr, tr_ = m.kf_R[ref_kf], m.kf_t[ref_kf]
    Rri, tri = lie.se3_inv(Rr, tr_)
    rel = lie.se3_mul(res.R_cw, res.t_cw, Rri, tri)
    return res, rel


def _track_core_vi(fr: FrameData, m: ms.MapState, last, last_feat_lm,
                   R_last, t_last, ref_kf, cam_params, cam_kind,
                   cfg: TrackerConfig, pre, anchor_kf, bias,
                   acc, gyro, dts, calib):
    """Fused visual-inertial per-frame body: since-KF preintegration extend
    + IMU prediction from the anchor keyframe + visual tracking +
    pose-inertial refinement, compiled as ONE program (the reference runs
    PreintegrateIMU (Tracking.cc:1528), PredictStateIMU (Tracking.cc:1632),
    the visual TrackLocalMap and PoseInertialOptimizationLastKeyFrame
    (Optimizer.cc:4391) as separate steps of the same frame; fusing them
    removes three host round-trips per frame — the structural cause of the
    round-3 0.44 fps flagship number). Returns the extended preintegration
    as the tuple's last element."""
    from .. import imu as imu_mod
    pre = imu_mod.preintegrate(acc, gyro, dts, dts > 0, pre.bias, calib,
                               init=pre)
    R_pred, t_pred, v_pred = imu_predict_from_kf(m, anchor_kf, bias, pre)
    Ri, ti = lie.se3_inv(R_last, t_last)
    vel = lie.se3_mul(R_pred, t_pred, Ri, ti)
    fr, out, _, _, info = _track_core(
        fr, m, last, last_feat_lm, R_last, t_last, vel[0], vel[1],
        jnp.asarray(True), ref_kf, cam_params, cam_kind, cfg,
        jnp.asarray(False))
    res, _ = pose_inertial_step(out.m, fr, out.feat_lm, out.R, out.t,
                                v_pred, bias, anchor_kf, pre, out.ref_kf,
                                cfg)
    ok = (jnp.isfinite(res.R_cw).all() & jnp.isfinite(res.t_cw).all()
          & jnp.isfinite(res.v).all() & jnp.isfinite(res.bias).all())
    R_f = jnp.where(ok, res.R_cw, out.R)
    t_f = jnp.where(ok, res.t_cw, out.t)
    v_f = jnp.where(ok, res.v, v_pred)
    b_f = jnp.where(ok, res.bias, bias)
    out = out._replace(R=R_f, t=t_f)
    vel_new = lie.se3_mul(R_f, t_f, Ri, ti)
    Rr, tr_ = out.m.kf_R[out.ref_kf], out.m.kf_t[out.ref_kf]
    Rri, tri = lie.se3_inv(Rr, tr_)
    rel = lie.se3_mul(R_f, t_f, Rri, tri)
    info = info.at[2].set(
        jnp.isfinite(vel_new[1]).all().astype(jnp.float32))
    return fr, out, vel_new, rel, info, v_f, b_f, pre


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step_vi_stereo(img_l, img_r, m: ms.MapState, last, last_feat_lm,
                         R_last, t_last, ref_kf, cam_params, cam_kind,
                         cfg: TrackerConfig, pre, anchor_kf, bias,
                         acc, gyro, dts, calib):
    fr = extract_stereo_frame(img_l, img_r, cam_params, cam_kind, cfg)
    return _track_core_vi(fr, m, last, last_feat_lm, R_last, t_last,
                          ref_kf, cam_params, cam_kind, cfg, pre,
                          anchor_kf, bias, acc, gyro, dts, calib)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step_vi_mono(img, m: ms.MapState, last, last_feat_lm,
                       R_last, t_last, ref_kf, cam_params, cam_kind,
                       cfg: TrackerConfig, pre, anchor_kf, bias,
                       acc, gyro, dts, calib):
    fr = extract_frame(img, cam_params, cam_kind, cfg)
    return _track_core_vi(fr, m, last, last_feat_lm, R_last, t_last,
                          ref_kf, cam_params, cam_kind, cfg, pre,
                          anchor_kf, bias, acc, gyro, dts, calib)


@partial(jax.jit, static_argnames=("cfg", "cam_kind"))
def track_step_vi_framedata(fr: FrameData, m: ms.MapState, last,
                            last_feat_lm, R_last, t_last, ref_kf,
                            cam_params, cam_kind, cfg: TrackerConfig,
                            pre, anchor_kf, bias,
                            acc, gyro, dts, calib):
    return _track_core_vi(fr, m, last, last_feat_lm, R_last, t_last,
                          ref_kf, cam_params, cam_kind, cfg, pre,
                          anchor_kf, bias, acc, gyro, dts, calib)


@jax.jit
def apply_imu_gauge(m: ms.MapState, R_wg, scale, v_kf, bias):
    """Rotate + rescale the whole map after IMU initialization (reference
    Map::ApplyScaledRotation, Map.h:118 + LocalMapping.cc:1221)."""
    from ..optim import inertial as inertial_mod
    kf_R2, kf_t2, lm2, v2 = inertial_mod.apply_gauge(
        m.kf_R, m.kf_t, m.lm_pos, v_kf, R_wg, scale)
    return m._replace(
        kf_R=jnp.where(m.kf_valid[:, None, None], kf_R2, m.kf_R),
        kf_t=jnp.where(m.kf_valid[:, None], kf_t2, m.kf_t),
        lm_pos=jnp.where(m.lm_valid[:, None], lm2, m.lm_pos),
        kf_v=jnp.where(m.kf_valid[:, None], v2, m.kf_v),
        kf_bias=jnp.where(m.kf_valid[:, None], bias[None, :], m.kf_bias),
        lm_dist_max=jnp.where(m.lm_valid, m.lm_dist_max * scale,
                              m.lm_dist_max))


# ---------------------------------------------------------------------------
# host state machine
# ---------------------------------------------------------------------------

class Tracker:
    """Host-side orchestration (reference Tracking.cc state machine).

    States: NO_IMAGES -> NOT_INITIALIZED -> OK <-> RECENTLY_LOST -> LOST.
    """

    IMU_BUF = 768   # max IMU samples accumulated between keyframes

    def __init__(self, cam: cameras.Camera, cfg: TrackerConfig,
                 voc=None, imu_calib=None, stereo_rig=None):
        self.cam = cam
        self.cfg = cfg
        self.voc = voc
        self.db = None
        # non-rectified two-camera rig: (cam2, R_rl, t_rl) with
        # X_right = R_rl X_left + t_rl (KB8 fisheye stereo — reference
        # two-camera Frame path)
        self.stereo_rig = stereo_rig
        # --- inertial state (reference Tracking IMU members) ---
        self.calib = imu_calib
        # IMU dead-reckoning predicts from the last KEYFRAME state through
        # the running since-KF preintegration, and every frame is refined
        # by the visual-inertial pose optimization
        # (PoseInertialOptimizationLastKeyFrame) which maintains accurate
        # velocities — both on by default once the IMU is initialized
        self.imu_predict_ok = True
        self._pre_from_kf = None      # running preintegration since last KF
        self._anchor_kf = None        # the KF it starts from
        if imu_calib is not None and not cfg.inertial:
            object.__setattr__(cfg, "__dict__", dict(cfg.__dict__))  # no-op
            cfg = tracking_replace_inertial(cfg)
            self.cfg = cfg
        self.imu_ready = False
        self.v_cur = jnp.zeros(3)
        self.bias = jnp.zeros(6)
        self.kf_imu = None
        self.imu_buf = []          # samples since last keyframe
        self.ts_first_kf = None
        self.viba_stage = 0
        if imu_calib is not None:
            from ..optim import inertial as inertial_mod
            self.kf_imu = inertial_mod.empty_kf_imu(cfg.max_kf)
        self.loop_closer = None
        self.n_loops_closed = 0
        if voc is not None:
            from ..vocab import database as kfdb
            from . import loop_closing
            self.db = kfdb.empty(cfg.max_kf, voc.n_words)
            self.loop_closer = loop_closing.LoopCloser(cfg)
        self.m = ms.empty_map(cfg.max_kf, cfg.n_feat, cfg.max_lm)
        self.state = "NO_IMAGES"
        self.fr_init: Optional[FrameData] = None
        self.ts_init = 0.0
        self.last: Optional[FrameData] = None
        self.last_feat_lm = None
        self.R_last = jnp.eye(3)
        self.t_last = jnp.zeros(3)
        self.vel = (jnp.eye(3), jnp.zeros(3))
        self.has_vel = False
        self.ref_kf = 0
        self.n_kf_host = 0
        self.last_kf_id = -1   # newest KF's slot (!= n_kf_host-1 once
        self.kf_seq = 0        # slots recycle); kf_seq counts inserts
        self._free_kf_slots = []
        self._ref_matches = 0  # inlier count at the last KF insertion
        self.frames_since_kf = 0
        self.key = jax.random.PRNGKey(7)
        self.frames_lost = 0
        self._mapping_enabled = True
        self._kf_prev_override = None   # set by Atlas merge (chain splice)
        # pipelined frame loop: decisions lag cfg.pipeline_depth frames so
        # the device->host info fetch (compute + link round trip) overlaps
        # subsequent frames' compute. Each entry: [out_tuple, ts, corr]
        # where corr is the accumulated keyframe-BA gauge delta applied to
        # map state since that frame was dispatched (None = identity).
        self.pipelined = True
        self._pending = []
        # trajectory: list of (ts, map_gen, ref_kf, R_cr, t_cr) — pose
        # relative to a reference KF of a specific map generation
        # (reference mlRelativeFramePoses + mlpReferences, Tracking.h)
        self.trajectory = []
        self.n_frames = 0
        # multi-map Atlas (reference Atlas): stashed inactive maps +
        # generation counter of the active map
        self.stash = []
        self.map_gen = 0
        # REGISTER_TIMES-equivalent stage timing (off unless
        # MORB_REGISTER_TIMES is set; the fused per-frame dispatch bounds
        # the resolution to TrackTotal / LMTotal / LoopTotal)
        from ..utils import profiling
        self.timers = profiling.global_timers()

    # -- public API -------------------------------------------------------

    def track_stereo(self, img_l, img_r, ts: float):
        """One stereo pair -> (state, T_cw or None) (reference
        System::TrackStereo -> Tracking::GrabImageStereo)."""
        self.n_frames += 1
        self._check_timestamp(ts)
        cfg = self.cfg
        if self.stereo_rig is not None:
            # non-rectified two-camera path (fisheye stereo)
            cam2, R_rl, t_rl = self.stereo_rig
            fr = extract_stereo_general_frame(
                jnp.asarray(img_l),
                jnp.asarray(img_r),
                self.cam.params, self.cam.kind, cam2.params, cam2.kind,
                R_rl, t_rl, cfg)
            if self.state in ("NO_IMAGES", "NOT_INITIALIZED"):
                if int(jnp.sum(fr.valid & (fr.depth > 0))) >= \
                        cfg.min_stereo_init_feats:
                    return self._init_from_depth(fr, ts)
                self.state = "NOT_INITIALIZED"
                return self.state, None
            if self.last is None:
                if self._recover_lost(fr):
                    return self.state, (self.R_last, self.t_last)
                return self.state, None
            return self._track_framedata(fr, ts)
        if self.state in ("NO_IMAGES", "NOT_INITIALIZED"):
            fr = extract_stereo_frame(jnp.asarray(img_l),
                                      jnp.asarray(img_r),
                                      self.cam.params, self.cam.kind, cfg)
            if int(jnp.sum(fr.valid & (fr.depth > 0))) >= \
                    cfg.min_stereo_init_feats:
                return self._init_from_depth(fr, ts)
            self.state = "NOT_INITIALIZED"
            return self.state, None
        return self._track((jnp.asarray(img_l),
                            jnp.asarray(img_r)), ts)

    def track_rgbd(self, img, depth_map, ts: float):
        """One RGB-D frame -> (state, T_cw or None) (reference
        System::TrackRGBD). `baseline` in the config sets the virtual
        stereo baseline (reference Camera.bf / fx)."""
        self.n_frames += 1
        self._check_timestamp(ts)
        cfg = self.cfg
        fr = extract_rgbd_frame(jnp.asarray(img),
                                jnp.asarray(depth_map, jnp.float32),
                                self.cam.params, self.cam.kind, cfg)
        if self.state in ("NO_IMAGES", "NOT_INITIALIZED"):
            if int(jnp.sum(fr.valid & (fr.depth > 0))) >= \
                    cfg.min_stereo_init_feats:
                return self._init_from_depth(fr, ts)
            self.state = "NOT_INITIALIZED"
            return self.state, None
        if self.last is None:
            if self._recover_lost(fr):
                return self.state, (self.R_last, self.t_last)
            return self.state, None
        return self._track_framedata(fr, ts)

    def _init_from_depth(self, fr: FrameData, ts: float):
        cfg = self.cfg
        self.m, k0 = stereo_initialize(self.m, fr,
                                       jnp.asarray(ts, jnp.float32), cfg)
        if self.calib is not None:
            self._record_kf_imu(int(k0), ts)   # anchors ts_first_kf + pre
        self._db_add(int(k0), fr)
        self.last = fr
        self.last_feat_lm = self.m.kf_feat_lm[int(k0)]
        self.R_last = jnp.eye(3)
        self.t_last = jnp.zeros(3)
        self.ref_kf = int(k0)
        self.n_kf_host = int(k0) + 1
        self.last_kf_id = int(k0)
        self.kf_seq += 1
        self._ref_matches = int(jnp.sum(self.last_feat_lm >= 0))
        self.frames_since_kf = 0
        self.has_vel = False
        self.state = "OK"
        self.trajectory.append((ts, self.map_gen, int(k0), jnp.eye(3),
                                jnp.zeros(3)))
        return self.state, (self.R_last, self.t_last)

    def track_mono_inertial(self, img, ts: float, imu_acc, imu_gyro,
                            imu_ts):
        """Monocular-inertial frame (reference System::TrackMonocular with
        IMU batch): samples cover (t_lastframe, ts]."""
        self._pre_inertial_frame(ts)
        self._accumulate_imu(imu_acc, imu_gyro, imu_ts, ts)
        if not (self._use_vi_fused() and self.last is not None):
            # fused frames extend the since-KF chain IN-PROGRAM
            self._update_pre_from_kf()
        if self.imu_ready and self.imu_predict_ok and \
                self.state == "OK" and self.last is not None and \
                not self._use_vi_fused():
            self._set_imu_prediction()
        out = self.track_mono(img, ts)
        out = self._inertial_lost_fallback(ts, out)
        self._after_inertial_frame(ts)
        return out

    def track_stereo_inertial(self, img_l, img_r, ts: float, imu_acc,
                              imu_gyro, imu_ts):
        self._pre_inertial_frame(ts)
        self._accumulate_imu(imu_acc, imu_gyro, imu_ts, ts)
        if not (self._use_vi_fused() and self.last is not None):
            self._update_pre_from_kf()
        if self.imu_ready and self.imu_predict_ok and \
                self.state == "OK" and self.last is not None and \
                not self._use_vi_fused():
            self._set_imu_prediction()
        out = self.track_stereo(img_l, img_r, ts)
        out = self._inertial_lost_fallback(ts, out)
        self._after_inertial_frame(ts)
        return out

    def track_rgbd_inertial(self, img, depth_map, ts: float, imu_acc,
                            imu_gyro, imu_ts):
        """RGB-D + IMU frame (reference IMU_RGBD sensor mode)."""
        self._pre_inertial_frame(ts)
        self._accumulate_imu(imu_acc, imu_gyro, imu_ts, ts)
        if not (self._use_vi_fused() and self.last is not None):
            self._update_pre_from_kf()
        if self.imu_ready and self.imu_predict_ok and \
                self.state == "OK" and self.last is not None and \
                not self._use_vi_fused():
            self._set_imu_prediction()
        out = self.track_rgbd(img, depth_map, ts)
        out = self._inertial_lost_fallback(ts, out)
        self._after_inertial_frame(ts)
        return out

    def _pre_inertial_frame(self, ts: float):
        if self.state == "OK":
            self._ts_lost_start = None
        elif getattr(self, "_ts_lost_start", None) is None and \
                self.state == "RECENTLY_LOST":
            self._ts_lost_start = ts

    def _inertial_lost_fallback(self, ts: float, out):
        """IMU dead-reckoning through RECENTLY_LOST (reference
        Tracking.cc:1838-1851: while recently lost on an IMU-initialized
        map the pose is PredictStateIMU'd for up to time_recently_lost
        seconds, and LOST is only declared after that budget). The since-KF
        preintegration keeps extending every frame, so the prediction is
        the anchor keyframe's state integrated to NOW; trajectory entries
        keep flowing, and the brute-force recovery seeds its pose
        optimization at the predicted pose."""
        state, pose = out
        if state != "RECENTLY_LOST" or not self.imu_ready or \
                self.calib is None or self._pre_from_kf is None or \
                self._anchor_kf is None or \
                getattr(self, "_vi_suspended", False):
            return out
        if self._ts_lost_start is None:
            self._ts_lost_start = ts
        if ts - self._ts_lost_start > self.cfg.time_recently_lost:
            self.flush()
            self.state = "LOST"
            if self._mapping_enabled:
                if self.n_kf_host < 10:
                    self.reset_active_map()
                else:
                    self.create_map_in_atlas()
            return self.state, None
        R_p, t_p, v_p = imu_predict_from_kf(
            self.m, jnp.asarray(self._anchor_kf, jnp.int32), self.bias,
            self._pre_from_kf)
        if not bool(jnp.isfinite(t_p).all()):
            return out
        self.R_last, self.t_last = R_p, t_p
        self.v_cur = v_p
        self.frames_lost = 0          # the time budget governs, not frames
        Rr, tr_ = self.m.kf_R[self.ref_kf], self.m.kf_t[self.ref_kf]
        Rri, tri = lie.se3_inv(Rr, tr_)
        rel = lie.se3_mul(R_p, t_p, Rri, tri)
        self.trajectory.append((ts, self.map_gen, self.ref_kf, rel[0],
                                rel[1]))
        return self.state, (R_p, t_p)

    def _accumulate_imu(self, acc, gyro, ts_arr, frame_ts):
        if self.calib is None or len(ts_arr) == 0:
            self._frame_imu = None
            return
        acc = np.asarray(acc, np.float32)
        gyro = np.asarray(gyro, np.float32)
        # rotate BODY-frame samples into the camera frame (body == camera
        # downstream; the T_bc lever arm's angular-acceleration term is
        # neglected — a few mm/s^2 at EuRoC geometry)
        R_bc = np.asarray(self.calib.R_bc)
        if not np.allclose(R_bc, np.eye(3)):
            acc = acc @ R_bc            # row-wise R_bc^T @ a
            gyro = gyro @ R_bc
        ts_arr = np.asarray(ts_arr)
        prev = getattr(self, "_last_frame_ts", ts_arr[0] - 0.005)
        dts = np.diff(np.concatenate([[prev], ts_arr])).astype(np.float32)
        # last interval extends to the frame timestamp
        if frame_ts > ts_arr[-1]:
            dts[-1] += frame_ts - ts_arr[-1]
        self._frame_imu = (acc, gyro, dts)
        self.imu_buf.append((frame_ts, acc, gyro, dts))
        self._last_frame_ts = frame_ts

    def _update_pre_from_kf(self):
        """Extend the running since-last-KF preintegration with this frame's
        IMU batch (reference mpImuPreintegratedFromLastKF)."""
        if self._pre_from_kf is None:
            return
        acc, gyro, dts = self._padded_frame_imu()
        if acc is None:
            return
        self._pre_from_kf = continue_preintegration(
            self._pre_from_kf, acc, gyro, dts, dts > 0, self.calib)

    def _reset_pre_from_kf(self, k: int):
        """Restart the since-KF preintegration at the current bias."""
        if self.calib is None:
            return
        from .. import imu as imu_mod
        z = jnp.zeros((1, 3), jnp.float32)
        self._pre_from_kf = imu_mod.preintegrate(
            z, z, jnp.zeros(1, jnp.float32), jnp.zeros(1, bool),
            self.bias, self.calib)
        self._anchor_kf = k

    def _set_imu_prediction(self):
        """Constant-bias dead-reckoning from the last KEYFRAME through the
        running preintegration (reference PredictStateIMU with map-updated,
        Tracking.cc:1632)."""
        if self._pre_from_kf is None or self._anchor_kf is None or \
                getattr(self, "_vi_suspended", False):
            return
        R_pred, t_pred, v_pred = imu_predict_from_kf(
            self.m, jnp.asarray(self._anchor_kf, jnp.int32), self.bias,
            self._pre_from_kf)
        Ri, ti = lie.se3_inv(self.R_last, self.t_last)
        self.vel = lie.se3_mul(R_pred, t_pred, Ri, ti)
        self.has_vel = True
        # the ROTATION part of the prediction is deliberately NOT trusted
        # for the window search: the same preintegration also powers the
        # per-frame pose-inertial refinement, and a trusted-rotation search
        # + refinement form a positive feedback loop (prediction-centered
        # windows select associations that confirm the prediction, the
        # refinement's inertial edge re-confirms it; observed as runaway
        # drift within ~10 frames). Translation prediction keeps the
        # dead-reckoning benefit; the refinement restores the gyro's
        # rotational information through the inertial edge itself.
        self._vel_trusted = False
        self._v_pred = v_pred

    def _fused_frame_imu(self, cap=64):
        """Padded IMU batch for the fused VI program (which extends the
        since-KF preintegration IN-PROGRAM — one dispatch per frame instead
        of a separate continue_preintegration launch). Zero-length batch
        when the frame carried no samples."""
        acc, gyro, dts = self._padded_frame_imu(cap)
        if acc is None:
            z = jnp.zeros((cap, 3), jnp.float32)
            return z, z, jnp.zeros(cap, jnp.float32)
        return acc, gyro, dts

    def _padded_frame_imu(self, cap=64):
        if getattr(self, "_frame_imu", None) is None:
            return None, None, None
        acc, gyro, dts = self._frame_imu
        n = len(dts)
        if n > cap:
            acc, gyro, dts = acc[-cap:], gyro[-cap:], dts[-cap:]
            n = cap
        pad = cap - n
        z = np.zeros((pad, 3), np.float32)
        return (jnp.asarray(np.concatenate([acc, z])),
                jnp.asarray(np.concatenate([gyro, z])),
                jnp.asarray(np.concatenate([dts, np.zeros(pad,
                                                          np.float32)])))

    def _after_inertial_frame(self, ts: float):
        if self.calib is None or self.state != "OK":
            return
        # finite-difference world velocity BEFORE IMU init only — once
        # initialized, the per-frame pose-inertial optimization maintains
        # the velocity state (reference PoseInertialOptimization*)
        if not self.imu_ready and \
                getattr(self, "_prev_pose_for_v", None) is not None:
            (R0, t0, t_prev) = self._prev_pose_for_v
            dt = max(ts - t_prev, 1e-3)
            c1 = -lie.matvec(self.R_last.T, self.t_last)
            c0 = -lie.matvec(R0.T, t0)
            v = (c1 - c0) / dt
            v = jnp.nan_to_num(v, nan=0.0, posinf=0.0, neginf=0.0)
            self.v_cur = jnp.clip(v, -20.0, 20.0)
        self._prev_pose_for_v = (self.R_last, self.t_last, ts)
        self._maybe_init_imu(ts)

    def _maybe_init_imu(self, ts: float):
        """Staged IMU initialization (reference LocalMapping::InitializeIMU
        at first chance, VIBA refinements later; LocalMapping.cc:212-272)."""
        from ..optim import inertial as inertial_mod
        if self.calib is None or self.ts_first_kf is None:
            return
        elapsed = ts - self.ts_first_kf
        n_kf = self.n_kf_host
        # bad-IMU detection (reference LocalMapping.cc:159-167 forced
        # reset): if the staged initialization never succeeds within the
        # timeout the IMU data is unusable for this map — reset and retry
        if not self.imu_ready and elapsed > self.cfg.bad_imu_timeout:
            self.bad_imu = True
            self.flush()
            self.reset_active_map()
            return
        # (t_min, kf_min, priorG, priorA): InitializeIMU then VIBA1/VIBA2
        # then periodic refinements (reference mono ScaleRefinement runs at
        # 25/35/..75 s, LocalMapping.cc:263-272)
        stage_specs = [(2.0, 10, 1e2, 1e10), (5.0, 10, 1.0, 1e5),
                       (15.0, 10, 0.0, 0.0), (25.0, 10, 0.0, 0.0),
                       (45.0, 10, 0.0, 0.0)]
        if self.viba_stage >= len(stage_specs):
            return
        t_min, kf_min, pg, pa = stage_specs[self.viba_stage]
        if elapsed < t_min or n_kf < kf_min:
            return
        # resolve any in-flight pipelined decision first: the gauge change
        # below invalidates a pending frame's device-side results
        self.flush()
        m = self.m
        R_wb = jnp.swapaxes(m.kf_R, -1, -2)
        p_wb = -lie.matvec(R_wb, m.kf_t)
        mono = self.cfg.baseline == 0.0
        # scale/gravity come from the CLOSED-FORM linear alignment over a
        # RECENT keyframe window (the early monocular map carries scale
        # drift that poisons a whole-history fit); the GN then refines
        # gravity direction, biases and velocities at FIXED scale — with
        # scale out of the GN there is no collapse mode
        K = m.kf_valid.shape[0]
        # recency by TIMESTAMP, not slot index (slots recycle once the
        # high-water mark reaches capacity)
        ts_v = jnp.where(m.kf_valid, m.kf_ts, -jnp.inf)
        thr = jax.lax.top_k(ts_v, min(14, K))[0][-1]
        recent = m.kf_valid & (m.kf_ts >= thr)
        s_lin, g_lin, v_lin, rms = inertial_mod.linear_alignment(
            self.kf_imu, R_wb, p_wb, recent)
        g_norm = float(jnp.linalg.norm(g_lin))
        # monocular scale from the closed-form alignment re-gauges the map
        # to metric; the FullInertialBA below then refines it jointly with
        # the visual structure (reference InitializeIMU scale +
        # FullInertialBA, LocalMapping.cc:1205-1250). Stereo/RGB-D maps are
        # already metric (s = 1)
        s_f = 1.0
        if mono and not self.imu_ready:
            # MONO metric scale needs a stricter gate than gravity: at the
            # 2 s first-chance window the closed-form scale can be
            # confidently wrong (measured: s=0.47 at rms 0.017 when the
            # truth was ~3.6; by 3.3 s the estimate stabilizes at rms
            # ~0.003). Require a tight residual AND two consecutive
            # attempts agreeing before re-gauging the map.
            s_cand = float(s_lin)
            s_prev, seq_prev = getattr(self, "_s_cand_prev", (None, -1))
            self._s_cand_prev = (s_cand, self.kf_seq)
            # agreement only counts across DIFFERENT keyframe sets (the
            # estimate is deterministic between inserts)
            stable = (s_prev is not None and seq_prev != self.kf_seq
                      and abs(s_cand - s_prev) < 0.15 * max(s_cand, 1e-6))
            if not (0.05 < s_cand < 50.0 and float(rms) < 0.008
                    and stable):
                return
            s_f = s_cand
        if not (9.0 < g_norm < 10.6) or float(rms) > 0.03:
            # inconsistent alignment (drifty map / weak excitation) — retry
            return
        R_wg0 = inertial_mod.gravity_rotation(g_lin)
        R_wg, s, bg, ba, v_e, costs = inertial_mod.inertial_only_optimize(
            self.kf_imu, R_wb, p_wb * s_f, recent, n_iters=25,
            opt_scale=False,
            prior_gyro=max(pg, 1e-2), prior_acc=max(pa, 1e-2),
            v0=v_lin, R_wg0=R_wg0)
        if not bool(jnp.isfinite(v_e).all() & jnp.isfinite(R_wg).all()
                    & jnp.isfinite(bg).all() & jnp.isfinite(ba).all()):
            return
        self.bias = jnp.concatenate([bg, ba])
        if self.imu_ready:
            s_f = 1.0   # later stages refine gravity/bias at fixed scale
        # apply the (re-)estimated gravity rotation + scale gauge on EVERY
        # stage: a residual gravity tilt theta injects a secular 9.81*theta
        # m/s^2 velocity error into every inertial edge (observed as |v|
        # inflating ~0.5 m/s per second until tracking failed) — the
        # reference likewise re-applies the InertialOptimization estimate at
        # each VIBA stage (LocalMapping.cc:1221, ApplyScaledRotation)
        self.m = apply_imu_gauge(m, R_wg, jnp.asarray(s_f, jnp.float32),
                                 v_e, self.bias)
        Rl, tl = self.R_last, self.t_last
        self.R_last = lie.matmat(Rl, R_wg)
        self.t_last = tl * s_f
        self.v_cur = lie.matvec(R_wg.T, self.v_cur) * s_f
        if s_f != 1.0:
            self.trajectory = [
                (t_, g_, r_, R_cr, t_cr * s_f) if g_ == self.map_gen
                else (t_, g_, r_, R_cr, t_cr)
                for (t_, g_, r_, R_cr, t_cr) in self.trajectory]
        self.has_vel = False
        self.imu_ready = True
        # full visual-inertial BA over the young map (reference
        # FullInertialBA from InitializeIMU / VIBA1 / VIBA2,
        # LocalMapping.cc:212-261) with the stage's bias priors
        if self.n_kf_host >= 4:
            last = self.last_kf_id
            self.m, _ = local_mapping.full_inertial_ba(
                self.m, self.kf_imu, jnp.asarray(last, jnp.int32),
                self.cfg.lm_cfg, window=32,
                prior_gyro=max(pg, 1e-2), prior_acc=max(pa, 1e-2))
            self.bias = self.m.kf_bias[last]
            # next frame re-anchors on the corrected KF state via
            # imu_predict_from_kf; the stale constant-velocity model is
            # dropped
            self.has_vel = False
        self.viba_stage += 1

    def _check_timestamp(self, ts: float):
        """Timestamp-discontinuity failure path (reference Tracking.cc:
        1713-1722): a gap or a backwards jump makes the motion model and
        IMU preintegration meaningless — a mature map is stashed in the
        Atlas and a fresh one starts; a young map resets."""
        last = getattr(self, "_last_seen_ts", None)
        self._last_seen_ts = ts
        if last is None or self.state not in ("OK", "RECENTLY_LOST"):
            return
        dt = ts - last
        if dt < 0 or dt > self.cfg.ts_jump:
            self.flush()
            if self._mapping_enabled:
                if self.n_kf_host < 10:
                    self.reset_active_map()
                else:
                    self.create_map_in_atlas()

    def track_mono(self, img, ts: float):
        """One grayscale frame -> (state, T_cw or None)."""
        self.n_frames += 1
        self._check_timestamp(ts)
        if self.state in ("NO_IMAGES", "NOT_INITIALIZED"):
            fr = extract_frame(jnp.asarray(img),
                               self.cam.params, self.cam.kind, self.cfg)
            self._try_initialize(fr, ts)
            pose = None
            if self.state == "OK":
                pose = (self.R_last, self.t_last)
            return self.state, pose
        return self._track(jnp.asarray(img), ts)

    # -- init -------------------------------------------------------------

    def _try_initialize(self, fr: FrameData, ts: float):
        cfg = self.cfg
        if self.fr_init is None or int(jnp.sum(fr.valid)) < cfg.min_init_matches:
            self.fr_init, self.ts_init = fr, ts
            self.state = "NOT_INITIALIZED"
            return
        idx = matching.search_for_initialization(
            self.fr_init.uv, self.fr_init.desc, self.fr_init.valid,
            self.fr_init.angle, fr.uv, fr.desc, fr.valid, fr.angle)
        n_match = int(jnp.sum(idx >= 0))
        if n_match < cfg.min_init_matches:
            self.fr_init, self.ts_init = fr, ts
            return
        j = jnp.clip(idx, 0, None)
        self.key, k = jax.random.split(self.key)
        res = two_view.reconstruct_two_view(
            k, self.fr_init.xn, fr.xn[j], idx >= 0, focal=cfg.focal)
        if int(res.n_good) < cfg.min_init_points or \
                float(res.parallax_deg) < 1.0:
            return  # keep reference frame, wait for more parallax
        self.m, k1 = create_initial_map(
            self.m, self.fr_init, fr, idx, res.R21, res.t21, res.points,
            res.is_good, self.ts_init, ts, cfg)
        self._db_add(int(k1) - 1, self.fr_init)
        self._db_add(int(k1), fr)
        if self.calib is not None:
            # KF0's timestamp bounds KF1's preintegration window
            self._last_kf_ts = self.ts_init
            self.ts_first_kf = self.ts_init
            self._record_kf_imu(int(k1), ts)
        self.last = fr
        self.last_feat_lm = self.m.kf_feat_lm[int(k1)]
        self.R_last = self.m.kf_R[int(k1)]
        self.t_last = self.m.kf_t[int(k1)]
        self.ref_kf = int(k1)
        self.n_kf_host = int(k1) + 1
        self.last_kf_id = int(k1)
        self.kf_seq += 2
        self._ref_matches = int(jnp.sum(self.last_feat_lm >= 0))
        self.frames_since_kf = 0
        self.has_vel = False
        self.state = "OK"
        self.trajectory.append((self.ts_init, self.map_gen, 0, jnp.eye(3),
                                jnp.zeros(3)))
        self.trajectory.append((ts, self.map_gen, int(k1), jnp.eye(3),
                                jnp.zeros(3)))

    # -- tracking ---------------------------------------------------------

    def _track_framedata(self, fr: FrameData, ts: float):
        cfg = self.cfg
        vel_R, vel_t = self.vel
        with self.timers.stage("TrackTotal") as st:
            if self._use_vi_fused():
                out_tuple = track_step_vi_framedata(
                    fr, self.m, self.last, self.last_feat_lm,
                    self.R_last, self.t_last,
                    jnp.asarray(self.ref_kf, jnp.int32),
                    self.cam.params, self.cam.kind, cfg,
                    self._pre_from_kf,
                    jnp.asarray(self._anchor_kf, jnp.int32), self.bias,
                    *self._fused_frame_imu(), self.calib)
            else:
                out_tuple = track_step_framedata(
                    fr, self.m, self.last, self.last_feat_lm,
                    self.R_last, self.t_last, vel_R, vel_t,
                    jnp.asarray(self.has_vel),
                    jnp.asarray(self.ref_kf, jnp.int32),
                    self.cam.params, self.cam.kind, cfg,
                    jnp.asarray(self._take_vel_trust()))
            st.set(out_tuple[4])
            _start_fetch(out_tuple[4])
            if self._use_pipeline():
                return self._track_pipelined(out_tuple, ts)
            return self._post_track(out_tuple, ts)

    def _track(self, img, ts: float):
        cfg = self.cfg
        if self.last is None:
            # no tracking context (e.g. a freshly loaded atlas, or a
            # pipelined frame declared bad): relocalize, or fall back to a
            # brute-force reference-KF match (works without a vocabulary)
            if isinstance(img, tuple):
                fr = extract_stereo_frame(img[0], img[1], self.cam.params,
                                          self.cam.kind, cfg)
            else:
                fr = extract_frame(img, self.cam.params, self.cam.kind, cfg)
            if self._recover_lost(fr):
                return self.state, (self.R_last, self.t_last)
            return self.state, None
        vel_R, vel_t = self.vel
        trust = jnp.asarray(self._take_vel_trust())
        with self.timers.stage("TrackTotal") as st:
            if self._use_vi_fused():
                args = (self.m, self.last, self.last_feat_lm,
                        self.R_last, self.t_last,
                        jnp.asarray(self.ref_kf, jnp.int32),
                        self.cam.params, self.cam.kind, cfg,
                        self._pre_from_kf,
                        jnp.asarray(self._anchor_kf, jnp.int32), self.bias,
                        *self._fused_frame_imu(), self.calib)
                if isinstance(img, tuple):
                    out_tuple = track_step_vi_stereo(img[0], img[1], *args)
                else:
                    out_tuple = track_step_vi_mono(img, *args)
            elif isinstance(img, tuple):
                out_tuple = track_step_stereo(
                    img[0], img[1], self.m, self.last, self.last_feat_lm,
                    self.R_last, self.t_last, vel_R, vel_t,
                    jnp.asarray(self.has_vel),
                    jnp.asarray(self.ref_kf, jnp.int32),
                    self.cam.params, self.cam.kind, cfg, trust)
            else:
                out_tuple = track_step(
                    img, self.m, self.last, self.last_feat_lm,
                    self.R_last, self.t_last, vel_R, vel_t,
                    jnp.asarray(self.has_vel),
                    jnp.asarray(self.ref_kf, jnp.int32),
                    self.cam.params, self.cam.kind, cfg, trust)
            st.set(out_tuple[4])
            _start_fetch(out_tuple[4])
            if self._use_pipeline():
                return self._track_pipelined(out_tuple, ts)
            return self._post_track(out_tuple, ts)

    # -- pipelined frame loop (reference pipeline parallelism P1/P3:
    #    tracking never blocks on its own frame's results) ----------------

    def _use_pipeline(self):
        """Pipelined decisions are used for tracking in the OK state: the
        frame's device program is dispatched against the previous frame's
        DEVICE-resident outputs, and the host decision logic (state
        machine, keyframe insertion) runs one frame late on the
        already-in-flight info vector — the device->host round trip
        (~40 ms over a remote-chip link) overlaps the next frame's compute
        instead of stalling the loop. Inertial tracking pipelines once the
        IMU is initialized: the IMU prediction + pose-inertial refinement
        are fused into the per-frame program (_track_core_vi). The
        PRE-init phase stays synchronous — its visual-only odometry must
        be as clean as possible (measured: pipelined pre-init left 2.5
        deg of pitch drift in the young map vs 0.16 deg sync, and that
        tilt poisons the gravity gauge the whole session) — and the
        staged init flushes the pending decision before a gauge change."""
        if self.calib is not None and not self.imu_ready:
            return False
        return self.pipelined and self.state == "OK"

    def _use_vi_fused(self):
        """The fused visual-inertial per-frame program is used once the
        IMU is initialized and a since-KF preintegration chain is live
        (suspended after a relocalization until the next keyframe re-roots
        the chain — the old anchor's state no longer bounds the camera)."""
        return (self.calib is not None and self.imu_ready
                and self._pre_from_kf is not None
                and self._anchor_kf is not None
                and not getattr(self, "_vi_suspended", False))

    def _track_pipelined(self, out_tuple, ts: float):
        fr, out, vel_new, rel, info = out_tuple[:5]
        self._pending.append([out_tuple, ts, None])
        # optimistic device-side state for the next dispatch (no sync):
        # vetting happens when this frame's decision is made depth frames
        # later
        self.m = out.m
        self.last = fr
        self.last_feat_lm = out.feat_lm
        self.R_last, self.t_last = out.R, out.t
        self.vel = vel_new
        self.has_vel = True
        if len(out_tuple) >= 7:
            # fused VI program: refined velocity + bias + extended since-KF
            # preintegration ride along
            self.v_cur = out_tuple[5]
            self.bias = out_tuple[6]
            if len(out_tuple) >= 8:
                self._pre_from_kf = out_tuple[7]
        self.frames_since_kf += 1
        while len(self._pending) > self.cfg.pipeline_depth:
            self._decide_pending(*self._pending.pop(0))
        return self.state, (out.R, out.t)

    def flush(self):
        """Resolve the in-flight frames' deferred decisions and finish any
        running detached GBA (call at sequence end or before reading the
        trajectory/map)."""
        while self._pending:
            self._decide_pending(*self._pending.pop(0))
        job = getattr(self, "_gba_job", None)
        if job is not None:
            while not job.advance():
                pass
            self.m = job.reconcile(self.m)
            self._gba_job = None

    def _decide_pending(self, out_tuple, ts: float, corr=None):
        """Deferred host decisions for an already-dispatched frame: state
        machine, trajectory entry, keyframe insertion (the sync path's
        _post_track, minus the per-frame fallback retries — recovery goes
        through relocalization instead)."""
        cfg = self.cfg
        fr, out, vel_new, rel, info = out_tuple[:5]
        v_bias = (out_tuple[5], out_tuple[6]) if len(out_tuple) >= 7 \
            else None
        info_h = np.asarray(info)
        n_inl = int(info_h[0])
        ref_kf_new = int(info_h[1])
        if not bool(info_h[2] > 0.5):
            self.has_vel = False
        if n_inl < cfg.min_track_points:
            # this frame was bad — the in-flight successors built on it are
            # poisoned too: drop them and recover (IMU dead-reckoning first
            # on an initialized inertial map, else relocalization)
            self.state = "RECENTLY_LOST"
            self.has_vel = False
            self.frames_lost += 1
            self._pending = []
            self.last = None
            if not self._use_vi_fused():
                # visual: re-seed the recovery search at the reference KF.
                # Inertial keeps R_last/t_last — _inertial_lost_fallback
                # replaces them with the IMU-predicted pose each frame.
                self.R_last = self.m.kf_R[self.ref_kf]
                self.t_last = self.m.kf_t[self.ref_kf]
            if self.frames_lost > 60:
                self.state = "LOST"
                if self._mapping_enabled:
                    if self.n_kf_host < 10:
                        self.reset_active_map()
                    else:
                        self.create_map_in_atlas()
            return
        self.frames_lost = 0
        self.state = "OK"
        self.ref_kf = ref_kf_new
        # gauge corrections (keyframe BA deltas) applied since this frame
        # was dispatched move its pose into the CURRENT map gauge; the
        # trajectory-relative entry is then recomputed against the
        # reference KF's CURRENT pose (otherwise every keyframe's BA
        # correction leaks into the resolved trajectory as error)
        if corr is not None:
            out = out._replace(R=lie.matmat(out.R, corr[0]),
                               t=lie.matvec(out.R, corr[1]) + out.t)
            # a keyframe BA moved the map since this frame dispatched:
            # recompute the trajectory-relative entry against the reference
            # KF's CURRENT pose. Without a correction the in-program rel is
            # exact already — reusing it keeps the common frame free of
            # per-frame device dispatches (each tiny program still costs a
            # slot on the remote device queue).
            Rr, tr_ = self.m.kf_R[ref_kf_new], self.m.kf_t[ref_kf_new]
            Rri, tri = lie.se3_inv(Rr, tr_)
            rel = lie.se3_mul(out.R, out.t, Rri, tri)
        self.trajectory.append((ts, self.map_gen, ref_kf_new, rel[0],
                                rel[1]))
        # the decision belongs to a frame len(_pending) frames back:
        # evaluate the interval conditions at ITS frame count, not the
        # optimistically advanced one (the lag over-fired c1a/c1b)
        need = self._need_new_kf(n_inl, info_h, ts,
                                 lag=len(self._pending))
        if need and self._mapping_enabled:
            loops_before = self.n_loops_closed
            k = self._insert_keyframe(fr, out, ts, refresh_anchors=False,
                                      ref_inliers=n_inl, v_bias=v_bias)
            if k is None:
                pass
            elif self.n_loops_closed != loops_before:
                # a loop correction moved the whole map: the in-flight
                # frames' results are stale — drop them and re-anchor
                self._pending = []
                self.last = None
            else:
                # the keyframe's association table was enriched by
                # triangulation/fusion — feed it back as the stage-1
                # matching anchor (the projection uses MAP geometry + the
                # predicted pose, so pairing the KF's frame data with the
                # newer optimistic pose stays consistent)
                self.last = fr
                self.last_feat_lm = self.m.kf_feat_lm[k]

    def _need_new_kf(self, n_inl: int, info_h, ts: float,
                     lag: int = 0) -> bool:
        """Full NeedNewKeyFrame condition set (reference Tracking.cc:
        2840-2994). Mapping here is synchronous, so the "local mapper idle"
        modulation maps to the min_kf_interval throttle (the mapper is
        effectively busy for the frames an insert's device work overlaps).

        c1a: too long since the last KF; c1b: min gap elapsed + mapper idle;
        c1c (stereo/RGB-D): tracking starved of close points; c2: tracked
        inliers dropped below thRefRatio of the reference KF's landmark
        count; c3: inertial timer (reference inserts every 0.5 s once the
        IMU is initialized); c4: inertial mono with weak visual tracking."""
        cfg = self.cfg
        ref_tracked = max(int(info_h[4]), 1)   # ref KF landmarks, obs >= 3
        close_trk = int(info_h[5])
        close_untrk = int(info_h[6])
        stereoish = cfg.baseline > 0
        # the reference's 0.75 stereo ratio is calibrated against the
        # INFLATED nRefMatches population; against the like-for-like
        # decayed-inliers baseline it under-fires (7 KFs in 3 s — too few
        # for the 10-KF IMU-init gate), so both sensor classes use
        # kf_ref_ratio here
        th_ratio = cfg.kf_ref_ratio
        need_close = stereoish and close_trk < 100 and close_untrk > 70
        fs = self.frames_since_kf - lag
        c1a = fs >= cfg.max_kf_interval
        c1b = fs >= cfg.min_kf_interval
        c1c = stereoish and c1b and \
            (n_inl < 0.25 * ref_tracked or need_close)
        c2 = (n_inl < th_ratio * max(self._ref_matches, 1)
              or need_close) and n_inl > 15
        # c1a inserts unconditionally: a richly-tracked frame can keep c2
        # false indefinitely, and a map that stops inserting keyframes
        # drifts unboundedly (behaviorally c1a is the reference's "too
        # long since last KF" safety valve)
        need = c1a or ((c1b or c1c) and c2)
        if cfg.inertial and self.calib is not None and n_inl > 15:
            last_ts = getattr(self, "_last_kf_ts", None)
            if not self.imu_ready:
                # pre-init inertial maps insert every 0.25 s (reference
                # Tracking.cc:2915-2925: the staged IMU initialization
                # needs ~10 keyframes within its 2 s window)
                if last_ts is not None and ts - last_ts >= 0.25:
                    need = True
            elif last_ts is not None and ts - last_ts >= 0.5:
                need = True                      # c3 inertial timer
            if self.imu_ready and not stereoish and c1b and \
                    15 < n_inl < 75:
                need = True                      # c4 weak mono-inertial
        return need and n_inl > 15

    def _take_vel_trust(self):
        t = getattr(self, "_vel_trusted", False)
        self._vel_trusted = False
        return t

    def _recompute_vel_rel(self, out):
        Ri, ti = lie.se3_inv(self.R_last, self.t_last)
        vel_new = lie.se3_mul(out.R, out.t, Ri, ti)
        Rr, tr_ = self.m.kf_R[out.ref_kf], self.m.kf_t[out.ref_kf]
        Rri, tri = lie.se3_inv(Rr, tr_)
        rel = lie.se3_mul(out.R, out.t, Rri, tri)
        return vel_new, rel

    def _post_track(self, out_tuple, ts: float):
        cfg = self.cfg
        fr, out, vel_new, rel, info = out_tuple[:5]
        # fused VI program: refined velocity + bias ride along, and the
        # pose-inertial refinement already happened in-program
        v_bias = (out_tuple[5], out_tuple[6]) if len(out_tuple) >= 7 \
            else None
        # the frame's ONE device->host sync: all decision scalars together
        info_h = np.asarray(info)
        n_inl = int(info_h[0])
        ref_kf_new = int(info_h[1])
        vel_finite = bool(info_h[2] > 0.5)
        if v_bias is None and bool(self.has_vel) and \
                n_inl < cfg.min_local_points:
            # the motion-model prediction may have poisoned the window
            # search (overshoot confirms itself on repetitive texture) —
            # retry prediction-free (reference falls back to
            # TrackReferenceKeyFrame, Tracking.cc:2727)
            out_tuple2 = track_step_framedata(
                fr, self.m, self.last, self.last_feat_lm,
                self.R_last, self.t_last, jnp.eye(3), jnp.zeros(3),
                jnp.asarray(False), jnp.asarray(self.ref_kf, jnp.int32),
                self.cam.params, self.cam.kind, cfg)
            _, out2, vel2, rel2, info2 = out_tuple2
            info2_h = np.asarray(info2)
            if int(info2_h[0]) > n_inl:
                out, n_inl = out2, int(info2_h[0])
                ref_kf_new = int(info2_h[1])
                vel_finite = bool(info2_h[2] > 0.5)
                vel_new, rel = vel2, rel2
        if v_bias is None and n_inl < cfg.min_local_points:
            # brute-force match against the reference keyframe
            Rr, tr_, lm_r, n_r = track_reference_kf(
                self.m, fr, jnp.asarray(self.ref_kf, jnp.int32),
                self.R_last, self.t_last, cfg)
            if int(n_r) > n_inl:
                out = out._replace(R=Rr, t=tr_, feat_lm=lm_r, n_inl=n_r)
                n_inl = int(n_r)
                ref_kf_new = self.ref_kf
                self.has_vel = False
                vel_new, rel = self._recompute_vel_rel(out)
                vel_finite = bool(jnp.isfinite(vel_new[1]).all())
        self.m = out.m
        if len(out_tuple) >= 8:
            # fused VI program extended the since-KF preintegration
            # in-program — adopt it before any dead-reckoning fallback
            self._pre_from_kf = out_tuple[7]
        if n_inl < cfg.min_track_points:
            self.state = "RECENTLY_LOST"
            self.has_vel = False
            self.frames_lost += 1
            if v_bias is not None:
                # IMU-initialized map: dead-reckon through the dropout
                # (_inertial_lost_fallback) instead of relocalizing
                # (reference Tracking.cc:1838-1851)
                return self.state, None
            if self._try_relocalize(fr):
                return self.state, (self.R_last, self.t_last)
            if self.frames_lost > 60:
                self.state = "LOST"
                # reference Tracking::Track LOST handling
                # (Tracking.cc:1861-1880): a young map is thrown away and
                # re-initialized; a mature one is kept in the Atlas and a
                # fresh map starts (CreateMapInAtlas, :2479) — place
                # recognition can merge them later
                if self._mapping_enabled:
                    if self.n_kf_host < 10:
                        self.reset_active_map()
                    else:
                        self.create_map_in_atlas()
            return self.state, None
        self.frames_lost = 0

        self.state = "OK"
        if vel_finite:
            self.vel = vel_new
            self.has_vel = True
        else:
            self.has_vel = False
        self.R_last, self.t_last = out.R, out.t
        if v_bias is not None:
            # the fused program already ran the pose-inertial refinement
            # (reference PoseInertialOptimizationLastKeyFrame,
            # Tracking.cc:2763-2785) — adopt its velocity/bias state
            self.v_cur, self.bias = v_bias
        elif (self.calib is not None and self.imu_ready
                and self._pre_from_kf is not None
                and self._anchor_kf is not None
                and not getattr(self, "_vi_suspended", False)):
            v0 = getattr(self, "_v_pred", None)
            if v0 is None:
                v0 = self.v_cur
            res, rel2 = pose_inertial_step(
                self.m, fr, out.feat_lm, out.R, out.t, v0, self.bias,
                jnp.asarray(self._anchor_kf, jnp.int32),
                self._pre_from_kf, jnp.asarray(ref_kf_new, jnp.int32),
                cfg)
            self.R_last, self.t_last = res.R_cw, res.t_cw
            self.v_cur = res.v
            self.bias = res.bias
            rel = rel2
            out = out._replace(R=res.R_cw, t=res.t_cw)
        self.last = fr
        self.last_feat_lm = out.feat_lm
        self.ref_kf = ref_kf_new
        self.frames_since_kf += 1
        self.trajectory.append((ts, self.map_gen, self.ref_kf, rel[0],
                                rel[1]))

        # keyframe decision (reference NeedNewKeyFrame, Tracking.cc:2840);
        # info_h is the frame's fetched decision vector — the fallback
        # paths above only changed n_inl, which is passed separately
        need = self._need_new_kf(n_inl, info_h, ts)
        if need and self._mapping_enabled:
            self._insert_keyframe(fr, out, ts, ref_inliers=n_inl,
                                  v_bias=v_bias)
        return self.state, (out.R, out.t)

    def _alloc_kf_slot(self):
        """Keyframe slot allocator: append below the high-water mark; once
        capacity is reached, recycle culled keyframes' slots (mirror of the
        landmark free-slot reuse in local_mapping — reference maps
        grow/cull indefinitely, so a fixed-capacity map must recycle).
        Returns None only when every slot is live."""
        cfg = self.cfg
        if self.n_kf_host < cfg.max_kf - 1:
            k = self.n_kf_host
            self.n_kf_host += 1
            return k
        if not self._free_kf_slots:
            # one (rare) device sync to learn which slots culling freed
            valid = np.asarray(self.m.kf_valid[:self.n_kf_host])
            protect = {0, self.ref_kf, self.last_kf_id}
            if self._anchor_kf is not None:
                protect.add(self._anchor_kf)
            self._free_kf_slots = [i for i in range(1, self.n_kf_host)
                                   if not valid[i] and i not in protect]
        if not self._free_kf_slots:
            return None
        k = self._free_kf_slots.pop(0)
        self._rebase_trajectory(k)
        if self.loop_closer is not None:
            # a recycled slot must not resurrect a historical loop edge or
            # a carried candidate Sim3 anchored on the culled keyframe
            self.loop_closer.past_loop_edges = [
                e for e in self.loop_closer.past_loop_edges if k not in e]
            if k in (self.loop_closer._pending_slot,
                     self.loop_closer._pending_cand):
                self.loop_closer._pending_sim3 = None
                self.loop_closer._pending_slot = -1
                self.loop_closer._pending_cand = -1
                self.loop_closer._pending_count = 0
        return k

    def _rebase_trajectory(self, slot: int):
        """Re-anchor trajectory entries referencing a recycled keyframe
        slot onto the newest keyframe, composing through the culled KF's
        final pose (the same pose resolve_ref_pose would have used).
        Keeps the reference's relative-pose trajectory scheme exact under
        slot recycling."""
        hits = [i for i, e in enumerate(self.trajectory)
                if e[1] == self.map_gen and e[2] == slot]
        if not hits:
            return
        anchor = self.last_kf_id
        Rs, ts_ = self.m.kf_R[slot], self.m.kf_t[slot]
        Rai, tai = lie.se3_inv(self.m.kf_R[anchor], self.m.kf_t[anchor])
        dR, dt = lie.se3_mul(Rs, ts_, Rai, tai)      # T_slot * T_anchor^-1
        for i in hits:
            t0, g0, _, R_cr, t_cr = self.trajectory[i]
            R2, t2 = lie.se3_mul(R_cr, t_cr, dR, dt)
            self.trajectory[i] = (t0, g0, anchor, R2, t2)

    def _insert_keyframe(self, fr: FrameData, out: TrackOutput, ts: float,
                         refresh_anchors: bool = True, ref_inliers=None,
                         v_bias=None):
        # host tracks slot allocation itself: no device sync needed on the
        # append path — the whole insert+mapping chain stays async
        k = self._alloc_kf_slot()
        if k is None:
            return None
        # the temporal predecessor is the previously newest KF (reference
        # mPrevKF); after an Atlas merge it is the pre-merge newest active
        # KF (the chain splices over the welded old-map block)
        prev_override = getattr(self, "_kf_prev_override", None)
        prev = prev_override if prev_override is not None \
            else self.last_kf_id
        self._kf_prev_override = None
        self.m, _ = insert_keyframe(self.m, fr, out.feat_lm, out.R, out.t,
                                    ts, slot=jnp.asarray(k, jnp.int32),
                                    prev_id=jnp.asarray(prev, jnp.int32))
        self.last_kf_id = k
        self.kf_seq += 1
        if ref_inliers is not None:
            # c2 baseline: the inserting frame's inlier count (host-known,
            # no device sync) — see kf_ref_ratio in TrackerConfig
            self._ref_matches = int(ref_inliers)
        self._record_kf_imu(k, ts, prev=prev, v_bias=v_bias)
        if self.cfg.baseline > 0:
            self.m = create_close_landmarks(
                self.m, jnp.asarray(k, jnp.int32), fr, self.cfg)
        bow = self._db_add(k, fr)
        with self.timers.stage("LMTotal") as st:
            if self.cfg.inertial and self.imu_ready and \
                    self.kf_imu is not None:
                # LocalInertialBA window (reference LocalMapping.cc:173);
                # inertial KF culling merges preintegration entries so the
                # chain stays exact
                self.m, self.kf_imu = local_mapping.mapping_step_inertial(
                    self.m, self.kf_imu, k, self.cam.params, self.cam.kind,
                    self.cfg.lm_cfg)
            else:
                self.m = local_mapping.mapping_step(
                    self.m, k, self.cam.params, self.cam.kind,
                    self.cfg.lm_cfg)
            st.set(self.m.kf_R)
        if self.loop_closer is not None and bow is not None:
            with self.timers.stage("LoopTotal"):
                if self.loop_closer.maybe_close(self, k, bow):
                    self.n_loops_closed += 1
                elif self.stash and self.loop_closer.maybe_merge(self, k,
                                                                 bow):
                    self.n_loops_closed += 1
        # advance any detached GBA by one slice per insert; reconcile the
        # live map when the last slice lands (reference detached-GBA thread
        # + RunGlobalBundleAdjustment correction pass)
        job = getattr(self, "_gba_job", None)
        if job is not None:
            with self.timers.stage("GBATotal"):
                done = job.advance()
                # progressive reconciliation: each slice's partial result
                # folds into the live map so interleaved local BAs always
                # see the best available global state
                self.m = job.reconcile(self.m)
                if done:
                    self._gba_job = None
        self.ref_kf = k
        self.frames_since_kf = 0
        if refresh_anchors:
            self.last_feat_lm = self.m.kf_feat_lm[k]
            # mapping may have moved the KF: refresh last pose for the
            # motion model
            self.R_last = self.m.kf_R[k]
            self.t_last = self.m.kf_t[k]
        else:
            # pipelined mode: the optimistic anchor is a NEWER frame — ride
            # the BA correction over to it by composing the keyframe's pose
            # delta (T_last' = T_last * T_kf_old^-1 * T_kf_new), keeping
            # the frame-to-KF relative pose invariant. Pure device math.
            Ri, ti = lie.se3_inv(out.R, out.t)
            dR, dt = lie.se3_mul(Ri, ti, self.m.kf_R[k], self.m.kf_t[k])
            self.R_last, self.t_last = lie.se3_mul(
                self.R_last, self.t_last, dR, dt)
            # the same delta belongs to every IN-FLIGHT frame's pending
            # decision (they all dispatched before this insertion)
            for entry in self._pending:
                if entry[2] is None:
                    entry[2] = (dR, dt)
                else:
                    entry[2] = lie.se3_mul(entry[2][0], entry[2][1],
                                           dR, dt)
        return k

    def _record_kf_imu(self, k: int, ts: float, prev: int = None,
                       v_bias=None):
        if self.calib is None:
            return
        from .. import imu as imu_mod
        from ..optim import inertial as inertial_mod
        if self.ts_first_kf is None:
            self.ts_first_kf = ts
        v_rec, b_rec = (self.v_cur, self.bias) if v_bias is None else v_bias
        # only samples newer than the previous keyframe belong to this
        # preintegration (matters for the two mono-init keyframes, whose
        # buffer reaches back to the very first frame). In the pipelined
        # loop the insert decision lags one frame, so the buffer may
        # already hold batches NEWER than the keyframe's timestamp — they
        # belong to the NEXT interval and to the restarted since-KF chain.
        prev_ts = getattr(self, "_last_kf_ts", -np.inf)
        buf = [(ft, a, g, d) for (ft, a, g, d) in self.imu_buf
               if prev_ts + 1e-9 < ft <= ts + 1e-9]
        leftover = [(ft, a, g, d) for (ft, a, g, d) in self.imu_buf
                    if ft > ts + 1e-9]
        self._last_kf_ts = ts
        if buf and k > 0:
            acc = np.concatenate([a for ft, a, g, d in buf])
            gyro = np.concatenate([g for ft, a, g, d in buf])
            dts = np.concatenate([d for ft, a, g, d in buf])
            n = len(dts)
            cap = self.IMU_BUF
            if n > cap:
                acc, gyro, dts = acc[-cap:], gyro[-cap:], dts[-cap:]
                n = cap
            pad = cap - n
            z = np.zeros((pad, 3), np.float32)
            pre = imu_mod.preintegrate(
                jnp.asarray(np.concatenate([acc, z])),
                jnp.asarray(np.concatenate([gyro, z])),
                jnp.asarray(np.concatenate([dts,
                                            np.zeros(pad, np.float32)])),
                jnp.arange(cap) < n, b_rec, self.calib)
            self.kf_imu = inertial_mod.set_kf_imu(
                self.kf_imu, k, pre, k - 1 if prev is None else prev)
            self.m = self.m._replace(
                kf_v=self.m.kf_v.at[k].set(v_rec),
                kf_bias=self.m.kf_bias.at[k].set(b_rec))
        elif self.kf_imu is not None:
            # no samples for this interval: a RECYCLED slot must not keep
            # the previous occupant's preintegration entry (it would form a
            # bogus inertial edge); still record velocity/bias state
            self.kf_imu = self.kf_imu._replace(
                valid=self.kf_imu.valid.at[k].set(False))
            self.m = self.m._replace(
                kf_v=self.m.kf_v.at[k].set(v_rec),
                kf_bias=self.m.kf_bias.at[k].set(b_rec))
        self.imu_buf = leftover
        # restart the per-frame since-KF preintegration at this keyframe,
        # then re-apply any batches newer than the KF so the chain spans
        # keyframe -> latest dispatched frame
        self._reset_pre_from_kf(k)
        for (ft, a, g, d) in leftover:
            n = len(d)
            cap = 64
            if n > cap:
                a, g, d = a[-cap:], g[-cap:], d[-cap:]
                n = cap
            pad = cap - n
            z = np.zeros((pad, 3), np.float32)
            self._pre_from_kf = continue_preintegration(
                self._pre_from_kf, jnp.asarray(np.concatenate([a, z])),
                jnp.asarray(np.concatenate([g, z])),
                jnp.asarray(np.concatenate([d, np.zeros(pad, np.float32)])),
                jnp.arange(cap) < n, self.calib)
        self._vi_suspended = False

    def _db_add(self, kf_id: int, fr: FrameData):
        if self.db is None:
            return None
        from ..vocab import database as kfdb, tree as voctree
        bow = voctree.bow_vector(
            self.voc, voctree.transform(self.voc, fr.desc, fr.valid))
        self.db = kfdb.add_keyframe(self.db, kf_id, bow)
        return bow

    def _recover_lost(self, fr: FrameData):
        """Recovery with no tracking context (`last is None`): BoW
        relocalization when a vocabulary exists, then the vocabulary-less
        fallback — brute-force descriptor match against the reference
        keyframe (reference re-enters via TrackReferenceKeyFrame,
        Tracking.cc:2535, before declaring the frame lost). Failing both,
        the LOST protocol (Tracking.cc:1861-1880) resets a young map or
        stashes a mature one in the Atlas."""
        if self._try_relocalize(fr):
            return True
        if self.n_kf_host > 0:
            # anchor candidates: the reference KF first, then the most
            # recent (by timestamp — slots recycle) valid keyframes — the
            # reference KF itself may be the corrupted frame that caused
            # the loss
            valid = np.asarray(self.m.kf_valid[:self.n_kf_host])
            kts = np.asarray(self.m.kf_ts[:self.n_kf_host])
            order = sorted((k for k in range(self.n_kf_host)
                            if valid[k] and k != self.ref_kf),
                           key=lambda k: -kts[k])
            cands = [self.ref_kf] + order[:3]
            # with live IMU dead-reckoning, the predicted pose (set by
            # _inertial_lost_fallback) is a far better pose-opt seed than
            # the candidate keyframe's own pose
            imu_seed = (self.calib is not None and self.imu_ready
                        and not getattr(self, "_vi_suspended", False)
                        and self._pre_from_kf is not None)
            for k in cands[:4]:
                if imu_seed:
                    R0, t0 = self.R_last, self.t_last
                else:
                    R0 = self.m.kf_R[k]
                    t0 = self.m.kf_t[k]
                R, t, lm, n = track_reference_kf(
                    self.m, fr, jnp.asarray(k, jnp.int32), R0, t0,
                    self.cfg)
                if int(n) >= max(15, self.cfg.min_track_points):
                    self.R_last, self.t_last = R, t
                    self.last = fr
                    self.last_feat_lm = lm
                    self.ref_kf = k
                    self.has_vel = False
                    self.state = "OK"
                    self.frames_lost = 0
                    self._ref_matches = int(n)
                    self.frames_since_kf = self.cfg.min_kf_interval
                    if self.calib is not None:
                        # suspend the inertial chain: the since-KF
                        # preintegration accumulated across the lost gap no
                        # longer relates the anchor keyframe's state to the
                        # recovered pose — the fused VI program and the IMU
                        # prediction stay off until the next keyframe
                        # re-roots the chain (_record_kf_imu clears this)
                        self._vi_suspended = True
                        self.has_vel = False
                    return True
        self.state = "RECENTLY_LOST"
        self.frames_lost += 1
        if self.frames_lost > 60:
            self.state = "LOST"
            if self._mapping_enabled:
                if self.n_kf_host < 10:
                    self.reset_active_map()
                else:
                    self.create_map_in_atlas()
        return False

    def _try_relocalize(self, fr: FrameData):
        """BoW candidates + PnP RANSAC (reference Relocalization)."""
        if self.db is None:
            return False
        from ..vocab import database as kfdb, tree as voctree
        bow = voctree.bow_vector(
            self.voc, voctree.transform(self.voc, fr.desc, fr.valid))
        ids, scores, ok = kfdb.top_candidates(self.db, bow, 3)
        best = None
        for c in range(3):
            if not bool(ok[c]):
                continue
            self.key, k = jax.random.split(self.key)
            R, t, feat_lm, n_inl = relocalize_candidate(
                self.m, fr, ids[c], k, self.cfg, self.cam.params,
                self.cam.kind)
            if best is None or int(n_inl) > best[3]:
                best = (R, t, feat_lm, int(n_inl), int(ids[c]))
        if best is None or best[3] < 30:
            return False
        R, t, feat_lm, n_inl, ref = best
        self.R_last, self.t_last = R, t
        self.last = fr
        self.last_feat_lm = feat_lm
        self.ref_kf = ref
        self.has_vel = False
        self.state = "OK"
        self.frames_lost = 0
        # re-arm the keyframe trigger: insertion should be possible
        # immediately (a freshly restored session otherwise never inserts
        # KFs until max_kf_interval elapses)
        self._ref_matches = n_inl
        self.frames_since_kf = self.cfg.min_kf_interval
        if self.calib is not None:
            # see _recover_lost: the cross-gap preintegration no longer
            # bounds the relocalized pose — suspend VI until the next KF
            self._vi_suspended = True
            self.has_vel = False
        return True

    # -- multi-map Atlas (reference Atlas + Tracking::CreateMapInAtlas) ----

    def _fresh_map_state(self):
        cfg = self.cfg
        self._gba_job = None          # any detached GBA is now meaningless
        self.m = ms.empty_map(cfg.max_kf, cfg.n_feat, cfg.max_lm)
        if self.voc is not None:
            from ..vocab import database as kfdb
            self.db = kfdb.empty(cfg.max_kf, self.voc.n_words)
        if self.calib is not None:
            from ..optim import inertial as inertial_mod
            self.kf_imu = inertial_mod.empty_kf_imu(cfg.max_kf)
            self.imu_ready = False
            self.viba_stage = 0
            self.ts_first_kf = None
            self.v_cur = jnp.zeros(3)
            self._pre_from_kf = None
            self._anchor_kf = None
            self._vi_suspended = False
            self._ts_lost_start = None
        self.state = "NOT_INITIALIZED"
        self.fr_init = None
        self.last = None
        self.last_feat_lm = None
        self.R_last = jnp.eye(3)
        self.t_last = jnp.zeros(3)
        self.has_vel = False
        self.ref_kf = 0
        self.n_kf_host = 0
        self.last_kf_id = -1
        self._free_kf_slots = []
        self._ref_matches = 0
        self.frames_since_kf = 0
        self.frames_lost = 0
        self._pending = []

    def reset_active_map(self):
        """Throw away the active map and re-initialize (reference
        Tracking::ResetActiveMap / System::ResetActiveMap): used when
        tracking is lost in a map too young to be worth keeping."""
        self.trajectory = [e for e in self.trajectory
                           if e[1] != self.map_gen]
        self._fresh_map_state()

    def create_map_in_atlas(self):
        """Stash the active map and start a fresh one (reference
        Tracking::CreateMapInAtlas, Tracking.cc:2479). The stashed map's
        place-recognition database rides along so LoopCloser.maybe_merge
        can weld it back when the new map revisits known ground."""
        from ..mapstate import atlas as atlas_mod
        self.stash.append(atlas_mod.StashedMap(
            gen=self.map_gen, m=self.m, db=self.db, n_kf=self.n_kf_host,
            kf_imu=self.kf_imu))
        self.map_gen += 1
        self._fresh_map_state()

    def resolve_ref_pose(self, gen, ref):
        """World->camera pose of keyframe `ref` of map generation `gen`,
        following merge offsets into the current map. Returns None when the
        generation no longer exists. An unmerged stashed map resolves in its
        own (disconnected) world gauge, like the reference's per-map
        trajectories."""
        g, r = gen, ref
        while g != self.map_gen:
            st = next((s for s in self.stash if s.gen == g), None)
            if st is None:
                return None
            if st.merged_into_gen < 0:
                if r >= st.m.kf_valid.shape[0]:
                    return None
                # culled KFs keep their last optimized pose in the arrays —
                # still the right anchor for relative frame poses
                return st.m.kf_R[r], st.m.kf_t[r]
            r = r + st.kf_offset
            g = st.merged_into_gen
        if r >= self.m.kf_valid.shape[0]:
            return None
        return self.m.kf_R[r], self.m.kf_t[r]

    # -- output -----------------------------------------------------------

    def trajectory_world(self):
        """(N, 3) camera centers in world frame, chaining relative poses
        through (possibly BA-updated) keyframe poses — the reference's
        SaveTrajectoryTUM scheme (System.cc:531)."""
        self.flush()
        out = []
        for ts, gen, ref, R_cr, t_cr in self.trajectory:
            resolved = self.resolve_ref_pose(gen, ref)
            if resolved is None:
                continue
            Rr, tr = resolved
            R_cw, t_cw = lie.se3_mul(R_cr, t_cr, Rr, tr)
            Rwc, twc = lie.se3_inv(R_cw, t_cw)
            out.append((ts, np.asarray(twc)))
        return out
