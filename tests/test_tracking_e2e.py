"""End-to-end monocular SLAM test on the synthetic rendered world:
initialization, continuous tracking, keyframe mapping, and final ATE
against exact ground truth (scale-aligned — monocular gauge)."""
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import alignment, cameras
from morb_slam_tpu.pipeline import tracking

from synthetic_world import PlaneWorld, camera_path

W, H = 384, 288
FX = 300.0
CAM = cameras.pinhole(FX, FX, W / 2, H / 2)
K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])


@pytest.fixture(scope="module")
def run_sequence():
    world = PlaneWorld(K, W, H, seed=0)
    poses = camera_path(60, step=0.05)
    cfg = tracking.TrackerConfig(
        width=W, height=H, focal=FX, n_feat=500, max_kf=32, max_lm=6000,
        n_levels=4, min_init_matches=60, min_init_points=40)
    tracker = tracking.Tracker(CAM, cfg)
    states = []
    est_poses = {}
    for i, (R, t) in enumerate(poses):
        img = world.render(R, t)
        state, pose = tracker.track_mono(img, ts=float(i))
        states.append(state)
        if pose is not None:
            est_poses[i] = pose
    return tracker, states, est_poses, poses


def test_initializes(run_sequence):
    tracker, states, est, gt = run_sequence
    assert "OK" in states, states[:20]
    first_ok = states.index("OK")
    assert first_ok < 30, first_ok


def test_tracks_majority(run_sequence):
    tracker, states, est, gt = run_sequence
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.7 * len(states), (ok, len(states), states)


def test_map_grows(run_sequence):
    tracker, states, est, gt = run_sequence
    assert int(tracker.m.n_kf) >= 3
    assert int(jnp.sum(tracker.m.lm_valid)) > 200


def test_kf_rate_bounded(run_sequence):
    """Regression guard for the round-3 NeedNewKeyFrame miscalibration:
    on a smooth, fully-visible synthetic path the trigger must fire well
    below the max rate (one KF per min_kf_interval would be 20 KFs for
    this 60-frame path; the reference inserts only when tracked inliers
    genuinely decay vs the reference KF, Tracking.cc:2840-2994)."""
    tracker, states, est, gt = run_sequence
    frames = len(states)
    max_rate = frames // tracker.cfg.min_kf_interval
    assert tracker.n_kf_host < 0.5 * max_rate, \
        (tracker.n_kf_host, frames, max_rate)


def test_ate_small(run_sequence):
    tracker, states, est, gt = run_sequence
    traj = tracker.trajectory_world()
    assert len(traj) > 30
    # associate by timestamp
    est_pos = []
    gt_pos = []
    for ts, p in traj:
        i = int(round(ts))
        R, t = gt[i]
        gt_pos.append(-(R.T @ t))
        est_pos.append(p)
    est_pos = jnp.asarray(np.asarray(est_pos), jnp.float32)
    gt_pos = jnp.asarray(np.asarray(gt_pos), jnp.float32)
    rmse, s, _, _ = alignment.ate_rmse(est_pos, gt_pos, with_scale=True)
    extent = float(jnp.linalg.norm(gt_pos[-1] - gt_pos[0]))
    # trajectory ~3 m; demand ATE under 2.3% of extent. The pipelined
    # frame loop (deferred decisions; ~2.5x throughput on a remote chip)
    # costs ~0.7% vs the synchronous loop's ~1.2% — each frame tracks
    # against a one-keyframe-stale map snapshot, like the reference's
    # tracking-vs-mapping thread race.
    assert float(rmse) < 0.023 * extent, (float(rmse), extent)
