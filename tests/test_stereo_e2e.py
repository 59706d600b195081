"""End-to-end stereo SLAM: immediate metric-scale initialization and
tracking; ATE evaluated WITHOUT scale alignment (stereo fixes the gauge)."""
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import alignment, cameras
from morb_slam_tpu.pipeline import tracking

from synthetic_world import PlaneWorld, camera_path

W, H, FX = 384, 288, 300.0
BASELINE = 0.12


@pytest.fixture(scope="module")
def run_stereo():
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    poses = camera_path(40, step=0.05)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=48, max_lm=8000, n_levels=4,
                                 baseline=BASELINE,
                                 min_stereo_init_feats=200)
    tr = tracking.Tracker(cam, cfg)
    states = []
    for i, (R, t) in enumerate(poses):
        img_l = world.render(R, t)
        img_r = world.render(R, t - np.asarray([BASELINE, 0, 0],
                                               np.float32))
        state, pose = tr.track_stereo(img_l, img_r, ts=float(i))
        states.append(state)
    return tr, states, poses


def test_initializes_first_frame(run_stereo):
    tr, states, poses = run_stereo
    assert states[0] == "OK", states[:3]


def test_tracks_all(run_stereo):
    tr, states, poses = run_stereo
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.9 * len(states), (ok, states)


def test_metric_scale(run_stereo):
    """Stereo must recover TRUE metric scale (no gauge alignment)."""
    tr, states, poses = run_stereo
    traj = tr.trajectory_world()
    est, gt = [], []
    for ts, p in traj:
        i = int(round(ts))
        R, t = poses[i]
        gt.append(-(R.T @ t))
        est.append(p)
    est = jnp.asarray(np.asarray(est), jnp.float32)
    gt = jnp.asarray(np.asarray(gt), jnp.float32)
    rmse, s, _, _ = alignment.ate_rmse(est, gt, with_scale=True)
    # the gauge scale recovered by alignment must be ~1 (metric)
    assert abs(float(s) - 1.0) < 0.05, float(s)
    rmse_se3, _, _, _ = alignment.ate_rmse(est, gt, with_scale=False)
    extent = float(jnp.linalg.norm(gt[-1] - gt[0]))
    assert float(rmse_se3) < 0.03 * extent, (float(rmse_se3), extent)
