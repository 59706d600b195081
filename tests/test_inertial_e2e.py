"""Monocular-inertial end-to-end: the IMU initialization must recover METRIC
scale for a monocular map (the flagship visual-inertial capability)."""
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import alignment, cameras, imu
from morb_slam_tpu.pipeline import tracking

from synthetic_world import (PlaneWorld, analytic_pose, imu_between)

W, H, FX = 384, 288, 300.0
FPS = 20.0


@pytest.fixture(scope="module")
def run_mono_inertial():
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    tr = tracking.Tracker(cam, cfg, imu_calib=calib)
    n_frames = 90
    states = []
    rng = np.random.default_rng(0)
    prev_t = -0.05
    gt = []
    for i in range(n_frames):
        t = i * 0.05
        R, tc = analytic_pose(t)
        gt.append((R, tc))
        img = world.render(R.astype(np.float32), tc.astype(np.float32))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng,
                                     noise_g=1.7e-4 * 14.1,
                                     noise_a=2e-3 * 14.1)
        state, pose = tr.track_mono_inertial(
            jnp.asarray(img, jnp.float32), t, acc, gyr, ts_i)
        states.append(state)
        prev_t = t
    return tr, states, gt


def test_tracks(run_mono_inertial):
    tr, states, gt = run_mono_inertial
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.75 * len(states), states


def test_imu_initializes(run_mono_inertial):
    tr, states, gt = run_mono_inertial
    assert tr.imu_ready, "IMU init never fired"
    assert tr.viba_stage >= 1


def test_trajectory_consistent_after_gauge(run_mono_inertial):
    """The gauge application must keep the map/trajectory internally
    consistent (finite, small Sim3-aligned ATE). Exact metric-scale
    accuracy from the inertial-only init is NOT yet asserted: on this
    low-excitation synthetic the scale direction is weakly observable and
    the estimate is unreliable without the full visual-inertial BA that
    re-anchors poses (reference FullInertialBA — round-2 work; the
    estimator itself recovers scale to 2% on accurate poses, see
    test_inertial.py; mono currently applies gravity rotation only)."""
    tr, states, gt = run_mono_inertial
    traj = tr.trajectory_world()
    est, gtp = [], []
    for ts, p in traj:
        i = int(round(ts / 0.05))
        R, t = gt[i]
        gtp.append(-(R.T @ t))
        est.append(p)
    est = jnp.asarray(np.asarray(est), jnp.float32)
    gtp = jnp.asarray(np.asarray(gtp), jnp.float32)
    assert bool(jnp.isfinite(est).all()), "NaN in trajectory after gauge"
    rmse, s, _, _ = alignment.ate_rmse(est, gtp, with_scale=True)
    extent = float(jnp.linalg.norm(gtp[-1] - gtp[0]))
    assert float(rmse) < 0.04 * extent, (float(rmse), extent)


def test_stereo_inertial_full_pipeline():
    """Stereo-inertial: metric map from frame one, IMU init estimates
    biases/velocities/gravity at fixed scale, dead-reckoning prediction
    active after init."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    from synthetic_world import PlaneWorld
    world = PlaneWorld(K, W, H, seed=0)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    b = 0.12
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=96, max_lm=8000, n_levels=4,
                                 baseline=b, min_stereo_init_feats=200)
    tr = tracking.Tracker(cam, cfg, imu_calib=calib)
    rng = np.random.default_rng(1)
    prev_t = -0.05
    gt = []
    states = []
    for i in range(90):
        t = i * 0.05
        R, tc = analytic_pose(t)
        gt.append((R, tc))
        img_l = world.render(R.astype(np.float32), tc.astype(np.float32))
        img_r = world.render(R.astype(np.float32),
                             (tc - np.asarray([b, 0, 0])).astype(np.float32))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng,
                                     noise_g=2.4e-3, noise_a=2.8e-2)
        state, pose = tr.track_stereo_inertial(
            jnp.asarray(img_l, jnp.float32), jnp.asarray(img_r, jnp.float32),
            t, acc, gyr, ts_i)
        states.append(state)
        prev_t = t
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.85 * len(states), states
    assert tr.imu_ready
    traj = tr.trajectory_world()
    est, gtp = [], []
    for ts, p in traj:
        i = int(round(ts / 0.05))
        R, t = gt[i]
        gtp.append(-(R.T @ t))
        est.append(p)
    est = jnp.asarray(np.asarray(est), jnp.float32)
    gtp = jnp.asarray(np.asarray(gtp), jnp.float32)
    rmse, s, _, _ = alignment.ate_rmse(est, gtp, with_scale=True)
    assert abs(float(s) - 1.0) < 0.06, float(s)   # metric scale held
    rmse_se3, _, _, _ = alignment.ate_rmse(est, gtp, with_scale=False)
    extent = float(jnp.linalg.norm(gtp[-1] - gtp[0]))
    assert float(rmse_se3) < 0.04 * extent, (float(rmse_se3), extent)


def test_stereo_inertial_ring_circuit_gauge():
    """Flagship stereo-inertial e2e on a full ring circuit (covisibility
    genuinely breaks — see RingWorld): the map must survive the whole
    orbit with the IMU initialized, finite velocities/biases, and the
    gravity gauge preserved — pitch/roll of every keyframe's map-world vs
    the true gravity frame < 0.01 rad (the reference's inertial loop
    gating bound, LoopClosing.cc:227-255). With the inertial stack the
    drift stays small enough that the revisit re-binds the original
    landmarks directly; on the closing arc the estimate must coincide
    with the first pass (circuit gap), whether or not an explicit BoW
    loop fires."""
    from functools import partial

    from synthetic_world import RingWorld, ring_path, ring_pose, imu_between
    from morb_slam_tpu import frontend
    from morb_slam_tpu.vocab import tree

    world = RingWorld(np.array([[FX, 0, W / 2], [0, FX, H / 2],
                                [0, 0, 1.0]]), W, H, seed=0)
    N, CIRC = 300, 1.3
    poses = ring_path(N, circuits=CIRC)
    pose_fn = partial(ring_pose, circuits=CIRC, n_frames=N)
    b = 0.1
    ocfg = frontend.OrbConfig(n_features=500, n_levels=4)
    descs = []
    for R, t in poses[::25]:
        f = frontend.extract_orb(
            jnp.asarray(world.render(R, t), jnp.float32), ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=8, depth=3, iters=4)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=128, max_lm=16000, n_levels=4,
                                 baseline=b, th_depth=60.0,
                                 min_stereo_init_feats=150,
                                 vel_rot_damp=0.9)
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    tr = tracking.Tracker(cam, cfg, voc=voc, imu_calib=calib)
    tr.pipelined = False
    rng = np.random.default_rng(2)
    prev_t = -0.05
    states = []
    for i, (R, t) in enumerate(poses):
        Rw = np.asarray(R)
        c = -Rw.T @ np.asarray(t)
        t_r = -Rw @ (c + Rw.T @ np.array([b, 0, 0], np.float32))
        ts_i, acc, gyr = imu_between(prev_t, i * 0.05, rng=rng,
                                     noise_g=2.4e-3, noise_a=2.8e-2,
                                     pose_fn=pose_fn)
        st, _ = tr.track_stereo_inertial(
            world.render(Rw, np.asarray(t)),
            world.render(Rw, t_r.astype(np.float32)),
            i * 0.05, acc, gyr, ts_i)
        states.append(st)
        prev_t = i * 0.05
    tr.flush()
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.9 * len(states), (ok, states[-20:])
    assert tr.imu_ready
    m = tr.m
    assert bool(jnp.isfinite(m.kf_v).all())
    assert bool(jnp.isfinite(m.kf_bias).all())
    # gravity gauge: map world vs true world differs by yaw-about-gravity
    # only; pitch/roll tilt < 0.01 rad for every keyframe
    kts = np.asarray(m.kf_ts)
    tilts = []
    for k in range(int(m.n_kf)):
        if not bool(m.kf_valid[k]):
            continue
        R_true, _ = pose_fn(float(kts[k]))
        A = np.asarray(R_true).T @ np.asarray(m.kf_R[k])
        v = A.T @ np.array([0, 0, 1.0])
        tilts.append(np.arccos(np.clip(v[2], -1, 1)))
    assert np.max(tilts) < 0.01, np.degrees(np.max(tilts))
    # closing arc coincides with the first pass (metric map): keyframes
    # one circuit apart sit at the same true position
    period_s = N / CIRC * 0.05
    C = {k: -np.asarray(m.kf_R[k]).T @ np.asarray(m.kf_t[k])
         for k in range(int(m.n_kf)) if bool(m.kf_valid[k])}
    gaps = [np.linalg.norm(C[a] - C[bk]) for a in C for bk in C
            if abs((kts[a] - kts[bk]) - period_s) < 0.15]
    assert gaps and float(np.mean(gaps)) < 0.2, (np.mean(gaps), len(gaps))
