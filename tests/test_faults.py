"""Fault-injection tests (SURVEY §5 failure detection/recovery): dropped
frames, timestamp jumps, corrupted frames, and unusable IMU must each
recover to OK tracking or a fresh Atlas map — never crash, never silently
corrupt the trajectory. Mirrors the reference failure paths: RECENTLY_LOST/
LOST recovery (Tracking.cc:1819-1880), timestamp-jump map spawn
(Tracking.cc:1713-1722), bad-IMU forced reset (LocalMapping.cc:159-167)."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import cameras, imu
from morb_slam_tpu.pipeline import tracking

from synthetic_world import PlaneWorld, analytic_pose, camera_path, \
    imu_between

W, H, FX = 384, 288, 300.0


def _mono_tracker(**kw):
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40,
                                 **kw)
    return world, tracking.Tracker(cam, cfg, **{})


def test_timestamp_jump_starts_fresh_map():
    """A large timestamp gap must spawn a fresh Atlas map (mature map) or
    reset (young map) instead of dead-reckoning across the hole."""
    world, tr = _mono_tracker()
    seq = camera_path(40, step=0.05)
    gen0 = tr.map_gen
    for i, (R, t) in enumerate(seq):
        ts = float(i)
        if i >= 25:
            ts = float(i) + 100.0      # 100-frame hole in the timeline
        img = world.render(R, t)
        tr.track_mono(jnp.asarray(img, jnp.float32), ts=ts)
    # either a new map generation (mature) or a reset (young) happened
    assert tr.map_gen > gen0 or tr.n_kf_host < 10
    # and the session kept going without crashing: it re-initialized
    assert tr.state in ("OK", "NOT_INITIALIZED", "RECENTLY_LOST")


def test_corrupt_frames_recover():
    """A burst of pure-noise frames (sensor glitch) must drive the state
    machine to RECENTLY_LOST and recover OK afterwards."""
    world, tr = _mono_tracker()
    rng = np.random.default_rng(3)
    seq = camera_path(45, step=0.05)
    states = []
    for i, (R, t) in enumerate(seq):
        if 25 <= i < 28:
            img = rng.uniform(0, 255, (H, W)).astype(np.float32)
        else:
            img = world.render(R, t)
        state, _ = tr.track_mono(jnp.asarray(img, jnp.float32),
                                 ts=float(i) * 0.05)
        states.append(state)
    assert "RECENTLY_LOST" in states[25:31], states[20:35]
    assert states[-1] == "OK" or "OK" in states[-5:], states[-8:]


def test_dropped_frames_recover():
    """Dropping a chunk of frames (pose discontinuity within the timestamp
    budget) must recover through relocalization or re-initialization."""
    world, tr = _mono_tracker(ts_jump=10.0)   # keep timestamps acceptable
    seq = camera_path(50, step=0.05)
    states = []
    for i, (R, t) in enumerate(seq):
        if 25 <= i < 35:
            continue                    # frames lost in transmission
        img = world.render(R, t)
        state, _ = tr.track_mono(jnp.asarray(img, jnp.float32),
                                 ts=float(i) * 0.05)
        states.append(state)
    ok_tail = sum(1 for s in states[-8:] if s == "OK")
    assert ok_tail >= 4, states[-10:]


def test_bad_imu_forced_reset():
    """Garbage IMU (init can never succeed) must trigger the bad-IMU
    forced reset instead of poisoning the map forever."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40,
                                 bad_imu_timeout=1.5)
    tr = tracking.Tracker(cam, cfg, imu_calib=calib)
    rng = np.random.default_rng(5)
    prev_t = -0.05
    for i in range(60):
        t = i * 0.05
        R, tc = analytic_pose(t)
        img = world.render(R.astype(np.float32), tc.astype(np.float32))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng)
        acc = rng.uniform(-60, 60, acc.shape)    # garbage accelerometer
        gyr = rng.uniform(-8, 8, gyr.shape)
        tr.track_mono_inertial(jnp.asarray(img, jnp.float32), t, acc, gyr,
                               ts_i)
        prev_t = t
        if getattr(tr, "bad_imu", False):
            break
    assert getattr(tr, "bad_imu", False), "bad-IMU reset never fired"
    assert not tr.imu_ready


def test_imu_dead_reckoning_through_dropout():
    """IMU dead-reckoning through RECENTLY_LOST (reference Tracking.cc:
    1838-1851): after IMU init, 0.5 s of black frames must NOT lose the
    map — the pose dead-reckons from the preintegration chain, trajectory
    entries keep flowing, and tracking re-acquires when imagery returns."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
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
    black = np.zeros((H, W), np.float32)
    states = []
    dropout = range(42, 52)          # 0.5 s of visual dropout
    for i in range(75):
        t = i * 0.05
        R, tc = analytic_pose(t)
        if i in dropout:
            il = ir = black
        else:
            il = world.render(R.astype(np.float32), tc.astype(np.float32))
            ir = world.render(R.astype(np.float32),
                              (tc - np.asarray([b, 0, 0])).astype(
                                  np.float32))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng, noise_g=2.4e-3,
                                     noise_a=2.8e-2)
        st, pose = tr.track_stereo_inertial(il, ir, t, acc, gyr, ts_i)
        states.append(st)
        if i == min(dropout) - 1:
            assert tr.imu_ready, "IMU must be initialized before dropout"
        prev_t = t
    assert "LOST" not in states, states
    # dead-reckoning kept producing poses during the dropout
    assert all(states[i] in ("OK", "RECENTLY_LOST") for i in dropout)
    # re-acquired after imagery returned
    assert states[-1] == "OK", states[-10:]
    tr.flush()
    assert len(tr.trajectory) >= 70


def test_keyframe_slot_recycling():
    """Keyframe capacity must RECYCLE culled slots (reference maps
    grow/cull indefinitely; an append-only allocator silently stops
    mapping at max_kf). A camera oscillating over the same ground keeps
    triggering inserts via the max-interval condition while culling marks
    most of them redundant — insertion must continue far past max_kf
    total inserts, and the trajectory must stay finite."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    max_kf = 12
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=max_kf, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40,
                                 max_kf_interval=6)
    tr = tracking.Tracker(cam, cfg)
    from morb_slam_tpu import lie
    states = []
    for i in range(170):
        # oscillate over mapped ground (parallax-rich but redundant)
        x = 0.55 + 0.55 * np.sin(i * 0.09)
        center = np.array([x, 0.0, 0.0], np.float32)
        yaw = 0.05 * np.sin(i * 0.05)
        R_wc = np.asarray(lie.so3_exp(jnp.asarray([0.0, yaw, 0.0],
                                                  jnp.float32)))
        R_cw = R_wc.T.astype(np.float32)
        t_cw = (-R_cw @ center).astype(np.float32)
        st, _ = tr.track_mono(world.render(R_cw, t_cw), ts=float(i))
        states.append(st)
    tr.flush()
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.8 * len(states), (ok, len(states))
    # total inserts far beyond capacity => slots were recycled
    assert tr.kf_seq > max_kf + 3, (tr.kf_seq, max_kf)
    assert tr.n_kf_host <= max_kf
    traj = tr.trajectory_world()
    pts = np.asarray([p for _, p in traj])
    assert np.isfinite(pts).all()


def test_keyframe_slot_recycling_inertial():
    """Slot recycling on an IMU-INITIALIZED map: the inertial BA windows
    must follow the preintegration chain (ki.prev), not slot arithmetic —
    a recycled low slot id inserted after high slots would otherwise wrap
    the window over arbitrary non-temporal keyframes and corrupt the
    inertial edges (reference LocalInertialBA builds its window via mPrevKF
    chaining, Optimizer.cc:2324)."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    b = 0.12
    max_kf = 14
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=max_kf, max_lm=8000, n_levels=4,
                                 baseline=b, min_stereo_init_feats=200,
                                 max_kf_interval=6)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    tr = tracking.Tracker(cam, cfg, imu_calib=calib)

    def pose_fn(t):
        # oscillates over the same ground (keyframes become redundant ->
        # culled -> slots recycle) with ~1 m/s^2 accelerations so the
        # staged IMU init's excitation gates pass
        center = np.array([0.5 + 0.5 * np.sin(1.2 * t),
                           0.15 * np.sin(1.9 * t),
                           0.08 * np.sin(2.4 * t)])
        from scipy.spatial.transform import Rotation as _Rot
        R_wc = _Rot.from_rotvec([0.0, 0.05 * np.sin(0.5 * t), 0.0]
                                ).as_matrix()
        R_cw = R_wc.T
        return R_cw, -R_cw @ center

    rng = np.random.default_rng(3)
    prev_t = -0.05
    states = []
    gt = []
    for i in range(200):
        t = i * 0.05
        R, tc = pose_fn(t)
        gt.append(-(R.T @ tc))
        il = world.render(R.astype(np.float32), tc.astype(np.float32))
        ir = world.render(R.astype(np.float32),
                          (tc - np.asarray([b, 0, 0])).astype(np.float32))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng, noise_g=2.4e-3,
                                     noise_a=2.8e-2, pose_fn=pose_fn)
        st, _ = tr.track_stereo_inertial(il, ir, t, acc, gyr, ts_i)
        states.append(st)
        prev_t = t
    tr.flush()
    assert tr.imu_ready, "IMU must initialize in this sequence"
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.8 * len(states), (ok, len(states))
    # inserts beyond capacity => recycled slots passed through the
    # inertial mapping path
    assert tr.kf_seq > max_kf + 2, (tr.kf_seq, max_kf)
    assert tr.n_kf_host <= max_kf
    traj = tr.trajectory_world()
    est = np.asarray([p for _, p in traj])
    assert np.isfinite(est).all()
    gtp = np.asarray([gt[int(round(ts / 0.05))] for ts, _ in traj])
    from morb_slam_tpu import alignment
    rmse, _, _, _ = alignment.ate_rmse(
        jnp.asarray(est, jnp.float32), jnp.asarray(gtp, jnp.float32),
        with_scale=False)
    assert float(rmse) < 0.08, float(rmse)
    # the preintegration chain stays intact: every valid interval's prev
    # points at a live keyframe
    ki = tr.kf_imu
    valid = np.asarray(ki.valid)
    prev = np.asarray(ki.prev)
    kf_valid = np.asarray(tr.m.kf_valid)
    for k in np.nonzero(valid)[0]:
        assert prev[k] >= 0 and kf_valid[prev[k]], (k, prev[k])
