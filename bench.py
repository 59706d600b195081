"""Benchmark: tracked frames/s of the full SLAM pipeline on the real device
(extraction + matching + pose optimization + keyframe mapping), plus
secondary metrics the BASELINE names: stereo-inertial ATE on a synthetic
EuRoC-like sequence, BA iterations/s, and per-stage device milliseconds.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline", "detail"}.
Baseline: the reference (MORB_SLAM/ORB-SLAM3) sustains real-time 20 fps on
EuRoC-class input on an i7 CPU (BASELINE.md); vs_baseline = fps / 20.

The primary run is an EuRoC-geometry synthetic sequence (752x480, fx=460,
1200 ORB features, 8 pyramid levels, uint8 frames) through the monocular
pipeline; timing covers the steady-state tracking loop after jit warmup.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

import numpy as np


def mono_run():
    import jax
    import jax.numpy as jnp
    from morb_slam_tpu import alignment, cameras
    from morb_slam_tpu.pipeline import tracking
    from synthetic_world import PlaneWorld, camera_path

    W, H, FX = 752, 480, 460.0
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    n_frames = 80
    poses = camera_path(n_frames, step=0.05)
    # uint8 frames: 4x cheaper host->device transfer, cast on device
    frames = [np.clip(world.render(R, t), 0, 255).astype(np.uint8)
              for R, t in poses]

    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                                 max_kf=256, max_lm=16384, n_levels=8,
                                 min_init_matches=80, min_init_points=50)
    tracker = tracking.Tracker(cam, cfg)

    # per-stage breakdown of the frame budget (reference REGISTER_TIMES
    # taxonomy, SURVEY §5): dispatch vs decision-fetch wait vs KF insert
    stage = {"decide": 0.0, "insert": 0.0, "n_insert": 0}
    orig_decide = tracker._decide_pending
    orig_insert = tracker._insert_keyframe

    def timed_decide(*a, **kw):
        t0 = time.perf_counter()
        r = orig_decide(*a, **kw)
        stage["decide"] += time.perf_counter() - t0
        return r

    def timed_insert(*a, **kw):
        t0 = time.perf_counter()
        r = orig_insert(*a, **kw)
        stage["insert"] += time.perf_counter() - t0
        stage["n_insert"] += 1
        return r

    tracker._decide_pending = timed_decide
    tracker._insert_keyframe = timed_insert

    warmup = 20
    t_start = None
    n_timed = 0
    frame_ms = []
    for i, img in enumerate(frames):
        if i == warmup:
            t_start = time.perf_counter()
            stage.update(decide=0.0, insert=0.0, n_insert=0)
        t0 = time.perf_counter()
        state, pose = tracker.track_mono(img, ts=float(i))
        if i >= warmup:
            n_timed += 1
            frame_ms.append((time.perf_counter() - t0) * 1e3)
    tracker.flush()
    elapsed = time.perf_counter() - t_start
    fps = n_timed / elapsed
    fm = np.asarray(frame_ms)
    stage_detail = {
        "frame_ms_p50": round(float(np.percentile(fm, 50)), 1),
        "frame_ms_p90": round(float(np.percentile(fm, 90)), 1),
        "decide_wait_ms_per_frame": round(
            1e3 * (stage["decide"] - stage["insert"]) / n_timed, 1),
        "kf_insert_ms_each": round(
            1e3 * stage["insert"] / max(stage["n_insert"], 1), 1),
        "n_kf_inserts": stage["n_insert"],
    }

    # trajectory accuracy (Sim3-aligned ATE, mono scale free)
    traj = tracker.trajectory_world()
    est, gt = [], []
    for ts, p in traj:
        i = int(round(ts))
        R, t = poses[i]
        gt.append(-(R.T @ t))
        est.append(p)
    ate = float("nan")
    if len(est) > 10:
        rmse, s, _, _ = alignment.ate_rmse(
            jnp.asarray(np.asarray(est), jnp.float32),
            jnp.asarray(np.asarray(gt), jnp.float32), with_scale=True)
        ate = round(float(rmse), 4)
    return fps, ate, stage_detail


def stereo_inertial_run():
    """Small stereo-inertial synthetic: metric SE3 ATE with the full VI
    stack (IMU init, VI-BA, per-frame pose-inertial refinement). Two
    sessions: the first warms every jit cache the sequence touches (IMU
    init stages, fused VI programs, inertial mapping), the second is timed
    — startup compilation is a one-off deployment cost, not frame-rate."""
    import jax.numpy as jnp
    from morb_slam_tpu import alignment, cameras, imu
    from morb_slam_tpu.pipeline import tracking
    from synthetic_world import PlaneWorld, analytic_pose, imu_between

    W, H, FX = 384, 288, 300.0
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    b = 0.12
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=96, max_lm=8000, n_levels=4,
                                 baseline=b, min_stereo_init_feats=200)
    n_frames = 85
    warmup = 55
    frames = []
    gt = []
    rng_w = np.random.default_rng(1)
    prev_t = -0.05
    imu_batches = []
    for i in range(n_frames):
        t = i * 0.05
        R, tc = analytic_pose(t)
        gt.append(-(R.T @ tc))
        il = np.clip(world.render(R.astype(np.float32),
                                  tc.astype(np.float32)), 0,
                     255).astype(np.uint8)
        ir = np.clip(world.render(
            R.astype(np.float32),
            (tc - np.asarray([b, 0, 0])).astype(np.float32)), 0,
            255).astype(np.uint8)
        imu_batches.append(imu_between(prev_t, t, rng=rng_w,
                                       noise_g=2.4e-3, noise_a=2.8e-2))
        frames.append((il, ir))
        prev_t = t

    def session():
        tr = tracking.Tracker(cam, cfg, imu_calib=calib)
        t_start = None
        for i, (il, ir) in enumerate(frames):
            if i == warmup:
                t_start = time.perf_counter()
            ts_i, acc, gyr = imu_batches[i]
            tr.track_stereo_inertial(il, ir, i * 0.05, acc, gyr, ts_i)
        fps = (n_frames - warmup) / (time.perf_counter() - t_start)
        return tr, fps

    session()                      # compile-warm pass
    tr, fps = session()            # timed
    traj = tr.trajectory_world()
    est, gtp = [], []
    for ts, p in traj:
        i = int(round(ts / 0.05))
        gtp.append(gt[i])
        est.append(p)
    ate = float("nan")
    if len(est) > 10:
        rmse, _, _, _ = alignment.ate_rmse(
            jnp.asarray(np.asarray(est), jnp.float32),
            jnp.asarray(np.asarray(gtp), jnp.float32), with_scale=False)
        ate = round(float(rmse), 4)
    return fps, ate, bool(tr.imu_ready)


def mono_inertial_fisheye_run():
    """Mono-inertial with a KB8 fisheye camera (the BASELINE's TUM-VI
    room config class): pinhole renders remapped through the equidistant
    KB8 model, tracked with the fisheye Newton unprojection end to end."""
    import cv2
    import jax.numpy as jnp
    from morb_slam_tpu import alignment, cameras, imu
    from morb_slam_tpu.pipeline import tracking
    from synthetic_world import PlaneWorld, analytic_pose, imu_between

    W, H = 384, 288
    FF = 170.0                       # fisheye focal
    KS = (0.03, -0.012, 0.004, -0.001)
    FP, WP, HP = 240.0, 640, 480     # wide pinhole source render
    cam = cameras.kannala_brandt8(FF, FF, W / 2, H / 2, *KS)
    Kp = np.array([[FP, 0, WP / 2], [0, FP, HP / 2], [0, 0, 1.0]])
    world = PlaneWorld(Kp, WP, HP, seed=3)

    # fisheye pixel -> pinhole source pixel map (built once)
    u, v = np.meshgrid(np.arange(W, dtype=np.float64),
                       np.arange(H, dtype=np.float64))
    dx = (u - W / 2) / FF
    dy = (v - H / 2) / FF
    r_d = np.sqrt(dx ** 2 + dy ** 2)
    th = r_d.copy()
    k1, k2, k3, k4 = KS
    for _ in range(10):              # Newton: theta_d(theta) = r_d
        t2 = th * th
        f = th * (1 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - r_d
        fp = 1 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        th = th - f / np.clip(fp, 0.5, None)
    r_p = np.tan(np.clip(th, 0, 1.45))
    scale = np.where(r_d > 1e-9, r_p / np.clip(r_d, 1e-9, None), 1.0)
    map_x = (WP / 2 + FP * dx * scale).astype(np.float32)
    map_y = (HP / 2 + FP * dy * scale).astype(np.float32)

    def render_fisheye(R, t):
        src = world.render(R, t)
        return cv2.remap(src, map_x, map_y, cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)

    calib = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5,
                           3e-3, 200.0)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FF, n_feat=500,
                                 max_kf=96, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    rng = np.random.default_rng(4)
    prev_t = -0.05
    n_frames = 100
    warmup = 70          # steady state: past IMU init + the KB8 variants of
                         # the fused-VI and mapping programs
    gt = []
    frames = []
    imu_batches = []
    for i in range(n_frames):
        t = i * 0.05
        R, tc = analytic_pose(t)
        gt.append(-(R.T @ tc))
        frames.append(np.clip(render_fisheye(R.astype(np.float32),
                                             tc.astype(np.float32)),
                              0, 255).astype(np.uint8))
        imu_batches.append(imu_between(prev_t, t, rng=rng, noise_g=2.4e-3,
                                       noise_a=2.8e-2))
        prev_t = t

    def session():
        tr = tracking.Tracker(cam, cfg, imu_calib=calib)
        t_start = None
        for i, img in enumerate(frames):
            if i == warmup:
                t_start = time.perf_counter()
            ts_i, acc, gyr = imu_batches[i]
            tr.track_mono_inertial(img, i * 0.05, acc, gyr, ts_i)
        fps = (n_frames - warmup) / (time.perf_counter() - t_start)
        return tr, fps

    session()                      # compile-warm pass (startup cost)
    tr, fps = session()            # timed
    traj = tr.trajectory_world()
    est, gtp = [], []
    for ts, p in traj:
        i = int(round(ts / 0.05))
        gtp.append(gt[i])
        est.append(p)
    ate = float("nan")
    if len(est) > 10:
        import jax.numpy as jnp
        rmse, _, _, _ = alignment.ate_rmse(
            jnp.asarray(np.asarray(est), jnp.float32),
            jnp.asarray(np.asarray(gtp), jnp.float32), with_scale=True)
        ate = round(float(rmse), 4)
    return fps, ate, bool(tr.imu_ready)


def multi_session_merge_run():
    """Multi-session Atlas synthetic (BASELINE config 5): session break at
    the turnaround, revisit over old ground, stash must merge back."""
    import jax.numpy as jnp
    from morb_slam_tpu import alignment, cameras, frontend
    from morb_slam_tpu.pipeline import tracking
    from morb_slam_tpu.vocab import tree
    from synthetic_world import PlaneWorld, camera_path

    W, H, FX = 384, 288, 300.0
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    fwd = camera_path(28, step=0.05)
    seq = fwd + fwd[-2::-1]
    ocfg = frontend.OrbConfig(n_features=300, n_levels=4)
    descs = []
    for R, t in seq[::6]:
        import jax.numpy as jnp
        f = frontend.extract_orb(
            jnp.asarray(world.render(R, t), jnp.float32), ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=6, depth=3, iters=3)
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    tr = tracking.Tracker(cam, cfg, voc=voc)
    cut = len(fwd)
    for i, (R, t) in enumerate(seq):
        if i == cut:
            tr.create_map_in_atlas()
        tr.track_mono(np.clip(world.render(R, t), 0, 255).astype(np.uint8),
                      ts=float(i))
    merged = any(st.merged_into_gen >= 0 for st in tr.stash)
    traj = tr.trajectory_world()
    est, gtp = [], []
    for ts, p in traj:
        i = int(round(ts))
        R, t = seq[i]
        gtp.append(-(R.T @ t))
        est.append(p)
    ate = float("nan")
    if len(est) > 10:
        rmse, _, _, _ = alignment.ate_rmse(
            jnp.asarray(np.asarray(est), jnp.float32),
            jnp.asarray(np.asarray(gtp), jnp.float32), with_scale=True)
        ate = round(float(rmse), 4)
    return merged, ate


def real_imagery_run():
    """Non-synthetic-texture evidence: mono tracking on frames rendered
    from REAL PHOTOGRAPHS (sklearn/matplotlib sample photos on the plane
    world — exact homographies of real imagery, so real gradients, JPEG
    noise and repetitive man-made texture reach the frontend). Returns
    (fps, sim3 ATE) or None when no photo ships with the environment."""
    import jax.numpy as jnp
    from morb_slam_tpu import alignment, cameras
    from morb_slam_tpu.pipeline import tracking
    from synthetic_world import PlaneWorld, camera_path, \
        real_photo_textures

    photos = real_photo_textures()
    if not photos:
        return None
    W, H, FX = 752, 480, 460.0
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0, textures=photos)
    poses = camera_path(70, step=0.05)
    frames = [np.clip(world.render(R, t), 0, 255).astype(np.uint8)
              for R, t in poses]
    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                                 max_kf=256, max_lm=16384, n_levels=8,
                                 min_init_matches=80, min_init_points=50)
    tr = tracking.Tracker(cam, cfg)
    warmup = 20
    t0 = None
    for i, img in enumerate(frames):
        if i == warmup:
            t0 = time.perf_counter()
        tr.track_mono(img, ts=float(i))
    tr.flush()
    fps = (len(frames) - warmup) / (time.perf_counter() - t0)
    traj = tr.trajectory_world()
    est, gt = [], []
    for ts, p in traj:
        i = int(round(ts))
        R, t = poses[i]
        gt.append(-(R.T @ t))
        est.append(p)
    ate = float("nan")
    if len(est) > 10:
        rmse, _, _, _ = alignment.ate_rmse(
            jnp.asarray(np.asarray(est), jnp.float32),
            jnp.asarray(np.asarray(gt), jnp.float32), with_scale=True)
        ate = round(float(rmse), 4)
    return round(fps, 2), ate


def euroc_run():
    """Real-dataset gate: the moment EuRoC data is present (env
    MORB_EUROC_ROOT or ./data/euroc/<seq>), run the dataset CLI and report
    a directly-BASELINE-comparable ATE. Returns None when no data."""
    root = os.environ.get("MORB_EUROC_ROOT")
    if root is None and os.path.isdir("data/euroc"):
        root = "data/euroc"
    if root is None or not os.path.isdir(root):
        return None
    seqs = [d for d in sorted(os.listdir(root))
            if os.path.isdir(os.path.join(root, d, "mav0"))]
    if not seqs:
        return None
    from morb_slam_tpu.examples import run_dataset
    out = run_dataset.evaluate_sequence(
        os.path.join(root, seqs[0]), sensor="mono")
    return {"sequence": seqs[0], **out}


def ba_iters_per_s():
    """Local-window BA LM iterations per second (BASELINE metric string)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from morb_slam_tpu.optim import ba as ba_mod
    rng = np.random.default_rng(0)
    K, L, O = 20, 6144, 24000
    prob = ba_mod.make_problem(
        R=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (K, 3, 3)),
        t=jnp.zeros((K, 3)),
        X=jnp.asarray(rng.normal(0, 1, (L, 3)), jnp.float32)
        + jnp.asarray([0, 0, 5.0]),
        obs_kf=jnp.asarray(rng.integers(0, K, O), jnp.int32),
        obs_lm=jnp.asarray(rng.integers(0, L, O), jnp.int32),
        obs_uv=jnp.asarray(rng.normal(0, 0.2, (O, 2)), jnp.float32),
        obs_info=jnp.full(O, 1e5, jnp.float32),
        obs_mask=jnp.ones(O, bool),
        kf_opt=jnp.ones(K, bool).at[0].set(False).at[1].set(False),
        lm_opt=jnp.ones(L, bool))
    f = jax.jit(partial(ba_mod.ba_solve, n_iters=10))
    out = f(prob)
    jax.block_until_ready(out[0])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = f(prob)
    jax.block_until_ready(out[0])
    per_solve = (time.perf_counter() - t0) / n
    return 10.0 * n / (time.perf_counter() - t0 + 1e-9), per_solve


def main():
    detail = {}
    fps, ate_mono, stage_detail = mono_run()
    detail["mono_ate_sim3_m"] = ate_mono
    detail["mono_stage_ms"] = stage_detail
    try:
        si_fps, si_ate, imu_ok = stereo_inertial_run()
        detail["stereo_inertial_fps"] = round(si_fps, 2)
        detail["stereo_inertial_ate_se3_m"] = si_ate
        detail["imu_initialized"] = imu_ok
    except Exception as e:   # secondary metrics must not kill the bench
        detail["stereo_inertial_error"] = str(e)[:120]
    try:
        ips, per_solve = ba_iters_per_s()
        detail["ba_iters_per_s"] = round(ips, 1)
        detail["ba_solve_ms_10it"] = round(per_solve * 1e3, 1)
    except Exception as e:
        detail["ba_error"] = str(e)[:120]
    try:
        ff_fps, ff_ate, ff_imu = mono_inertial_fisheye_run()
        detail["mono_inertial_fisheye_fps"] = round(ff_fps, 2)
        detail["mono_inertial_fisheye_ate_sim3_m"] = ff_ate
        detail["fisheye_imu_initialized"] = ff_imu
    except Exception as e:
        detail["fisheye_error"] = str(e)[:120]
    try:
        merged, m_ate = multi_session_merge_run()
        detail["atlas_merge_ok"] = merged
        detail["atlas_merge_ate_sim3_m"] = m_ate
    except Exception as e:
        detail["merge_error"] = str(e)[:120]
    try:
        ri = real_imagery_run()
        if ri is not None:
            detail["real_imagery_fps"] = ri[0]
            detail["real_imagery_ate_sim3_m"] = ri[1]
    except Exception as e:
        detail["real_imagery_error"] = str(e)[:120]
    try:
        eu = euroc_run()
        if eu is not None:
            detail["euroc"] = eu
    except Exception as e:
        detail["euroc_error"] = str(e)[:120]

    print(json.dumps({
        "metric": "tracked_frames_per_second",
        "value": round(fps, 2),
        "unit": "frames/s (752x480 mono, 1200 ORB, full SLAM loop)",
        "vs_baseline": round(fps / 20.0, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
