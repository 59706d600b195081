"""Aux-subsystem tests: stage timers, verbose logging, headless viz dumps,
IMU calibration tool, and the unified dataset-runner CLI end-to-end on a
synthetic EuRoC-layout mini dataset."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu.utils import profiling, verbose


def test_stage_timers():
    t = profiling.StageTimers(enabled=True)
    with t.stage("TrackTotal"):
        sum(range(1000))
    t.add_ms("LMTotal", 3.5)
    t.add_ms("LMTotal", 4.5)
    st = t.stats()
    assert st["LMTotal"][0] == 2
    assert abs(st["LMTotal"][1] - 4.0) < 1e-9
    assert "TrackTotal" in t.report()


def test_stage_timers_disabled_noop():
    t = profiling.StageTimers(enabled=False)
    with t.stage("X"):
        pass
    assert not t.samples


def test_timers_save(tmp_path):
    t = profiling.StageTimers(enabled=True)
    t.add_ms("ORBExtract", 1.0)
    p = str(tmp_path / "ExecTimeMean.txt")
    t.save(p)
    assert "ORBExtract" in open(p).read()


def test_verbose_levels(capsys):
    verbose.set_level(verbose.Level.QUIET)
    verbose.print_mess("hidden", verbose.Level.NORMAL)
    verbose.set_level(verbose.Level.NORMAL)
    verbose.print_mess("shown", verbose.Level.NORMAL)
    err = capsys.readouterr().err
    assert "shown" in err and "hidden" not in err


def test_viz_dumps(tmp_path):
    from morb_slam_tpu import viz
    from morb_slam_tpu.mapstate import state as ms
    m = ms.empty_map(4, 8, 64)
    m = m._replace(
        kf_valid=m.kf_valid.at[:2].set(True),
        lm_pos=m.lm_pos.at[:10].set(
            jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (10, 3)),
                        jnp.float32)),
        lm_valid=m.lm_valid.at[:10].set(True))
    ply = str(tmp_path / "map.ply")
    svg = str(tmp_path / "map.svg")
    viz.write_ply(ply, m)
    viz.write_svg(svg, m, trajectory_xyz=np.zeros((5, 3)))
    txt = open(ply).read()
    assert "element vertex" in txt and "element edge" in txt
    assert "<svg" in open(svg).read()

    img = np.zeros((64, 64), np.float32)
    rgb = viz.frame_overlay(img, np.asarray([[10, 10], [60, 60]]),
                            np.asarray([True, True]),
                            np.asarray([True, False]))
    assert rgb.shape == (64, 64, 3)
    assert rgb[8, 8, 1] == 255          # green box corner at (10,10)


def test_process_imu_noise_estimate(tmp_path):
    from morb_slam_tpu.tools import process_imu
    rng = np.random.default_rng(0)
    fs, dur = 200.0, 120.0
    n = int(fs * dur)
    ts = np.arange(n) / fs
    sigma_g = 1.7e-4 * np.sqrt(fs)   # white noise with density 1.7e-4
    gyro = rng.normal(0, sigma_g, (n, 3))
    acc = rng.normal(0, 2e-3 * np.sqrt(fs), (n, 3)) + [0, 0, 9.81]
    out = process_imu.estimate_noise(ts, gyro, acc)
    # density recovered within 2x (Allan estimate on finite data)
    assert 0.5 * 1.7e-4 < out["gyro_noise_density"] < 2 * 1.7e-4, out
    assert abs(out["frequency_hz"] - fs) < 1.0


def _make_euroc_mini(root, world, seq, fps=10.0):
    """Write a tiny EuRoC-layout dataset from the synthetic world."""
    import cv2
    cam0 = os.path.join(root, "mav0", "cam0")
    os.makedirs(os.path.join(cam0, "data"), exist_ok=True)
    rows = []
    for i, (R, t) in enumerate(seq):
        ts_ns = int(i / fps * 1e9)
        name = f"{ts_ns}.png"
        img = world.render(R, t).astype(np.uint8)
        cv2.imwrite(os.path.join(cam0, "data", name), img)
        rows.append(f"{ts_ns},{name}")
    with open(os.path.join(cam0, "data.csv"), "w") as f:
        f.write("#ts,filename\n" + "\n".join(rows) + "\n")


def test_run_dataset_cli_mono(tmp_path):
    """Full CLI: synthetic EuRoC-layout mono sequence -> trajectory + map
    dumps + summary JSON."""
    cv2 = pytest.importorskip("cv2")
    from synthetic_world import PlaneWorld, camera_path
    from morb_slam_tpu.examples import run_dataset

    W, H, FX = 384, 288, 300.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    seq = camera_path(12, step=0.05)
    root = str(tmp_path / "seq")
    _make_euroc_mini(root, world, seq)

    yaml_path = str(tmp_path / "settings.yaml")
    with open(yaml_path, "w") as f:
        f.write(f"""%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: {FX}
Camera1.fy: {FX}
Camera1.cx: {W / 2}
Camera1.cy: {H / 2}
Camera.width: {W}
Camera.height: {H}
Camera.fps: 10
ORBextractor.nFeatures: 400
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 4
""")
    traj = str(tmp_path / "traj.txt")
    ply = str(tmp_path / "map.ply")
    svg = str(tmp_path / "map.svg")
    rc = run_dataset.main([
        "--dataset", "euroc", "--sensor", "mono", "--root", root,
        "--settings", yaml_path, "--traj", traj, "--map-ply", ply,
        "--map-svg", svg, "--max-kf", "32", "--max-lm", "4000",
    ])
    assert rc == 0
    assert os.path.exists(traj) and len(open(traj).read().strip()) > 0
    assert os.path.exists(ply) and os.path.exists(svg)


def test_run_live_on_video_file(tmp_path):
    """Live-capture CLI (reference live example mains class): drive
    examples.run_live on a rendered VIDEO FILE through cv2.VideoCapture —
    the same code path a V4L2 device or RTSP stream takes."""
    import cv2
    import numpy as np
    from synthetic_world import PlaneWorld, camera_path
    from morb_slam_tpu.examples import run_live

    W, H, FX = 384, 288, 300.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    video = str(tmp_path / "seq.avi")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (W, H), isColor=False)
    assert wr.isOpened()
    for R, t in camera_path(40, step=0.05):
        wr.write(np.clip(world.render(R, t), 0, 255).astype(np.uint8))
    wr.release()

    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        'File.version: "1.0"\n'
        "Camera.type: PinHole\n"
        f"Camera1.fx: {FX}\nCamera1.fy: {FX}\n"
        f"Camera1.cx: {W / 2}\nCamera1.cy: {H / 2}\n"
        f"Camera.width: {W}\nCamera.height: {H}\n"
        "Camera.fps: 20\n"
        "ORBextractor.nFeatures: 500\n"
        "ORBextractor.nLevels: 4\n")
    traj = str(tmp_path / "traj.txt")
    rc = run_live.main(["--source", video, "--settings", str(yaml),
                        "--traj", traj, "--max-frames", "40",
                        "--max-kf", "32", "--max-lm", "6000"])
    assert rc == 0
    lines = open(traj).readlines()
    assert len(lines) > 20, len(lines)


def test_deterministic_replay():
    """Deterministic-replay harness (SURVEY §4/§5 race-detection
    substitution): the functional-snapshot design makes a whole SLAM run a
    pure function of its inputs — two identical runs must produce
    BIT-IDENTICAL trajectories and maps. The reference cannot promise
    this (tracking/mapping/loop threads race on the shared Atlas); here
    it is the contract that replaces the lock hierarchy, and this test is
    the race detector: any hidden nondeterminism (unseeded RNG, host
    clock leaking into decisions, iteration-order dependence) breaks it."""
    import numpy as np
    from synthetic_world import PlaneWorld, camera_path
    from morb_slam_tpu import cameras
    from morb_slam_tpu.pipeline import tracking

    W, H, FX = 384, 288, 300.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    poses = camera_path(35, step=0.05)
    frames = [world.render(R, t) for R, t in poses]

    def run():
        cfg = tracking.TrackerConfig(width=W, height=H, focal=FX,
                                     n_feat=500, max_kf=32, max_lm=6000,
                                     n_levels=4, min_init_matches=60,
                                     min_init_points=40)
        tr = tracking.Tracker(cameras.pinhole(FX, FX, W / 2, H / 2), cfg)
        for i, img in enumerate(frames):
            tr.track_mono(img, ts=float(i))
        tr.flush()
        traj = np.asarray([p for _, p in tr.trajectory_world()])
        return traj, np.asarray(tr.m.lm_pos), np.asarray(tr.m.kf_t)

    t1, lm1, kt1 = run()
    t2, lm2, kt2 = run()
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(lm1, lm2)
    np.testing.assert_array_equal(kt1, kt2)


def test_run_live_inertial_on_recorded_clip(tmp_path):
    """run_live --imu: the visual-inertial live path end-to-end on a
    recorded clip + IMU CSV (reference mono_inertial_realsense_D435i.cc
    class — capture + per-frame IMU batches in (t_prev, t_frame])."""
    import cv2
    import numpy as np
    from synthetic_world import PlaneWorld, analytic_pose, imu_between
    from morb_slam_tpu.examples import run_live

    W, H, FX = 384, 288, 300.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    video = str(tmp_path / "seq.avi")
    wr = cv2.VideoWriter(video, cv2.VideoWriter_fourcc(*"MJPG"), 20.0,
                         (W, H), isColor=False)
    assert wr.isOpened()
    n_frames = 80
    rng = np.random.default_rng(1)
    prev_t = -0.05
    imu_lines = ["# ts,gx,gy,gz,ax,ay,az"]
    for i in range(n_frames):
        t = i * 0.05
        R, tc = analytic_pose(t)
        wr.write(np.clip(world.render(R.astype(np.float32),
                                      tc.astype(np.float32)),
                         0, 255).astype(np.uint8))
        ts_i, acc, gyr = imu_between(prev_t, t, rng=rng, noise_g=2.4e-3,
                                     noise_a=2.8e-2)
        for j in range(len(ts_i)):
            imu_lines.append(
                "%.6f,%.7f,%.7f,%.7f,%.7f,%.7f,%.7f"
                % (ts_i[j], gyr[j, 0], gyr[j, 1], gyr[j, 2],
                   acc[j, 0], acc[j, 1], acc[j, 2]))
        prev_t = t
    wr.release()
    imu_csv = str(tmp_path / "imu.csv")
    open(imu_csv, "w").write("\n".join(imu_lines) + "\n")

    yaml = tmp_path / "cam.yaml"
    yaml.write_text(
        'File.version: "1.0"\n'
        "Camera.type: PinHole\n"
        f"Camera1.fx: {FX}\nCamera1.fy: {FX}\n"
        f"Camera1.cx: {W / 2}\nCamera1.cy: {H / 2}\n"
        f"Camera.width: {W}\nCamera.height: {H}\n"
        "Camera.fps: 20\n"
        "IMU.NoiseGyro: 1.7e-4\nIMU.NoiseAcc: 2.0e-3\n"
        "IMU.GyroWalk: 1.9e-5\nIMU.AccWalk: 3.0e-3\n"
        "IMU.Frequency: 200.0\n"
        "ORBextractor.nFeatures: 500\n"
        "ORBextractor.nLevels: 4\n")
    traj = str(tmp_path / "traj.txt")
    rc = run_live.main(["--source", video, "--settings", str(yaml),
                        "--imu", imu_csv, "--traj", traj,
                        "--max-frames", str(n_frames),
                        "--max-kf", "64", "--max-lm", "8000"])
    assert rc == 0
    lines = open(traj).readlines()
    assert len(lines) > 40, len(lines)
