"""IO round-trip tests: YAML settings, trajectory formats, map
serialization, ATE CLI."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import lie
from morb_slam_tpu.eval import ate
from morb_slam_tpu.io import config, serialization, trajectory
from morb_slam_tpu.mapstate import state as ms


EUROC_YAML = """%YAML:1.0
---
File.version: "1.0"
Camera.type: "PinHole"
Camera1.fx: 458.654
Camera1.fy: 457.296
Camera1.cx: 367.215
Camera1.cy: 248.375
Camera1.k1: -0.28340811
Camera1.k2: 0.07395907
Camera1.p1: 0.00019359
Camera1.p2: 1.76187114e-05
Camera2.fx: 457.587
Camera2.fy: 456.134
Camera2.cx: 379.999
Camera2.cy: 255.238
Camera2.k1: -0.28368365
Camera2.k2: 0.07451284
Camera2.p1: -0.00010473
Camera2.p2: -3.55590700e-05
Camera.width: 752
Camera.height: 480
Camera.fps: 20
Stereo.ThDepth: 35.0
Stereo.T_c1_c2: !!opencv-matrix
  rows: 4
  cols: 4
  dt: f
  data: [1.0, 0.0, 0.0, 0.110074, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 1.0]
IMU.NoiseGyro: 1.7e-04
IMU.NoiseAcc: 2.0e-03
IMU.GyroWalk: 1.9e-05
IMU.AccWalk: 3.0e-03
IMU.Frequency: 200.0
ORBextractor.nFeatures: 1200
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""


def test_settings_euroc(tmp_path):
    p = tmp_path / "euroc.yaml"
    # strip the opencv-matrix tag (pyyaml-safe form)
    p.write_text(EUROC_YAML.replace(" !!opencv-matrix", ""))
    s = config.load_settings(str(p))
    assert abs(s.cam1.fx - 458.654) < 1e-6
    assert s.cam2 is not None
    assert abs(s.baseline - 0.110074) < 1e-5
    assert abs(s.bf - 0.110074 * 458.654) < 1e-3
    assert s.imu is not None and abs(s.imu.frequency - 200.0) < 1e-9
    assert s.n_features == 1200
    cam = s.cam1.to_camera()
    assert cam.kind == 0


def make_poses(n=10):
    rng = np.random.default_rng(5)
    out = []
    for k in range(n):
        R, t = lie.se3_exp(jnp.asarray(rng.normal(0, 0.3, 6), jnp.float32))
        out.append((k * 0.05, R, t))
    return out


def test_tum_roundtrip(tmp_path):
    poses = make_poses()
    p = str(tmp_path / "traj.txt")
    trajectory.write_tum(p, poses)
    ts, pos, quat = trajectory.read_tum(p)
    assert len(ts) == 10
    Rwc = np.asarray(poses[3][1]).T
    twc = -Rwc @ np.asarray(poses[3][2])
    np.testing.assert_allclose(pos[3], twc, atol=1e-5)
    R_read = np.asarray(lie.quat_to_rotmat(jnp.asarray(quat[3], jnp.float32)))
    np.testing.assert_allclose(R_read, Rwc, atol=1e-5)


def test_euroc_and_kitti_write(tmp_path):
    poses = make_poses()
    trajectory.write_euroc(str(tmp_path / "e.csv"), poses)
    ts, pos, quat = trajectory.read_tum(str(tmp_path / "e.csv"))
    assert len(ts) == 10
    Rwc = np.asarray(poses[2][1]).T
    twc = -Rwc @ np.asarray(poses[2][2])
    np.testing.assert_allclose(pos[2], twc, atol=1e-5)
    R_read = np.asarray(lie.quat_to_rotmat(jnp.asarray(quat[2], jnp.float32)))
    np.testing.assert_allclose(R_read, Rwc, atol=1e-4)
    trajectory.write_kitti(str(tmp_path / "k.txt"), poses)
    lines = open(tmp_path / "k.txt").read().strip().split("\n")
    assert len(lines) == 10 and len(lines[0].split()) == 12


def test_associate():
    ts_a = np.asarray([0.0, 0.1, 0.2, 0.35])
    ts_b = np.asarray([0.01, 0.11, 0.24, 0.34, 0.5])
    ia, ib = trajectory.associate(ts_a, ts_b)
    assert list(ia) == [0, 1, 3]
    assert list(ib) == [0, 1, 3]


def test_ate_cli(tmp_path):
    poses = make_poses(30)
    gt = str(tmp_path / "gt.txt")
    trajectory.write_tum(gt, poses)
    # estimated = similarity-transformed ground truth
    s, Rg, tg = lie.sim3_exp(jnp.asarray([.1, -.2, .3, .05, .1, -.02, .15],
                                         jnp.float32))
    est_poses = []
    for ts, R, t in poses:
        # transform camera center, keep rotation (ATE only uses positions)
        Rwc = np.asarray(R).T
        twc = -Rwc @ np.asarray(t)
        c2 = np.asarray(lie.sim3_apply(s[None], Rg[None], tg[None],
                                       jnp.asarray(twc)[None]))[0]
        R2 = np.asarray(R)
        t2 = -R2 @ c2
        est_poses.append((ts, jnp.asarray(R2), jnp.asarray(t2)))
    est = str(tmp_path / "est.txt")
    trajectory.write_tum(est, est_poses)
    out = ate.evaluate(gt, est, with_scale=True)
    assert out["pairs"] == 30
    assert out["rmse"] < 1e-4
    np.testing.assert_allclose(out["scale"], 1.0 / float(s), rtol=1e-4)


def test_map_serialization_roundtrip(tmp_path):
    m = ms.empty_map(8, 64, 256)
    rng = np.random.default_rng(6)
    m = m._replace(
        lm_pos=jnp.asarray(rng.normal(size=(256, 3)), jnp.float32),
        lm_valid=jnp.asarray(rng.random(256) > 0.5),
        kf_valid=jnp.ones(8, bool),
        n_kf=jnp.asarray(8), n_lm=jnp.asarray(100))
    path = str(tmp_path / "map")
    serialization.save_map(path, m, meta={"seq": "test"})
    m2 = serialization.load_map(path)
    for k in m._fields:
        np.testing.assert_array_equal(np.asarray(getattr(m, k)),
                                      np.asarray(getattr(m2, k)))


def test_vocab_checksum_guard(tmp_path):
    from morb_slam_tpu.vocab import tree
    rng = np.random.default_rng(7)
    d = rng.integers(0, 2 ** 32, (500, 8), dtype=np.uint32)
    voc1 = tree.train(d, k=3, depth=2, iters=2, seed=0)
    voc2 = tree.train(d, k=3, depth=2, iters=2, seed=1)
    m = ms.empty_map(4, 16, 64)
    path = str(tmp_path / "map")
    serialization.save_map(path, m, voc=voc1)
    serialization.load_map(path, voc=voc1)  # ok
    with pytest.raises(ValueError):
        serialization.load_map(path, voc=voc2)
