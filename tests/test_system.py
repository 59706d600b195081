"""System facade tests: full lifecycle — construct from settings, run a
sequence, save trajectory + atlas, reload, relocalize (localization mode)."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import frontend, system
from morb_slam_tpu.io import config
from morb_slam_tpu.vocab import tree

from synthetic_world import PlaneWorld, camera_path

W, H, FX = 384, 288, 300.0


def make_settings():
    s = config.Settings()
    s.cam1 = config.CameraSettings(model="PinHole", fx=FX, fy=FX,
                                   cx=W / 2, cy=H / 2, width=W, height=H)
    s.n_features = 500
    s.n_levels = 4
    return s


def test_system_lifecycle(tmp_path):
    world = PlaneWorld(np.array([[FX, 0, W / 2], [0, FX, H / 2],
                                 [0, 0, 1.0]]), W, H, seed=0)
    poses = camera_path(40, step=0.05)
    ocfg = frontend.OrbConfig(n_features=300, n_levels=4)
    descs = []
    for R, t in poses[::8]:
        f = frontend.extract_orb(jnp.asarray(world.render(R, t), jnp.float32),
                                 ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=6, depth=3, iters=3)

    sys1 = system.System(
        make_settings(), system.Sensor.MONOCULAR, vocabulary=voc,
        tracker_overrides=dict(max_kf=48, max_lm=6000,
                               min_init_matches=60, min_init_points=40))
    for i, (R, t) in enumerate(poses):
        sys1.track_monocular(jnp.asarray(world.render(R, t), jnp.float32),
                             ts=float(i) * 0.05)
    assert sys1.state == "OK"
    # outputs
    sys1.save_trajectory_tum(str(tmp_path / "traj.txt"))
    sys1.save_keyframe_trajectory_tum(str(tmp_path / "kf.txt"))
    assert len(open(tmp_path / "traj.txt").readlines()) > 30
    pc = sys1.map_point_cloud()
    assert pc.shape[0] > 200 and pc.shape[1] == 3
    sys1.save_atlas(str(tmp_path / "atlas"))

    # new session: load the atlas, localization-only, relocalize
    sys2 = system.System(
        make_settings(), system.Sensor.MONOCULAR, vocabulary=voc,
        tracker_overrides=dict(max_kf=48, max_lm=6000,
                               min_init_matches=60, min_init_points=40))
    sys2.load_atlas(str(tmp_path / "atlas"))
    sys2.activate_localization_mode()
    assert sys2.state == "RECENTLY_LOST"
    n_kf_before = sys2.tracker.n_kf_host
    ok_any = False
    for i in (10, 11, 12, 13):
        R, t = poses[i]
        st, pose = sys2.track_monocular(
            jnp.asarray(world.render(R, t), jnp.float32), ts=100.0 + i)
        ok_any = ok_any or st == "OK"
    assert ok_any, "failed to relocalize into the loaded atlas"
    assert sys2.tracker.n_kf_host == n_kf_before  # localization-only


def test_settings_to_system_yaml(tmp_path):
    yaml_text = f"""%YAML:1.0
---
Camera.type: "PinHole"
Camera1.fx: {FX}
Camera1.fy: {FX}
Camera1.cx: {W/2}
Camera1.cy: {H/2}
Camera.width: {W}
Camera.height: {H}
ORBextractor.nFeatures: 400
ORBextractor.nLevels: 4
"""
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml_text)
    sys1 = system.System(str(p), system.Sensor.MONOCULAR,
                         tracker_overrides=dict(max_kf=16, max_lm=2000))
    assert sys1.tracker.cfg.n_feat == 400
    assert sys1.tracker.cfg.width == W
