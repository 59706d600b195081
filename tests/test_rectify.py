"""Stereo rectification tests: rectifying-rotation algebra, remap-grid
consistency with the distorted projection model, and an end-to-end
unrectified-stereo run through System (reference
Settings::precomputeRectificationMaps, Settings.cc:185-199)."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rot

from morb_slam_tpu import cameras, lie
from morb_slam_tpu.ops import rectify

from synthetic_world import PlaneWorld, camera_path


def _rig(angle=0.03):
    """A slightly converging stereo rig: cam2 is 11 cm to the right of cam1
    and rotated by `angle` rad."""
    R_12 = Rot.from_rotvec([0.01, angle, -0.005]).as_matrix()
    t_12 = np.array([0.11, 0.002, -0.001])
    T = np.eye(4)
    T[:3, :3] = R_12
    T[:3, 3] = t_12
    return T


def test_rectifying_rotation_properties():
    T = _rig()
    R_12 = jnp.asarray(T[:3, :3], jnp.float32)
    t_12 = jnp.asarray(T[:3, 3], jnp.float32)
    R1, R2, b = rectify.rectifying_rotations(R_12, t_12)
    # rotations are orthonormal
    for R in (R1, R2):
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3),
                                   atol=1e-5)
    # rectified relative rotation is identity: R1 R_12 = R2
    np.testing.assert_allclose(np.asarray(lie.matmat(R1, R_12)),
                               np.asarray(R2), atol=1e-5)
    # baseline purely along x
    t_r = np.asarray(lie.matvec(R1, t_12))
    assert abs(t_r[0] - float(b)) < 1e-5
    assert abs(t_r[1]) < 1e-5 and abs(t_r[2]) < 1e-5


def test_map_consistency_distorted_pinhole():
    """A world point seen at raw pixel p_raw must be fetched by the remap
    grid at its rectified projection."""
    W, H = 320, 240
    cam1 = cameras.pinhole(280.0, 280.0, W / 2, H / 2,
                           dist=[-0.28, 0.07, 1e-4, -2e-5, 0.0])
    cam2 = cameras.pinhole(282.0, 282.0, W / 2 + 2, H / 2 - 1,
                           dist=[-0.27, 0.065, -1e-4, 1e-5, 0.0])
    T = _rig()
    maps = rectify.build_rectify_maps(cam1, cam2, T, W, H)
    rng = np.random.default_rng(0)
    X = rng.uniform([-0.5, -0.4, 2.0], [0.5, 0.4, 5.0], (50, 3)) \
        .astype(np.float32)
    p_raw = np.asarray(cameras.project_distorted(cam1, jnp.asarray(X)))
    Xr = np.asarray(lie.matvec(maps.R_rect1[None], jnp.asarray(X)))
    p_rect = np.asarray(cameras.project(maps.cam_new, jnp.asarray(Xr)))
    # bilinear-sample the map grid at p_rect and compare to p_raw
    m = np.asarray(maps.map1)
    ok = 0
    for i in range(len(X)):
        u, v = p_rect[i]
        if not (1 <= u < W - 2 and 1 <= v < H - 2):
            continue
        u0, v0 = int(u), int(v)
        fu, fv = u - u0, v - v0
        samp = (m[v0, u0] * (1 - fu) * (1 - fv) + m[v0, u0 + 1] * fu * (1 - fv)
                + m[v0 + 1, u0] * (1 - fu) * fv + m[v0 + 1, u0 + 1] * fu * fv)
        np.testing.assert_allclose(samp, p_raw[i], atol=0.2)
        ok += 1
    assert ok > 25


def test_map_consistency_fisheye():
    """Same consistency through the KB8 fisheye model (TUM-VI geometry)."""
    W, H = 320, 240
    cam1 = cameras.kannala_brandt8(190.0, 190.0, W / 2, H / 2,
                                   0.0034, 0.0007, -0.002, 0.0003)
    cam2 = cameras.kannala_brandt8(190.5, 190.5, W / 2 - 1, H / 2 + 1,
                                   0.0034, 0.0007, -0.002, 0.0003)
    T = _rig(angle=0.02)
    maps = rectify.build_rectify_maps(cam1, cam2, T, W, H, focal=160.0)
    rng = np.random.default_rng(1)
    X = rng.uniform([-0.6, -0.5, 2.0], [0.6, 0.5, 5.0], (50, 3)) \
        .astype(np.float32)
    p_raw = np.asarray(cameras.project_distorted(cam1, jnp.asarray(X)))
    Xr = np.asarray(lie.matvec(maps.R_rect1[None], jnp.asarray(X)))
    p_rect = np.asarray(cameras.project(maps.cam_new, jnp.asarray(Xr)))
    m = np.asarray(maps.map1)
    ok = 0
    for i in range(len(X)):
        u, v = p_rect[i]
        if not (1 <= u < W - 2 and 1 <= v < H - 2):
            continue
        u0, v0 = int(u), int(v)
        fu, fv = u - u0, v - v0
        samp = (m[v0, u0] * (1 - fu) * (1 - fv) + m[v0, u0 + 1] * fu * (1 - fv)
                + m[v0 + 1, u0] * (1 - fu) * fv + m[v0 + 1, u0 + 1] * fu * fv)
        np.testing.assert_allclose(samp, p_raw[i], atol=0.3)
        ok += 1
    assert ok > 25


def test_remap_identity_and_shift():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0, 255, (40, 60)).astype(np.float32))
    u, v = jnp.meshgrid(jnp.arange(60, dtype=jnp.float32),
                        jnp.arange(40, dtype=jnp.float32))
    ident = jnp.stack([u, v], axis=-1)
    out = rectify.remap_bilinear(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-3)
    # half-pixel shift = average of neighbors
    shifted = rectify.remap_bilinear(img, ident + jnp.asarray([0.5, 0.0]))
    expect = 0.5 * (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:])
    np.testing.assert_allclose(np.asarray(shifted)[:, :-1], expect,
                               atol=1e-3)


def test_unrectified_stereo_e2e():
    """Raw (rotated-rig) stereo through the System facade: rectification
    must produce a row-aligned pair that tracks with metric scale."""
    from morb_slam_tpu import system as system_mod
    from morb_slam_tpu.io import config as config_mod

    W, H, FX = 384, 288, 300.0
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    T = _rig(angle=0.02)          # cam2 pose in cam1 frame
    R_12, t_12 = T[:3, :3], T[:3, 3]
    R_21 = R_12.T
    t_21 = -R_21 @ t_12

    settings = config_mod.Settings(
        cam1=config_mod.CameraSettings(model="PinHole", fx=FX, fy=FX,
                                       cx=W / 2, cy=H / 2, width=W,
                                       height=H),
        cam2=config_mod.CameraSettings(model="PinHole", fx=FX, fy=FX,
                                       cx=W / 2, cy=H / 2, width=W,
                                       height=H),
        T_c1_c2=T,
        baseline=float(np.linalg.norm(t_12)),
        n_features=500, n_levels=4)
    sysm = system_mod.System(settings, system_mod.Sensor.STEREO,
                             tracker_overrides=dict(
                                 max_kf=64, max_lm=8000,
                                 min_stereo_init_feats=150))
    assert sysm.rectify is not None

    poses = camera_path(40, step=0.05)
    gt_centers = []
    states = []
    for i, (R1, t1) in enumerate(poses):
        img_l = world.render(R1, t1)
        R2 = (R_21 @ R1).astype(np.float32)
        t2 = (R_21 @ t1 + t_21).astype(np.float32)
        img_r = world.render(R2, t2)
        state, pose = sysm.track_stereo(img_l, img_r, ts=i * 0.05)
        states.append(state)
        gt_centers.append(-(R1.T @ t1))
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.8 * len(states), states

    # metric scale: compare estimated trajectory extent to ground truth
    traj = sysm.tracker.trajectory_world()
    assert len(traj) > 25
    est = np.asarray([p for _, p in traj])
    gt = np.asarray(gt_centers[-len(est):])
    ext_est = np.linalg.norm(est[-1] - est[0])
    ext_gt = np.linalg.norm(gt[-1] - gt[0])
    assert abs(ext_est / ext_gt - 1.0) < 0.08, (ext_est, ext_gt)
