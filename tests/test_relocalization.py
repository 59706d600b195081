"""Relocalization test: blind the tracker mid-sequence (blank frames), then
verify it relocalizes when revisiting mapped territory."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import cameras, frontend
from morb_slam_tpu.pipeline import tracking
from morb_slam_tpu.vocab import tree

from synthetic_world import PlaneWorld, camera_path

W, H, FX = 384, 288, 300.0


def test_relocalizes_after_blackout():
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    path = camera_path(30, step=0.05)
    # phase 1: map frames 0..19; phase 2: 6 blank frames; phase 3: revisit
    # poses 12..17 (already mapped territory)
    seq = [path[i] for i in range(20)]
    blank = [None] * 6
    revisit = [path[i] for i in range(12, 18)]

    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=48, max_lm=6000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    # train a tiny vocabulary on frames of this world
    ocfg = frontend.OrbConfig(n_features=300, n_levels=4)
    descs = []
    for R, t in path[::4]:
        f = frontend.extract_orb(jnp.asarray(world.render(R, t), jnp.float32),
                                 ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=6, depth=3, iters=3)

    tr = tracking.Tracker(cam, cfg, voc=voc)
    states = []
    for i, p in enumerate(seq + blank + revisit):
        img = world.render(*p) if p is not None else np.zeros((H, W), np.float32)
        state, pose = tr.track_mono(jnp.asarray(img, jnp.float32), ts=float(i))
        states.append(state)
    # lost during blackout...
    assert "RECENTLY_LOST" in states[20:26], states[18:]
    # ...and recovered on revisit
    assert states[-1] == "OK" or states[-2] == "OK", states[26:]
    # relocalized pose must be near the ground truth (same gauge as the map)
    R_gt, t_gt = revisit[-1]
    pose_R, pose_t = tr.R_last, tr.t_last
    c_est = -(np.asarray(pose_R).T @ np.asarray(pose_t))
    # compare against where tracking phase-1 placed the same spot: use the
    # map keyframe nearest in timestamp to the revisit pose index 17
    kf_ts = np.asarray(tr.m.kf_ts)[:int(tr.m.n_kf)]
    k_near = int(np.argmin(np.abs(kf_ts - 17.0)))
    Rk, tk = np.asarray(tr.m.kf_R[k_near]), np.asarray(tr.m.kf_t[k_near])
    c_kf = -(Rk.T @ tk)
    assert np.linalg.norm(c_est - c_kf) < 0.15, (c_est, c_kf)
