"""Multi-map Atlas tests: lost-tracking recovery via a fresh map and the
Sim(3) weld of a stashed map back into the active one (reference Atlas +
Tracking::CreateMapInAtlas + LoopClosing MergeLocal)."""
import jax
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import alignment, cameras, frontend, lie
from morb_slam_tpu.mapstate import atlas as atlas_mod
from morb_slam_tpu.mapstate import state as ms
from morb_slam_tpu.pipeline import tracking
from morb_slam_tpu.vocab import tree

from synthetic_world import PlaneWorld, camera_path

W, H, FX = 384, 288, 300.0


def test_transform_map_identity():
    m = ms.empty_map(4, 8, 16)
    m = m._replace(kf_valid=m.kf_valid.at[0].set(True),
                   lm_pos=m.lm_pos.at[0].set(jnp.asarray([1., 2., 3.])))
    one = jnp.asarray(1.0, jnp.float32)
    m2 = atlas_mod.transform_map(m, one, jnp.eye(3), jnp.zeros(3))
    assert np.allclose(np.asarray(m2.lm_pos), np.asarray(m.lm_pos))
    assert np.allclose(np.asarray(m2.kf_t), np.asarray(m.kf_t))


def test_transform_map_consistency():
    """After a Sim3 world transform, each landmark's camera-frame position
    (scaled by s) must be preserved: reprojections are invariant."""
    rng = np.random.default_rng(0)
    m = ms.empty_map(4, 8, 64)
    X = jnp.asarray(rng.uniform(-1, 1, (64, 3)) + [0, 0, 5], jnp.float32)
    R0, t0 = lie.se3_exp(jnp.asarray([.1, .2, .3, .05, .02, .01],
                                     jnp.float32))
    m = m._replace(kf_R=m.kf_R.at[0].set(R0), kf_t=m.kf_t.at[0].set(t0),
                   kf_valid=m.kf_valid.at[0].set(True),
                   lm_pos=X, lm_valid=jnp.ones(64, bool))
    s = jnp.asarray(1.7, jnp.float32)
    Rw = lie.so3_exp(jnp.asarray([.3, -.2, .5], jnp.float32))
    tw = jnp.asarray([2., -1., .5], jnp.float32)
    m2 = atlas_mod.transform_map(m, s, Rw, tw)
    Xc_old = lie.se3_apply(m.kf_R[0], m.kf_t[0], m.lm_pos)
    Xc_new = lie.se3_apply(m2.kf_R[0], m2.kf_t[0], m2.lm_pos)
    # same projections: Xc_new = s * Xc_old up to float error
    ratio = np.asarray(Xc_new / Xc_old)
    assert np.allclose(ratio, float(s), atol=1e-3), ratio[:3]


def test_merge_maps_offsets():
    m_act = ms.empty_map(8, 4, 32)
    m_old = ms.empty_map(8, 4, 32)
    # active: 2 KFs, 5 LMs; old: 3 KFs, 7 LMs
    m_act = m_act._replace(
        kf_valid=m_act.kf_valid.at[:2].set(True),
        lm_valid=m_act.lm_valid.at[:5].set(True),
        n_kf=jnp.asarray(2), n_lm=jnp.asarray(5))
    m_old = m_old._replace(
        kf_valid=m_old.kf_valid.at[:3].set(True),
        kf_prev=m_old.kf_prev.at[1].set(0).at[2].set(1),
        kf_feat_lm=m_old.kf_feat_lm.at[0, 0].set(6),
        kf_feat_valid=m_old.kf_feat_valid.at[0, 0].set(True),
        lm_valid=m_old.lm_valid.at[:7].set(True),
        lm_ref_kf=m_old.lm_ref_kf.at[:7].set(1),
        n_kf=jnp.asarray(3), n_lm=jnp.asarray(7))
    one = jnp.asarray(1.0, jnp.float32)
    merged, kf_off, lm_off = atlas_mod.merge_maps(
        m_act, m_old, one, jnp.eye(3), jnp.zeros(3))
    assert int(kf_off) == 2 and int(lm_off) == 5
    assert int(merged.n_kf) == 5 and int(merged.n_lm) == 12
    assert bool(merged.kf_valid[4]) and not bool(merged.kf_valid[5])
    # remapped ids
    assert int(merged.kf_prev[3]) == 2          # old prev 0 -> 2
    assert int(merged.kf_feat_lm[2, 0]) == 11   # old lm 6 -> 11
    assert int(merged.lm_ref_kf[5]) == 3        # old ref 1 -> 3


def test_atlas_lost_and_merge_e2e():
    """Track a sequence, force a LOST -> new map, keep tracking, then let
    place recognition weld the stashed map back. The final trajectory over
    BOTH generations must be metrically consistent."""
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    fwd = camera_path(24, step=0.05)
    seq = fwd + fwd[-2::-1]          # out and back over the same ground

    ocfg = frontend.OrbConfig(n_features=300, n_levels=4)
    descs = []
    for R, t in seq[::6]:
        f = frontend.extract_orb(jnp.asarray(world.render(R, t), jnp.float32),
                                 ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=6, depth=3, iters=3)

    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    tr = tracking.Tracker(cam, cfg, voc=voc)

    cut = len(fwd)                    # force the map break at the turn
    states = []
    for i, (R, t) in enumerate(seq):
        if i == cut:
            assert tr.n_kf_host >= 3
            tr.create_map_in_atlas()  # stand-in for 60 lost frames
            assert len(tr.stash) == 1 and tr.state == "NOT_INITIALIZED"
        img = world.render(R, t)
        state, pose = tr.track_mono(jnp.asarray(img, jnp.float32),
                                    ts=float(i))
        states.append(state)

    assert any(st.merged_into_gen >= 0 for st in tr.stash), \
        "stashed map was never merged back"
    ok = sum(1 for s in states if s == "OK")
    assert ok > 0.7 * len(states), (ok, len(states))

    traj = tr.trajectory_world()
    assert len(traj) > 0.7 * len(seq)
    est, gt = [], []
    for ts, p in traj:
        i = int(round(ts))
        R, t = seq[i]
        gt.append(-(R.T @ t))
        est.append(p)
    rmse, s, _, _ = alignment.ate_rmse(
        jnp.asarray(np.asarray(est), jnp.float32),
        jnp.asarray(np.asarray(gt), jnp.float32), with_scale=True)
    extent = 24 * 0.05
    assert float(rmse) < 0.08 * extent, (float(rmse), extent)


def test_atlas_save_load_revisit_merge(tmp_path):
    """Whole-Atlas persistence e2e (reference SaveAtlas/LoadAtlas +
    PostLoad, System.cc:1384-1504): track, stash a map, SAVE the atlas,
    reload it into a FRESH tracker, keep tracking over old ground, and the
    stashed map must still merge back — stash, databases and trajectory all
    survive the round trip."""
    from morb_slam_tpu.io import serialization

    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    fwd = camera_path(24, step=0.05)
    seq = fwd + fwd[-2::-1]

    ocfg = frontend.OrbConfig(n_features=300, n_levels=4)
    descs = []
    for R, t in seq[::6]:
        f = frontend.extract_orb(jnp.asarray(world.render(R, t), jnp.float32),
                                 ocfg)
        descs.append(np.asarray(f.desc)[np.asarray(f.valid)])
    voc = tree.train(np.concatenate(descs), k=6, depth=3, iters=3)

    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=500,
                                 max_kf=64, max_lm=8000, n_levels=4,
                                 min_init_matches=60, min_init_points=40)
    tr = tracking.Tracker(cam, cfg, voc=voc)

    cut = len(fwd)
    for i, (R, t) in enumerate(seq[:cut + 6]):
        if i == cut:
            tr.create_map_in_atlas()
        img = world.render(R, t)
        tr.track_mono(jnp.asarray(img, jnp.float32), ts=float(i))
    assert len(tr.stash) == 1
    tr.flush()                      # resolve the pipelined pending frame
    n_traj_before = len(tr.trajectory)

    path = str(tmp_path / "atlas")
    serialization.save_atlas(path, tr, voc=voc)

    # fresh tracker; restore everything
    tr2 = tracking.Tracker(cam, cfg, voc=voc)
    serialization.load_atlas(path, tr2, voc=voc)
    assert len(tr2.stash) == 1
    assert tr2.map_gen == tr.map_gen
    assert len(tr2.trajectory) == n_traj_before
    assert tr2.stash[0].db is not None
    # restored db must be queryable for merging; the loader put the session
    # into RECENTLY_LOST, so it relocalizes into the restored active map
    assert tr2.state == "RECENTLY_LOST"
    states = []
    for i, (R, t) in enumerate(seq[cut + 6:], start=cut + 6):
        img = world.render(R, t)
        state, _ = tr2.track_mono(jnp.asarray(img, jnp.float32),
                                  ts=float(i))
        states.append(state)
    merged = any(st.merged_into_gen >= 0 for st in tr2.stash)
    assert merged, "restored stash never merged on revisit"
    # resolved trajectory spans BOTH generations after the merge
    traj = tr2.trajectory_world()
    assert len(traj) > 0.5 * len(seq)
