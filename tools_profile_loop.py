"""Break down the mono bench loop's per-frame wall time on the real chip:
image transfer, device-program dispatch, deferred-decision fetch, KF insert
(mapping + loop), and everything else."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))
import numpy as np
import jax, jax.numpy as jnp
from morb_slam_tpu import cameras
from morb_slam_tpu.pipeline import tracking, local_mapping
from synthetic_world import PlaneWorld, camera_path

W, H, FX = 752, 480, 460.0
cam = cameras.pinhole(FX, FX, W / 2, H / 2)
K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
world = PlaneWorld(K, W, H, seed=0)
n_frames = 80
poses = camera_path(n_frames, step=0.05)
frames = [np.clip(world.render(R, t), 0, 255).astype(np.uint8)
          for R, t in poses]
cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                             max_kf=256, max_lm=16384, n_levels=8,
                             min_init_matches=80, min_init_points=50)
tracker = tracking.Tracker(cam, cfg)

acc = {"asarray": 0.0, "track_call": 0.0, "decide": 0.0, "insert": 0.0,
       "mapping": 0.0, "loop": 0.0, "other": 0.0}
counts = {"insert": 0}

orig_decide = tracker._decide_pending
orig_insert = tracker._insert_keyframe
orig_map = local_mapping.mapping_step


def timed_decide(*a, **kw):
    t0 = time.perf_counter()
    r = orig_decide(*a, **kw)
    acc["decide"] += time.perf_counter() - t0
    return r


def timed_insert(*a, **kw):
    t0 = time.perf_counter()
    r = orig_insert(*a, **kw)
    acc["insert"] += time.perf_counter() - t0
    counts["insert"] += 1
    return r


tracker._decide_pending = timed_decide
tracker._insert_keyframe = timed_insert

warmup = 20
t_start = None
frame_times = []
for i, img in enumerate(frames):
    if i == warmup:
        t_start = time.perf_counter()
        for k in acc:
            acc[k] = 0.0
        counts["insert"] = 0
    t0 = time.perf_counter()
    d = jnp.asarray(img)
    t1 = time.perf_counter()
    tracker.track_mono(d, ts=float(i))
    t2 = time.perf_counter()
    if i >= warmup:
        acc["asarray"] += t1 - t0
        frame_times.append(t2 - t0)
tracker.flush()
elapsed = time.perf_counter() - t_start
n_timed = n_frames - warmup
print(f"fps={n_timed/elapsed:.2f}  frame_ms={1e3*elapsed/n_timed:.1f}")
decide_only = acc["decide"] - acc["insert"]
print(f"  asarray: {1e3*acc['asarray']/n_timed:.1f} ms/frame")
print(f"  decide(excl insert): {1e3*decide_only/n_timed:.1f} ms/frame")
print(f"  insert: {1e3*acc['insert']/n_timed:.1f} ms/frame "
      f"({counts['insert']} inserts, "
      f"{1e3*acc['insert']/max(counts['insert'],1):.1f} ms each)")
known = acc["asarray"] + acc["decide"]
print(f"  rest (dispatch+host): {1e3*(elapsed-known)/n_timed:.1f} ms/frame")
ft = np.asarray(frame_times) * 1e3
print(f"  frame ms: p50={np.percentile(ft,50):.1f} "
      f"p90={np.percentile(ft,90):.1f} max={ft.max():.1f}")
