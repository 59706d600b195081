"""Profile per-frame tracking + mapping device programs on the real chip."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
import numpy as np
import jax, jax.numpy as jnp
from morb_slam_tpu import cameras
from morb_slam_tpu.pipeline import tracking, local_mapping
from synthetic_world import PlaneWorld, camera_path

W, H, FX = 752, 480, 460.0
cam = cameras.pinhole(FX, FX, W / 2, H / 2)
K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
world = PlaneWorld(K, W, H, seed=0)
n_frames = 60
poses = camera_path(n_frames, step=0.05)
frames = [np.clip(world.render(R, t), 0, 255).astype(np.uint8) for R, t in poses]

cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                             max_kf=256, max_lm=16384, n_levels=8,
                             min_init_matches=80, min_init_points=50)
tracker = tracking.Tracker(cam, cfg)
for i, img in enumerate(frames):
    tracker.track_mono(img, ts=float(i))
tracker.flush()
print("state:", tracker.state, "kfs:", tracker.n_kf_host)

# -- time the raw per-frame device program (track_step), blocked
img = frames[-1]
args = lambda: (img, tracker.m, tracker.last, tracker.last_feat_lm,
                tracker.R_last, tracker.t_last, tracker.vel[0], tracker.vel[1],
                jnp.asarray(True), jnp.asarray(tracker.ref_kf, jnp.int32),
                cam.params, cam.kind, cfg, jnp.asarray(False))
out = tracking.track_step(*args())
jax.block_until_ready(out[4])
t0 = time.perf_counter(); n = 20
for _ in range(n):
    out = tracking.track_step(*args())
jax.block_until_ready(out[4])
print(f"track_step device+dispatch: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

# -- extraction alone
fr = tracking.extract_frame(img, cam.params, cam.kind, cfg)
jax.block_until_ready(fr.desc)
t0 = time.perf_counter()
for _ in range(n):
    fr = tracking.extract_frame(img, cam.params, cam.kind, cfg)
jax.block_until_ready(fr.desc)
print(f"extract_frame: {(time.perf_counter()-t0)/n*1e3:.1f} ms")

# -- mapping_step
k = tracker.last_kf_id
ms0 = tracker.m
out = local_mapping.mapping_step(ms0, k, cam.params, cam.kind, cfg.lm_cfg)
jax.block_until_ready(out.kf_R)
t0 = time.perf_counter(); n2 = 5
for _ in range(n2):
    out = local_mapping.mapping_step(ms0, k, cam.params, cam.kind, cfg.lm_cfg)
    jax.block_until_ready(out.kf_R)
print(f"mapping_step: {(time.perf_counter()-t0)/n2*1e3:.1f} ms")

# -- trace one track_step + one mapping_step
with jax.profiler.trace('/tmp/tracktrace'):
    out = tracking.track_step(*args())
    jax.block_until_ready(out[4])
    out2 = local_mapping.mapping_step(ms0, k, cam.params, cam.kind, cfg.lm_cfg)
    jax.block_until_ready(out2.kf_R)
print("traced")
