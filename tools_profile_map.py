"""Focused trace of mapping_step; map hot ops to source lines."""
import sys, os, time, gzip, json, collections, glob
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
poses = camera_path(60, step=0.05)
frames = [np.clip(world.render(R, t), 0, 255).astype(np.uint8) for R, t in poses]
cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                             max_kf=256, max_lm=16384, n_levels=8,
                             min_init_matches=80, min_init_points=50)
tracker = tracking.Tracker(cam, cfg)
for i, img in enumerate(frames):
    tracker.track_mono(img, ts=float(i))
tracker.flush()
k = tracker.last_kf_id
ms0 = tracker.m

out = local_mapping.mapping_step(ms0, k, cam.params, cam.kind, cfg.lm_cfg)
jax.block_until_ready(out.kf_R)
with jax.profiler.trace('/tmp/maptrace'):
    out = local_mapping.mapping_step(ms0, k, cam.params, cam.kind, cfg.lm_cfg)
    jax.block_until_ready(out.kf_R)

d = sorted(glob.glob('/tmp/maptrace/plugins/profile/*/vm.trace.json.gz'))[-1]
with gzip.open(d) as fh:
    data = json.load(fh)
durs, cnt = collections.Counter(), collections.Counter()
for e in data['traceEvents']:
    if e.get('ph') == 'X' and 'dur' in e and not e['name'].startswith('$'):
        durs[e['name']] += e['dur']; cnt[e['name']] += 1
hot = [n for n, _ in durs.most_common(30)]
for name, dd in durs.most_common(30):
    print(f"{dd/1000:9.3f} ms  x{cnt[name]:4d}  {name[:95]}")

# map to source: mapping_step is a jit; grab inner jaxprs? use compiled text of the top-level
import inspect
f = local_mapping.mapping_step
txt = f.lower(ms0, k, cam.params, cam.kind, cfg.lm_cfg).compile().as_text()
open('/tmp/map_hlo.txt', 'w').write(txt)
import re
for n in hot:
    if n.startswith(('jit_', 'PjitFunction', 'while')):
        continue
    m = re.search(r'%%%s = [^\n]*' % re.escape(n), txt)
    if m:
        line = m.group(0)
        src = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        shape = line.split(' = ')[1].split(' ')[0]
        op = re.search(r'op_name="([^"]+)"', line)
        print(f"{n:28s} {shape[:42]:44s} {src.group(1).split('/')[-1] if src else '?'}:{src.group(2) if src else '?'} {op.group(1)[-60:] if op else ''}")
