"""Benchmark: tracked frames/s of the full monocular SLAM pipeline on the
real device (extraction + matching + pose optimization + keyframe mapping).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference (MORB_SLAM/ORB-SLAM3) sustains real-time 20 fps on
EuRoC-class input on an i7 CPU (BASELINE.md); vs_baseline = fps / 20.

Runs an EuRoC-geometry synthetic sequence (752x480, fx=460, 1200 ORB
features, 8 pyramid levels) rendered on the host; timing covers the
steady-state tracking loop after jit warmup.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from morb_slam_tpu import cameras
    from morb_slam_tpu.pipeline import tracking
    from synthetic_world import PlaneWorld, camera_path

    W, H, FX = 752, 480, 460.0
    cam = cameras.pinhole(FX, FX, W / 2, H / 2)
    K = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
    world = PlaneWorld(K, W, H, seed=0)
    n_frames = 80
    poses = camera_path(n_frames, step=0.05)
    frames = [world.render(R, t) for R, t in poses]

    cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                                 max_kf=256, max_lm=16384, n_levels=8,
                                 min_init_matches=80, min_init_points=50)
    tracker = tracking.Tracker(cam, cfg)

    warmup = 20
    t_start = None
    n_timed = 0
    for i, img in enumerate(frames):
        if i == warmup:
            t_start = time.perf_counter()
        state, pose = tracker.track_mono(jnp.asarray(img, jnp.float32),
                                         ts=float(i))
        if i >= warmup:
            n_timed += 1
    elapsed = time.perf_counter() - t_start
    fps = n_timed / elapsed

    print(json.dumps({
        "metric": "tracked_frames_per_second",
        "value": round(fps, 2),
        "unit": "frames/s (752x480 mono, 1200 ORB, full SLAM loop)",
        "vs_baseline": round(fps / 20.0, 3),
    }))


if __name__ == "__main__":
    main()
