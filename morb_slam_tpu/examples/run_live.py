"""Live-camera / video-stream runner.

TPU-native counterpart of the reference's live-capture example mains
(/root/reference/Examples/Monocular/mono_realsense_D435i.cc and friends,
CMakeLists.txt:202-325): the reference grabs frames from librealsense2; a
TPU host has no RealSense stack, so this CLI captures through OpenCV's
VideoCapture — a V4L2 device index ("0"), GStreamer pipeline, RTSP URL, or
a plain video FILE (which also makes the path testable offline) — and feeds
the same System facade. Frames are timestamped from the capture clock
(CAP_PROP_POS_MSEC when the source provides it, wall clock otherwise).

Usage:
  python -m morb_slam_tpu.examples.run_live \
      --source 0 --settings cam.yaml [--vocab voc.npz] \
      [--max-frames 1000] [--traj traj_tum.txt] [--map-ply map.ply]
"""
from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", required=True,
                   help="VideoCapture source: device index, URL or file")
    p.add_argument("--settings", required=True, help="settings YAML")
    p.add_argument("--vocab", default=None, help="vocabulary .npz")
    p.add_argument("--traj", default=None, help="TUM trajectory output")
    p.add_argument("--map-ply", default=None, help="map point-cloud dump")
    p.add_argument("--save-atlas", default=None)
    p.add_argument("--max-frames", type=int, default=None)
    p.add_argument("--gray", action="store_true", default=True,
                   help="convert to grayscale (default)")
    p.add_argument("--max-kf", type=int, default=None)
    p.add_argument("--max-lm", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    import cv2
    import numpy as np

    from .. import system as system_mod, viz
    from ..utils import verbose

    verbose.set_level(verbose.Level.NORMAL)
    src = int(args.source) if args.source.isdigit() else args.source
    cap = cv2.VideoCapture(src)
    if not cap.isOpened():
        print(f"cannot open capture source {args.source!r}",
              file=sys.stderr)
        return 1

    overrides = {}
    if args.max_kf:
        overrides["max_kf"] = args.max_kf
    if args.max_lm:
        overrides["max_lm"] = args.max_lm
    slam = system_mod.System(args.settings, system_mod.Sensor.MONOCULAR,
                             vocabulary_path=args.vocab,
                             tracker_overrides=overrides or None)

    t_wall0 = time.perf_counter()
    n = 0
    n_ok = 0
    state = "NO_IMAGES"
    while args.max_frames is None or n < args.max_frames:
        ok, frame = cap.read()
        if not ok:
            break
        if frame.ndim == 3:
            frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        pos_ms = cap.get(cv2.CAP_PROP_POS_MSEC)
        ts = pos_ms * 1e-3 if pos_ms and pos_ms > 0 else \
            time.perf_counter() - t_wall0
        state, _ = slam.track_monocular(
            np.ascontiguousarray(frame), ts)
        n_ok += state == "OK"
        n += 1
        if n % 100 == 0:
            fps = n / (time.perf_counter() - t_wall0)
            verbose.print_mess(f"frame {n} state={state} fps={fps:.1f}")
    cap.release()
    if n == 0:
        print("no frames captured", file=sys.stderr)
        return 1

    if args.traj:
        slam.save_trajectory_tum(args.traj)
    if args.map_ply:
        viz.write_ply(args.map_ply, slam.tracker.m)
    if args.save_atlas:
        slam.save_atlas(args.save_atlas)
    print(json.dumps({
        "frames": n, "ok_frames": int(n_ok), "final_state": state,
        "fps": round(n / (time.perf_counter() - t_wall0), 2),
        "keyframes": int(slam.tracker.n_kf_host)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
