"""ATE evaluation CLI — port of the reference's Python-2 evaluation stack
(/root/reference/evaluation/associate.py + evaluate_ate_scale.py): associate
trajectories by timestamp, Horn/Umeyama alignment (optional scale), report
RMS ATE.

Usage: python -m morb_slam_tpu.eval.ate gt.txt est.txt [--scale]
"""
from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

from .. import alignment
from ..io import trajectory


def evaluate(gt_path: str, est_path: str, with_scale: bool = False,
             max_dt: float = 0.02):
    ts_g, pos_g, _ = trajectory.read_tum(gt_path)
    ts_e, pos_e, _ = trajectory.read_tum(est_path)
    ia, ib = trajectory.associate(ts_g, ts_e, max_dt=max_dt)
    if len(ia) < 2:
        raise ValueError(f"only {len(ia)} associated pairs")
    rmse, s, R, t = alignment.ate_rmse(
        jnp.asarray(pos_e[ib], jnp.float32),
        jnp.asarray(pos_g[ia], jnp.float32), with_scale=with_scale)
    return {"rmse": float(rmse), "scale": float(s), "pairs": int(len(ia))}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("gt")
    ap.add_argument("est")
    ap.add_argument("--scale", action="store_true",
                    help="estimate scale (monocular)")
    ap.add_argument("--max-dt", type=float, default=0.02)
    args = ap.parse_args()
    out = evaluate(args.gt, args.est, with_scale=args.scale,
                   max_dt=args.max_dt)
    print(f"compared_pose_pairs {out['pairs']} pairs")
    print(f"absolute_translational_error.rmse {out['rmse']:.6f} m")
    print(f"scale: {out['scale']:.6f}")


if __name__ == "__main__":
    main()
