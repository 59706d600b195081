"""Trajectory writers/readers in TUM, EuRoC and KITTI formats.

Replacement for the reference's System::SaveTrajectory{TUM,EuRoC,KITTI} and
SaveKeyFrameTrajectory* (/root/reference/src/System.cc:531,592,623,745,1043):
poses arrive as (ts, R_cw, t_cw) triples; writers emit camera-to-world.
"""
from __future__ import annotations

import numpy as np

from .. import lie
import jax.numpy as jnp


def _to_twc_quat(R_cw, t_cw):
    R = np.asarray(R_cw)
    t = np.asarray(t_cw)
    Rwc = R.T
    twc = -Rwc @ t
    q = np.asarray(lie.rotmat_to_quat(jnp.asarray(Rwc)))
    return twc, q


def write_tum(path, poses):
    """poses: iterable of (ts, R_cw, t_cw). TUM: `ts tx ty tz qx qy qz qw`
    (reference SaveTrajectoryTUM, System.cc:531)."""
    with open(path, "w") as f:
        for ts, R, t in poses:
            twc, q = _to_twc_quat(R, t)
            f.write(f"{ts:.6f} {twc[0]:.7f} {twc[1]:.7f} {twc[2]:.7f} "
                    f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n")


def write_euroc(path, poses):
    """EuRoC: `ts_ns,tx,ty,tz,qw,qx,qy,qz` (reference SaveTrajectoryEuRoC,
    System.cc:623)."""
    with open(path, "w") as f:
        f.write("#timestamp [ns], p_x, p_y, p_z, q_w, q_x, q_y, q_z\n")
        for ts, R, t in poses:
            twc, q = _to_twc_quat(R, t)
            f.write(f"{int(round(ts * 1e9))},{twc[0]:.7f},{twc[1]:.7f},"
                    f"{twc[2]:.7f},{q[3]:.7f},{q[0]:.7f},{q[1]:.7f},"
                    f"{q[2]:.7f}\n")


def write_kitti(path, poses):
    """KITTI: 12 numbers per line, row-major 3x4 T_wc (reference
    SaveTrajectoryKITTI, System.cc:745)."""
    with open(path, "w") as f:
        for ts, R, t in poses:
            Rwc = np.asarray(R).T
            twc = -Rwc @ np.asarray(t)
            M = np.concatenate([Rwc, twc[:, None]], axis=1)
            f.write(" ".join(f"{x:.9e}" for x in M.reshape(-1)) + "\n")


def read_tum(path):
    """-> (ts (N,), pos (N, 3), quat_xyzw (N, 4)). Also reads EuRoC
    ground-truth csv (comma-separated, qw-first) transparently."""
    ts, pos, quat = [], [], []
    for line in open(path):
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        sep = "," if "," in line else None
        p = [float(x) for x in line.split(sep)]
        if len(p) < 8:
            continue
        t = p[0]
        if t > 1e14:   # nanoseconds
            t *= 1e-9
        ts.append(t)
        pos.append(p[1:4])
        if "," in line:
            quat.append([p[5], p[6], p[7], p[4]])   # qw-first -> xyzw
        else:
            quat.append(p[4:8])
    return (np.asarray(ts), np.asarray(pos, np.float64),
            np.asarray(quat, np.float64))


def associate(ts_a, ts_b, max_dt: float = 0.02):
    """Timestamp association (port of reference evaluation/associate.py):
    greedy nearest-neighbour matching within max_dt.

    Returns (idx_a, idx_b) arrays."""
    ia, ib = [], []
    j = 0
    used = np.zeros(len(ts_b), bool)
    for i, t in enumerate(ts_a):
        j = int(np.searchsorted(ts_b, t))
        best, best_dt = -1, max_dt
        for jj in (j - 1, j, j + 1):
            if 0 <= jj < len(ts_b) and not used[jj]:
                dt = abs(ts_b[jj] - t)
                if dt < best_dt:
                    best, best_dt = jj, dt
        if best >= 0:
            used[best] = True
            ia.append(i)
            ib.append(best)
    return np.asarray(ia, np.int64), np.asarray(ib, np.int64)
