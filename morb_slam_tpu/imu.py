"""IMU preintegration on manifold with bias Jacobians and full covariance.

TPU-native replacement for the reference's IMU::Preintegrated
(/root/reference/src/ImuTypes.cc:107-338, include/ImuTypes.h:136-258): the
per-measurement scalar loop (IntegrateNewMeasurement, ImuTypes.cc:184) becomes
a lax.scan over a fixed-capacity masked measurement buffer, so one jit
compiles for any number of samples per frame. Bias-corrected delta getters
and the covariance/Jacobian recursions follow Forster et al. (the same model
the reference implements).

Conventions: world gravity GRAVITY = (0, 0, -9.81) (reference
ImuTypes.h:42 GRAVITY_VALUE=9.81); bias vector packs [bg(3), ba(3)].
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie

GRAVITY_VALUE = 9.81
GRAVITY = jnp.asarray([0.0, 0.0, -GRAVITY_VALUE], jnp.float32)


class ImuCalib(NamedTuple):
    """IMU calibration (reference IMU::Calib, ImuTypes.h:98).

    Tbc: (R_bc (3,3), t_bc (3,)) camera-to-body transform.
    cov: (6,) discrete noise variances [gyro(3), acc(3)] = (sigma*sqrt(freq))^2
    cov_walk: (6,) discrete random-walk variances [gyro(3), acc(3)]
    """
    R_bc: jnp.ndarray
    t_bc: jnp.ndarray
    cov: jnp.ndarray
    cov_walk: jnp.ndarray


def make_calib(R_bc, t_bc, noise_gyro, noise_acc, walk_gyro, walk_acc,
               freq: float) -> ImuCalib:
    ng = (noise_gyro * jnp.sqrt(freq)) ** 2
    na = (noise_acc * jnp.sqrt(freq)) ** 2
    wg = (walk_gyro / jnp.sqrt(freq)) ** 2
    wa = (walk_acc / jnp.sqrt(freq)) ** 2
    return ImuCalib(
        R_bc=jnp.asarray(R_bc, jnp.float32),
        t_bc=jnp.asarray(t_bc, jnp.float32),
        cov=jnp.concatenate([jnp.full(3, ng), jnp.full(3, na)]).astype(jnp.float32),
        cov_walk=jnp.concatenate([jnp.full(3, wg), jnp.full(3, wa)]).astype(jnp.float32),
    )


class Preintegrated(NamedTuple):
    """Preintegrated IMU deltas between two frames/keyframes.

    dt: () total time; dR: (3,3); dV, dP: (3,)
    C: (15, 15) covariance of [dR, dV, dP, bg_walk, ba_walk]
    J_Rg, J_Vg, J_Va, J_Pg, J_Pa: (3,3) bias Jacobians
    bias: (6,) [bg, ba] used during integration
    avg_a, avg_w: (3,) mean measurements (used by IMU-init quality gates)
    """
    dt: jnp.ndarray
    dR: jnp.ndarray
    dV: jnp.ndarray
    dP: jnp.ndarray
    C: jnp.ndarray
    J_Rg: jnp.ndarray
    J_Vg: jnp.ndarray
    J_Va: jnp.ndarray
    J_Pg: jnp.ndarray
    J_Pa: jnp.ndarray
    bias: jnp.ndarray
    avg_a: jnp.ndarray
    avg_w: jnp.ndarray


@jax.jit
def preintegrate(acc, gyro, dts, mask, bias, calib: ImuCalib,
                 init: "Preintegrated" = None) -> Preintegrated:
    """Integrate a masked batch of IMU samples (reference
    Preintegrated::IntegrateNewMeasurement, ImuTypes.cc:184).

    Jitted at the TOP level: called eagerly, the scan body closes over
    freshly-materialized constant arrays and the eager-scan cache misses
    on every call — measured 1.7 s PER KEYFRAME of silent recompilation
    on the real chip (the round-3 0.44 fps flagship number was mostly
    this).

    Args:
      acc, gyro: (N, 3) raw measurements (body frame).
      dts: (N,) per-sample integration intervals.
      mask: (N,) bool — False entries are skipped (fixed-capacity padding).
      bias: (6,) [bg, ba] integration bias.
      calib: ImuCalib.
      init: optional existing Preintegrated to CONTINUE from (must share
        `bias`) — the incremental per-frame chain the reference keeps in
        mpImuPreintegratedFromLastKF (Tracking.cc:1528).
    """
    f32 = jnp.float32
    # all small matmuls below must stay exact f32 (see lie.py MXU note)
    bg, ba = bias[:3], bias[3:]
    Nga = jnp.diag(calib.cov).astype(f32)            # (6,6)
    NgaWalk = jnp.diag(calib.cov_walk).astype(f32)   # (6,6)

    def step(carry, inp):
        (dt_tot, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w, n) = carry
        a_raw, w_raw, dt, m = inp
        a = a_raw - ba
        w = w_raw - bg
        dt = jnp.where(m, dt, 0.0)
        dt2 = dt * dt

        W_a = lie.so3_hat(a)
        # position/velocity update with current dR (ImuTypes.cc:196-213)
        dP_n = dP + dV * dt + 0.5 * lie.matvec(dR, a) * dt2
        dV_n = dV + lie.matvec(dR, a) * dt

        # covariance propagation: x = [phi, v, p]
        A = jnp.eye(9, dtype=f32)
        B = jnp.zeros((9, 6), dtype=f32)
        dRi = lie.so3_exp(w * dt)
        Jr = lie.so3_right_jacobian(w * dt)
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-dR @ W_a * dt)
        A = A.at[6:9, 0:3].set(-0.5 * dR @ W_a * dt2)
        A = A.at[6:9, 3:6].set(jnp.eye(3, dtype=f32) * dt)
        B = B.at[0:3, 0:3].set(Jr * dt)
        B = B.at[3:6, 3:6].set(dR * dt)
        B = B.at[6:9, 3:6].set(0.5 * dR * dt2)
        C9 = A @ C[:9, :9] @ A.T + B @ Nga @ B.T
        C_n = C.at[:9, :9].set(C9)
        C_n = C_n.at[9:, 9:].add(NgaWalk * dt)

        # bias Jacobians (ImuTypes.cc:221-227)
        JPa_n = JPa + JVa * dt - 0.5 * dR * dt2
        JPg_n = JPg + JVg * dt - 0.5 * (dR @ W_a) @ JRg * dt2
        JVa_n = JVa - dR * dt
        JVg_n = JVg - (dR @ W_a) @ JRg * dt
        JRg_n = dRi.T @ JRg - Jr * dt

        dR_n = _normalize_rotation(dR @ dRi)

        new = (dt_tot + dt, dR_n, dV_n, dP_n, C_n, JRg_n, JVg_n, JVa_n,
               JPg_n, JPa_n, sum_a + a_raw * m, sum_w + w_raw * m,
               n + m.astype(f32))
        old = (dt_tot, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w, n)
        return jax.tree.map(lambda x, y: jnp.where(m, x, y), new, old), None

    eye3 = jnp.eye(3, dtype=f32)
    zeros3 = jnp.zeros(3, f32)
    z33 = jnp.zeros((3, 3), f32)
    if init is None:
        # J_Rg starts at zero (reference Initialize(): JRg = 0)
        carry0 = (jnp.asarray(0.0, f32), eye3, zeros3, zeros3,
                  jnp.zeros((15, 15), f32), z33, z33, z33, z33, z33,
                  zeros3, zeros3, jnp.asarray(0.0, f32))
    else:
        n0 = jnp.asarray(1.0, f32)  # avg trackers restart (unused downstream)
        carry0 = (init.dt, init.dR, init.dV, init.dP, init.C,
                  init.J_Rg, init.J_Vg, init.J_Va, init.J_Pg, init.J_Pa,
                  init.avg_a, init.avg_w, n0)
    with jax.default_matmul_precision("float32"):
        carry, _ = jax.lax.scan(
            step, carry0,
            (acc.astype(f32), gyro.astype(f32), dts.astype(f32), mask))
    (dt_tot, dR, dV, dP, C, JRg, JVg, JVa, JPg, JPa, sum_a, sum_w, n) = carry
    n = jnp.maximum(n, 1.0)
    return Preintegrated(dt=dt_tot, dR=dR, dV=dV, dP=dP, C=C, J_Rg=JRg,
                         J_Vg=JVg, J_Va=JVa, J_Pg=JPg, J_Pa=JPa,
                         bias=bias.astype(f32),
                         avg_a=sum_a / n, avg_w=sum_w / n)


def _normalize_rotation(R):
    """Re-orthonormalize via SVD-free Gram-Schmidt (reference NormalizeRotation
    uses SVD; two GS passes are cheaper and equally stable at f32)."""
    r0 = R[:, 0] / jnp.linalg.norm(R[:, 0])
    r1 = R[:, 1] - jnp.dot(r0, R[:, 1]) * r0
    r1 = r1 / jnp.linalg.norm(r1)
    r2 = jnp.cross(r0, r1)
    return jnp.stack([r0, r1, r2], axis=1)


# ---------------------------------------------------------------------------
# Bias-corrected delta getters (reference ImuTypes.cc:286-319)
# ---------------------------------------------------------------------------

def delta_rotation(p: Preintegrated, bias):
    dbg = bias[:3] - p.bias[:3]
    return _normalize_rotation(
        lie.matmat(p.dR, lie.so3_exp(lie.matvec(p.J_Rg, dbg))))


def delta_velocity(p: Preintegrated, bias):
    dbg = bias[:3] - p.bias[:3]
    dba = bias[3:] - p.bias[3:]
    return p.dV + lie.matvec(p.J_Vg, dbg) + lie.matvec(p.J_Va, dba)


def delta_position(p: Preintegrated, bias):
    dbg = bias[:3] - p.bias[:3]
    dba = bias[3:] - p.bias[3:]
    return p.dP + lie.matvec(p.J_Pg, dbg) + lie.matvec(p.J_Pa, dba)


def predict_state(R_i, p_i, v_i, bias, pre: Preintegrated):
    """IMU dead-reckoning from state i to j (reference
    Tracking::PredictStateIMU, Tracking.cc:1632). Body-frame states."""
    dt = pre.dt
    dR = delta_rotation(pre, bias)
    dV = delta_velocity(pre, bias)
    dP = delta_position(pre, bias)
    R_j = lie.matmat(R_i, dR)
    v_j = v_i + GRAVITY * dt + lie.matvec(R_i, dV)
    p_j = p_i + v_i * dt + 0.5 * GRAVITY * dt * dt + lie.matvec(R_i, dP)
    return R_j, p_j, v_j
