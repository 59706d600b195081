"""Inertial optimization: IMU initialization (scale / gravity / bias /
velocities) and the inertial residual used by visual-inertial BA.

TPU-native replacement for the reference's Optimizer::InertialOptimization
overloads (/root/reference/src/Optimizer.cc:2979,3158,3316) and the
EdgeInertialGS 9-dof preintegration residual with gravity+scale vertices
(G2oTypes.h:548): one Gauss-Newton program over
{R_wg (2-dof), log s, bg, ba, v_0..v_K} with autodiff Jacobians, poses held
fixed at their visual estimates — the classic Martinelli/Campos
initialization the reference implements in LocalMapping::InitializeIMU
(LocalMapping.cc:1131).

Body frame == camera frame is assumed at this layer; callers apply T_bc
up front (EuRoC plumbing carries it through ImuCalib).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import imu as imu_mod
from .. import lie

G = 9.81


class KfImu(NamedTuple):
    """Per-keyframe preintegration from the previous KF (index-aligned with
    keyframes; entry k describes the IMU between prev(k) and k).

    valid: (K,) bool — has a preintegration AND a valid prev.
    prev: (K,) int32.
    dt: (K,); dR: (K,3,3); dV, dP: (K,3)
    J_Rg, J_Vg, J_Va, J_Pg, J_Pa: (K,3,3) bias Jacobians
    info: (K,9,9) information of [r_R, r_v, r_p]
    bias0: (K,6) integration bias
    rw_info: (K,6) diag information of the bias random walk over this edge
      (reference EdgeGyroRW/EdgeAccRW info = C.block(9..15).inverse())
    """
    valid: jnp.ndarray
    prev: jnp.ndarray
    dt: jnp.ndarray
    dR: jnp.ndarray
    dV: jnp.ndarray
    dP: jnp.ndarray
    J_Rg: jnp.ndarray
    J_Vg: jnp.ndarray
    J_Va: jnp.ndarray
    J_Pg: jnp.ndarray
    J_Pa: jnp.ndarray
    info: jnp.ndarray
    bias0: jnp.ndarray
    rw_info: jnp.ndarray


def empty_kf_imu(max_kf: int) -> KfImu:
    f32 = jnp.float32
    eye = jnp.broadcast_to(jnp.eye(3, dtype=f32), (max_kf, 3, 3)).copy()
    z3 = jnp.zeros((max_kf, 3), f32)
    z33 = jnp.zeros((max_kf, 3, 3), f32)
    return KfImu(valid=jnp.zeros(max_kf, bool),
                 prev=jnp.full(max_kf, -1, jnp.int32),
                 dt=jnp.zeros(max_kf, f32), dR=eye, dV=z3, dP=z3,
                 J_Rg=z33, J_Vg=z33, J_Va=z33, J_Pg=z33, J_Pa=z33,
                 info=jnp.broadcast_to(jnp.eye(9, dtype=f32),
                                       (max_kf, 9, 9)).copy(),
                 bias0=jnp.zeros((max_kf, 6), f32),
                 rw_info=jnp.ones((max_kf, 6), f32))


def set_kf_imu(ki: KfImu, k, pre: imu_mod.Preintegrated, prev) -> KfImu:
    info = jnp.linalg.inv(pre.C[:9, :9]
                          + 1e-9 * jnp.eye(9, dtype=pre.C.dtype))
    info = 0.5 * (info + info.T)
    rw = 1.0 / jnp.clip(jnp.diagonal(pre.C[9:, 9:]), 1e-12, None)
    return ki._replace(
        valid=ki.valid.at[k].set(pre.dt > 1e-6),
        prev=ki.prev.at[k].set(prev),
        dt=ki.dt.at[k].set(pre.dt),
        dR=ki.dR.at[k].set(pre.dR), dV=ki.dV.at[k].set(pre.dV),
        dP=ki.dP.at[k].set(pre.dP),
        J_Rg=ki.J_Rg.at[k].set(pre.J_Rg), J_Vg=ki.J_Vg.at[k].set(pre.J_Vg),
        J_Va=ki.J_Va.at[k].set(pre.J_Va), J_Pg=ki.J_Pg.at[k].set(pre.J_Pg),
        J_Pa=ki.J_Pa.at[k].set(pre.J_Pa),
        info=ki.info.at[k].set(info),
        bias0=ki.bias0.at[k].set(pre.bias),
        rw_info=ki.rw_info.at[k].set(rw))


def splice_kf_imu(dst: KfImu, src: KfImu, off, n) -> KfImu:
    """Copy src's first `n` per-KF preintegration entries into dst at
    offset `off`, remapping prev-KF links by +off (Atlas merge: the stashed
    map's inertial chain must ride along with its keyframes — reference
    MergeLocal splices mPrevKF/mpImuPreintegrated chains)."""
    K = dst.valid.shape[0]
    idx = jnp.arange(K)
    take = (idx >= off) & (idx < off + n)
    s = jnp.clip(idx - off, 0, src.valid.shape[0] - 1)
    out = {}
    for name in KfImu._fields:
        d = getattr(dst, name)
        a = getattr(src, name)[s]
        if name == "prev":
            a = jnp.where(a >= 0, a + off, -1)
        shp = (K,) + (1,) * (d.ndim - 1)
        out[name] = jnp.where(take.reshape(shp), a, d)
    return KfImu(**out)


def compose_preintegration(dt1, dR1, dV1, dP1, J1, info1, rw1,
                           dt2, dR2, dV2, dP2, J2, info2, rw2):
    """Analytically compose two consecutive preintegration blocks 1 (i->j)
    and 2 (j->k) into one block (i->k) — the reference re-integrates raw
    measurements on keyframe culling (Preintegrated::MergePrevious,
    ImuTypes.cc:248); here the stored deltas/Jacobians/covariances compose
    in closed form. J1/J2 are dicts with Rg/Vg/Va/Pg/Pa.

    The bias-Jacobian cross terms use the small-rotation approximation
    dR2(t) ~ I inside the block-2 integral (culled keyframes are temporally
    adjacent); the error is second-order in (rotation x bias delta).
    """
    dt = dt1 + dt2
    dR = lie.matmat(dR1, dR2)
    dV = dV1 + lie.matvec(dR1, dV2)
    dP = dP1 + dV1 * dt2 + lie.matvec(dR1, dP2)
    dR2T = jnp.swapaxes(dR2, -1, -2)
    hV2 = lie.so3_hat(dV2)
    hP2 = lie.so3_hat(dP2)
    J = {
        "Rg": lie.matmat(dR2T, J1["Rg"]) + J2["Rg"],
        "Va": J1["Va"] + lie.matmat(dR1, J2["Va"]),
        "Vg": (J1["Vg"] + lie.matmat(dR1, J2["Vg"])
               - lie.matmat(dR1, lie.matmat(hV2, J1["Rg"]))),
        "Pa": J1["Pa"] + J1["Va"] * dt2 + lie.matmat(dR1, J2["Pa"]),
        "Pg": (J1["Pg"] + J1["Vg"] * dt2 + lie.matmat(dR1, J2["Pg"])
               - lie.matmat(dR1, lie.matmat(hP2, J1["Rg"]))),
    }
    # covariance composition: C = A C1 A^T + T C2 T^T
    f32 = dR1.dtype
    eye3 = jnp.eye(3, dtype=f32)
    z3 = jnp.zeros((3, 3), f32)
    A = jnp.block([[dR2T, z3, z3],
                   [-lie.matmat(dR1, hV2), eye3, z3],
                   [-lie.matmat(dR1, hP2), dt2 * eye3, eye3]])
    T = jnp.block([[eye3, z3, z3], [z3, dR1, z3], [z3, z3, dR1]])
    eps = 1e-9 * jnp.eye(9, dtype=f32)
    C1 = jnp.linalg.inv(info1 + eps)
    C2 = jnp.linalg.inv(info2 + eps)
    C = (jnp.einsum('ab,bc,dc->ad', A, C1, A, precision='highest')
         + jnp.einsum('ab,bc,dc->ad', T, C2, T, precision='highest'))
    info = jnp.linalg.inv(C + eps)
    info = 0.5 * (info + info.T)
    # random-walk variances add
    rw = 1.0 / (1.0 / jnp.clip(rw1, 1e-12, None)
                + 1.0 / jnp.clip(rw2, 1e-12, None))
    return dt, dR, dV, dP, J, info, rw


def merge_entry_into_next(ki: KfImu, k, nxt) -> KfImu:
    """Merge preintegration entry `k` (prev(k) -> k) into entry `nxt`
    (k -> nxt), producing entry nxt = prev(k) -> nxt; entry k invalidates.
    Used when keyframe k is culled."""
    J1 = {"Rg": ki.J_Rg[k], "Vg": ki.J_Vg[k], "Va": ki.J_Va[k],
          "Pg": ki.J_Pg[k], "Pa": ki.J_Pa[k]}
    J2 = {"Rg": ki.J_Rg[nxt], "Vg": ki.J_Vg[nxt], "Va": ki.J_Va[nxt],
          "Pg": ki.J_Pg[nxt], "Pa": ki.J_Pa[nxt]}
    dt, dR, dV, dP, J, info, rw = compose_preintegration(
        ki.dt[k], ki.dR[k], ki.dV[k], ki.dP[k], J1, ki.info[k],
        ki.rw_info[k],
        ki.dt[nxt], ki.dR[nxt], ki.dV[nxt], ki.dP[nxt], J2, ki.info[nxt],
        ki.rw_info[nxt])
    return ki._replace(
        valid=ki.valid.at[k].set(False),
        prev=ki.prev.at[nxt].set(ki.prev[k]),
        dt=ki.dt.at[nxt].set(dt),
        dR=ki.dR.at[nxt].set(dR),
        dV=ki.dV.at[nxt].set(dV),
        dP=ki.dP.at[nxt].set(dP),
        J_Rg=ki.J_Rg.at[nxt].set(J["Rg"]),
        J_Vg=ki.J_Vg.at[nxt].set(J["Vg"]),
        J_Va=ki.J_Va.at[nxt].set(J["Va"]),
        J_Pg=ki.J_Pg.at[nxt].set(J["Pg"]),
        J_Pa=ki.J_Pa.at[nxt].set(J["Pa"]),
        info=ki.info.at[nxt].set(info),
        rw_info=ki.rw_info.at[nxt].set(rw))


def _corrected_deltas(ki: KfImu, bg, ba):
    """Bias-corrected preintegration deltas for every KF entry."""
    dbg = bg[None, :] - ki.bias0[:, :3]
    dba = ba[None, :] - ki.bias0[:, 3:]
    dR = lie.matmat(ki.dR, lie.so3_exp(lie.matvec(ki.J_Rg, dbg)))
    dV = ki.dV + lie.matvec(ki.J_Vg, dbg) + lie.matvec(ki.J_Va, dba)
    dP = ki.dP + lie.matvec(ki.J_Pg, dbg) + lie.matvec(ki.J_Pa, dba)
    return dR, dV, dP


def inertial_residuals(ki: KfImu, R_wb, p_wb, v, bg, ba, g_world, scale):
    """9-dim preintegration residuals for all KF pairs (reference
    EdgeInertialGS::computeError, G2oTypes.h:548).

    R_wb: (K,3,3) body->world rotations; p_wb: (K,3) body positions (the
    *visual* map positions — scaled by `scale` inside); v: (K,3).
    """
    prev = jnp.clip(ki.prev, 0, None)
    dR, dV, dP = _corrected_deltas(ki, bg, ba)
    Ri = R_wb[prev]
    Rj = R_wb
    pi = p_wb[prev] * scale
    pj = p_wb * scale
    vi = v[prev]
    vj = v
    dt = ki.dt[:, None]
    RiT = jnp.swapaxes(Ri, -1, -2)
    r_R = lie.so3_log(lie.matmat(jnp.swapaxes(dR, -1, -2),
                                 lie.matmat(RiT, Rj)))
    r_v = lie.matvec(RiT, vj - vi - g_world[None, :] * dt) - dV
    r_p = lie.matvec(RiT, pj - pi - vi * dt
                     - 0.5 * g_world[None, :] * dt * dt) - dP
    r = jnp.concatenate([r_R, r_v, r_p], axis=-1)       # (K, 9)
    return jnp.where(ki.valid[:, None], r, 0.0)


@jax.jit
def linear_alignment(ki: KfImu, R_wb, p_wb, kf_valid):
    """Closed-form visual-inertial alignment: the constraints

        s * dp_vis = v_i dt + 1/2 g dt^2 + R_i dP
        v_j = v_i + g dt + R_i dV

    are LINEAR in (s, g, v_0..v_K) — one least-squares solve, no local
    minima (the Martinelli/VINS-Mono initialization; the reference reaches
    the same estimate iteratively inside InertialOptimization).

    Returns (s, g_vis (3,), v (K, 3)).
    """
    K = R_wb.shape[0]
    f32 = R_wb.dtype
    prev = jnp.clip(ki.prev, 0, None)
    w = (ki.valid & kf_valid & kf_valid[prev]).astype(f32)
    dt = ki.dt
    dp = p_wb - p_wb[prev]                       # (K, 3)
    Ri = R_wb[prev]
    RdP = lie.matvec(Ri, ki.dP)
    RdV = lie.matvec(Ri, ki.dV)
    # unknown layout: [s, g(3), v(3K)]
    n = 4 + 3 * K
    eye3 = jnp.eye(3, dtype=f32)

    def rows_p(k):
        A = jnp.zeros((3, n), f32)
        A = A.at[:, 0].set(dp[k])
        A = A.at[:, 1:4].set(-0.5 * dt[k] ** 2 * eye3)
        A = jax.lax.dynamic_update_slice(A, -dt[k] * eye3,
                                         (0, 4 + 3 * prev[k]))
        b = RdP[k]
        return A * w[k], b * w[k]

    def rows_v(k):
        A = jnp.zeros((3, n), f32)
        A = A.at[:, 1:4].set(-dt[k] * eye3)
        A = jax.lax.dynamic_update_slice(A, -eye3, (0, 4 + 3 * prev[k]))
        A = jax.lax.dynamic_update_slice(A, eye3, (0, 4 + 3 * k))
        b = RdV[k]
        return A * w[k], b * w[k]

    ks = jnp.arange(K)
    Ap, bp = jax.vmap(rows_p)(ks)
    Av, bv = jax.vmap(rows_v)(ks)
    A = jnp.concatenate([Ap.reshape(-1, n), Av.reshape(-1, n)])
    b = jnp.concatenate([bp.reshape(-1), bv.reshape(-1)])
    AtA = jnp.einsum('ri,rj->ij', A, A, precision='highest')
    Atb = jnp.einsum('ri,r->i', A, b, precision='highest')
    # anchor unused velocity blocks (w=0 rows leave them unconstrained)
    AtA = AtA + 1e-6 * jnp.eye(n, dtype=f32)
    x = jnp.linalg.solve(AtA, Atb)
    s = x[0]
    g = x[1:4]
    v = x[4:].reshape(K, 3)
    r = jnp.einsum('ri,i->r', A, x, precision='highest') - b
    rms = jnp.sqrt(jnp.sum(r * r) / jnp.clip(jnp.sum(w) * 6.0, 1.0, None))
    return s, g, v, rms


def gravity_rotation(g_vis):
    """R_wg with R_wg @ (0,0,-9.81) ~ g_vis (reference InitializeIMU's
    gravity alignment, LocalMapping.cc:1166-1193)."""
    g0 = jnp.asarray([0.0, 0.0, -1.0], g_vis.dtype)
    gn = g_vis / jnp.clip(jnp.linalg.norm(g_vis), 1e-9, None)
    axis = jnp.cross(g0, gn)
    sin = jnp.clip(jnp.linalg.norm(axis), 0.0, 1.0)
    cos = jnp.dot(g0, gn)
    ang = jnp.arctan2(sin, cos)
    axis = axis / jnp.where(sin < 1e-8, 1.0, sin)
    axis = jnp.where(sin < 1e-8, jnp.asarray([1.0, 0.0, 0.0], g_vis.dtype),
                     axis)
    return lie.so3_exp(axis * ang)


@partial(jax.jit, static_argnames=("n_iters", "opt_scale"))
def inertial_only_optimize(ki: KfImu, R_wb, p_wb, kf_valid,
                           n_iters: int = 30, opt_scale: bool = True,
                           prior_gyro: float = 1e2, prior_acc: float = 1e6,
                           s0=1.0, v0=None, R_wg0=None):
    """Estimate {gravity direction, scale, biases, velocities} with poses
    fixed (reference InertialOptimization, Optimizer.cc:2979; priors follow
    InitializeIMU's priorG/priorA schedule).

    Returns (R_wg (3,3) gravity-alignment rotation, scale, bg, ba, v (K,3),
    final cost). Apply with `apply_gauge`.
    """
    K = R_wb.shape[0]
    f32 = R_wb.dtype

    # params: [phi_g (2), log_s (1), bg (3), ba (3), v (K*3)]
    n_par = 2 + 1 + 6 + 3 * K

    base = jnp.eye(3, dtype=f32) if R_wg0 is None else R_wg0

    def unpack(x):
        phi = jnp.concatenate([x[:2], jnp.zeros(1, f32)])
        R_wg = lie.matmat(lie.so3_exp(phi), base)
        s = jnp.exp(x[2]) if opt_scale else jnp.asarray(1.0, f32)
        bg = x[3:6]
        ba = x[6:9]
        v = x[9:].reshape(K, 3)
        return R_wg, s, bg, ba, v

    g0 = jnp.asarray([0.0, 0.0, -G], f32)

    def residuals(x):
        R_wg, s, bg, ba, v = unpack(x)
        g_world = lie.matvec(R_wg, g0)
        r = inertial_residuals(ki, R_wb, p_wb, v, bg, ba, g_world, s)
        # whiten by sqrt-info via info matmul in the normal equations; here
        # return raw; weights applied in the GN step
        r_bg = bg * jnp.sqrt(prior_gyro)
        r_ba = ba * jnp.sqrt(prior_acc)
        return r, r_bg, r_ba

    w_kf = (ki.valid & kf_valid &
            kf_valid[jnp.clip(ki.prev, 0, None)]).astype(f32)

    # noise floor: the visual poses entering the residuals carry their own
    # error (and early monocular maps have scale drift); without a floor the
    # raw preintegration information (1e6-1e8) lets those systematic errors
    # dominate and the MAP estimate collapses the scale to escape them
    floor = jnp.diag(jnp.asarray(
        [9e-6] * 3 + [1e-4] * 3 + [2.5e-5] * 3, f32))   # sigma .003/.01/.005
    cov_eff = jnp.linalg.inv(ki.info) + floor[None]
    info_eff = jnp.linalg.inv(cov_eff)
    info_eff = 0.5 * (info_eff + jnp.swapaxes(info_eff, -1, -2))

    def cost_of(x):
        r, r_bg, r_ba = residuals(x)
        quad = jnp.einsum('ki,kij,kj->k', r, info_eff, r,
                          precision='highest')
        return jnp.sum(quad * w_kf) + jnp.sum(r_bg ** 2) + jnp.sum(r_ba ** 2)

    def gn_step(x, lam):
        r, r_bg, r_ba = residuals(x)
        Jfun = jax.jacfwd(lambda xx: residuals(xx)[0])
        J = Jfun(x)                                     # (K, 9, n_par)
        JtW = jnp.einsum('kap,kab->kbp', J, info_eff,
                         precision='highest') * w_kf[:, None, None]
        H = jnp.einsum('kbp,kbq->pq', JtW, J, precision='highest')
        g = jnp.einsum('kbp,kb->p', JtW, r, precision='highest')
        # bias priors
        H = H.at[3:6, 3:6].add(prior_gyro * jnp.eye(3, dtype=f32))
        H = H.at[6:9, 6:9].add(prior_acc * jnp.eye(3, dtype=f32))
        g = g.at[3:6].add(prior_gyro * x[3:6])
        g = g.at[6:9].add(prior_acc * x[6:9])
        # absolute floor keeps unconstrained velocity blocks (invalid KFs)
        # from making the solve singular
        H = H + lam * jnp.diag(jnp.maximum(jnp.diagonal(H), 1e-8)) \
            + 1e-4 * jnp.eye(n_par, dtype=f32)
        if not opt_scale:
            H = H.at[2, :].set(0.0).at[:, 2].set(0.0).at[2, 2].set(1.0)
            g = g.at[2].set(0.0)
        dx = -jnp.linalg.solve(H, g)
        return x + dx

    def iteration(carry, _):
        x, lam, cost = carry
        x_new = gn_step(x, lam)
        new_cost = cost_of(x_new)
        accept = new_cost < cost
        x = jnp.where(accept, x_new, x)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 5.0), 1e-9, 1e6)
        return (x, lam, cost), cost

    x0 = jnp.zeros(n_par, f32)
    x0 = x0.at[2].set(jnp.log(jnp.asarray(s0, f32)))
    if v0 is not None:
        x0 = x0.at[9:].set(v0.reshape(-1))
    (x, lam, cost), costs = jax.lax.scan(
        iteration, (x0, jnp.asarray(1e-2, f32), cost_of(x0)), None,
        length=n_iters)
    R_wg, s, bg, ba, v = unpack(x)
    n_edges = jnp.clip(jnp.sum(w_kf), 1.0, None)
    costs = costs / (9.0 * n_edges)     # mean chi2 per residual dim
    return R_wg, s, bg, ba, v, costs


def apply_gauge(kf_R, kf_t, lm_pos, v, R_wg, scale):
    """Rotate the world so gravity is -z and rescale to metric units
    (reference Map::ApplyScaledRotation + LocalMapping.cc:1221): world
    transform T = [s * R_gw | 0]; poses T_cw <- T_cw * T^-1 in the Sim3
    sense. Velocities rotate too.

    Returns (kf_R', kf_t', lm_pos', v').
    """
    R_gw = jnp.swapaxes(R_wg, -1, -2)
    # new world point: X' = s * R_gw X ; camera pose: R' = R R_wg,
    # t' = s * t (so that projection of X' equals projection of X)
    kf_R2 = lie.matmat(kf_R, R_wg[None])
    kf_t2 = kf_t * scale
    lm2 = scale * lie.matvec(R_gw[None], lm_pos)
    # velocities are estimated in METRIC units by inertial_only_optimize
    # (the residual scales positions, not velocities) — rotate only
    v2 = lie.matvec(R_gw[None], v)
    return kf_R2, kf_t2, lm2, v2
