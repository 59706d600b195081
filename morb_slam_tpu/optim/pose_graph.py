"""Sim(3)/SE(3) pose-graph optimization (essential graph).

TPU-native replacement for the reference's Optimizer::OptimizeEssentialGraph
(/root/reference/src/Optimizer.cc:1443) and g2o's types_seven_dof_expmap:
Gauss-Newton on the product of Sim(3) poses with per-edge residuals
r_ij = log(S_ij S_jw S_iw^-1), Jacobians from forward-mode autodiff vmapped
over all edges at once, dense normal equations assembled by scatter-add, and
a fixed iteration count. For stereo/RGB-D the scale block is frozen
(reference bFixScale), leaving the SE(3)-like 6-DoF behavior.

At essential-graph sizes (hundreds of nodes, thousands of edges) the dense
(7K, 7K) solve is tiny for the MXU — no sparse bookkeeping.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import linalg as tpu_linalg


class PoseGraph(NamedTuple):
    """Fixed-capacity pose graph.

    s, R, t: (K,), (K, 3, 3), (K, 3) node Sim3 poses S_iw (world -> kf).
    edge_i, edge_j: (E,) int32 endpoints.
    edge_s, edge_R, edge_t: measured relative S_ij (maps j-frame -> i-frame).
    edge_w: (E,) float32 weight (0 = padding).
    fixed: (K,) bool — nodes held constant (loop KF + invalid slots).
    """
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    edge_s: jnp.ndarray
    edge_R: jnp.ndarray
    edge_t: jnp.ndarray
    edge_w: jnp.ndarray
    fixed: jnp.ndarray


def relative_sim3(s_i, R_i, t_i, s_j, R_j, t_j):
    """S_ij = S_iw * S_jw^-1 (measured constraint builder)."""
    sj_inv, Rj_inv, tj_inv = lie.sim3_inv(s_j, R_j, t_j)
    return lie.sim3_mul(s_i, R_i, t_i, sj_inv, Rj_inv, tj_inv)


def _edge_residual(xi_i, xi_j, Si, Sj, Sij, world_side: bool = False):
    """r = log(S_ij * S_jw' * S_iw'^-1), (7,).

    world_side=False: left (camera-frame) update S' = exp(xi) S — the
    standard Sim3 essential graph. world_side=True: right (world-frame)
    update S' = S exp(xi), which makes tangent dims world-aligned so the
    4-DoF variant can free exactly [tx, ty, tz, yaw] (reference
    OptimizeEssentialGraph4DoF's VertexPose4DoF, Optimizer.cc:5163,
    G2oTypes.h:155 parameterizes the same world-frame yaw+translation)."""
    s_i, R_i, t_i = Si
    s_j, R_j, t_j = Sj
    s_ij, R_ij, t_ij = Sij
    ds_i, dR_i, dt_i = lie.sim3_exp(xi_i)
    ds_j, dR_j, dt_j = lie.sim3_exp(xi_j)
    if world_side:
        a = lie.sim3_mul(s_j, R_j, t_j, ds_j, dR_j, dt_j)   # updated S_jw
        b = lie.sim3_mul(s_i, R_i, t_i, ds_i, dR_i, dt_i)   # updated S_iw
    else:
        a = lie.sim3_mul(ds_j, dR_j, dt_j, s_j, R_j, t_j)
        b = lie.sim3_mul(ds_i, dR_i, dt_i, s_i, R_i, t_i)
    b_inv = lie.sim3_inv(*b)
    c = lie.sim3_mul(s_ij, R_ij, t_ij, *a)
    d = lie.sim3_mul(*c, *b_inv)
    return lie.sim3_log(*d)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale", "four_dof"))
def optimize(g: PoseGraph, n_iters: int = 15, fix_scale: bool = False,
             four_dof: bool = False, damping: float = 1e-6):
    """Gauss-Newton essential-graph optimization.

    Returns (s, R, t) updated node poses.
    """
    K = g.s.shape[0]
    E = g.edge_i.shape[0]
    f32 = g.t.dtype

    res_and_jac = jax.vmap(
        lambda Si, Sj, Sij: jax.jacfwd(
            lambda x: _edge_residual(x[:7], x[7:], Si, Sj, Sij,
                                     world_side=four_dof))(
                jnp.zeros(14, f32)),
        in_axes=((0, 0, 0), (0, 0, 0), (0, 0, 0)))
    res_only = jax.vmap(
        lambda Si, Sj, Sij: _edge_residual(
            jnp.zeros(7, f32), jnp.zeros(7, f32), Si, Sj, Sij,
            world_side=four_dof),
        in_axes=((0, 0, 0), (0, 0, 0), (0, 0, 0)))

    free = ~g.fixed
    free_rep = jnp.repeat(free.astype(f32), 7)

    def step(carry, _):
        s, R, t = carry
        Si = (s[g.edge_i], R[g.edge_i], t[g.edge_i])
        Sj = (s[g.edge_j], R[g.edge_j], t[g.edge_j])
        Sij = (g.edge_s, g.edge_R, g.edge_t)
        r = res_only(Si, Sj, Sij)                          # (E, 7)
        J = res_and_jac(Si, Sj, Sij)                       # (E, 7, 14)
        Ji = J[:, :, :7]
        Jj = J[:, :, 7:]
        w = g.edge_w[:, None, None]
        # dense H via block scatter
        H = jnp.zeros((K, 7, K, 7), f32)
        H = H.at[g.edge_i, :, g.edge_i, :].add(
            jnp.einsum('eai,eaj->eij', Ji * w, Ji, precision='highest'))
        H = H.at[g.edge_j, :, g.edge_j, :].add(
            jnp.einsum('eai,eaj->eij', Jj * w, Jj, precision='highest'))
        H = H.at[g.edge_i, :, g.edge_j, :].add(
            jnp.einsum('eai,eaj->eij', Ji * w, Jj, precision='highest'))
        H = H.at[g.edge_j, :, g.edge_i, :].add(
            jnp.einsum('eai,eaj->eij', Jj * w, Ji, precision='highest'))
        b = jnp.zeros((K, 7), f32)
        b = b.at[g.edge_i].add(
            jnp.einsum('eai,ea->ei', Ji * w, r, precision='highest'))
        b = b.at[g.edge_j].add(
            jnp.einsum('eai,ea->ei', Jj * w, r, precision='highest'))
        Hd = H.reshape(7 * K, 7 * K)
        bd = -b.reshape(7 * K)
        Hd = Hd * free_rep[:, None] * free_rep[None, :] + \
            jnp.diag(1.0 - free_rep)
        bd = bd * free_rep
        if four_dof:
            # free dims: rho (0..2) + world yaw (phi_z, index 5); frozen:
            # roll/pitch (3, 4) and scale (6) — reference
            # OptimizeEssentialGraph4DoF for IMU maps where gravity pins
            # roll/pitch and visual-inertial scale is observable
            dmask = jnp.asarray([1, 1, 1, 0, 0, 1, 0], f32)
        elif fix_scale:
            # zero the scale rows/cols (tangent index 6 of each node)
            dmask = jnp.asarray([1.0] * 6 + [0.0], f32)
        else:
            dmask = None
        if dmask is not None:
            sc = jnp.tile(dmask, K)
            Hd = Hd * sc[:, None] * sc[None, :] + jnp.diag(1.0 - sc)
            bd = bd * sc
        Hd = Hd + damping * jnp.eye(7 * K, dtype=f32)
        dx = tpu_linalg.solve_spd(Hd, bd).reshape(K, 7)
        ds, dR, dt = lie.sim3_exp(dx)
        if four_dof:
            s_n, R_n, t_n = lie.sim3_mul(s, R, t, ds, dR, dt)
        else:
            s_n, R_n, t_n = lie.sim3_mul(ds, dR, dt, s, R, t)
        return (s_n, R_n, t_n), jnp.sum(g.edge_w * jnp.sum(r * r, axis=-1))

    (s, R, t), costs = jax.lax.scan(step, (g.s, g.R, g.t), None,
                                    length=n_iters)
    return s, R, t, costs
