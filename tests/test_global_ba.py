"""Tests for the implicit-Schur PCG bundle adjustment and full-map GBA.

Covers the scalable GBA path (reference Optimizer::GlobalBundleAdjustemnt +
the detached-thread correction, LoopClosing.cc:2284) and the 4-DoF essential
graph (Optimizer::OptimizeEssentialGraph4DoF)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from morb_slam_tpu import lie
from morb_slam_tpu.optim import ba, pose_graph


def _synthetic_problem(K=8, L=200, noise=0.01, pose_noise=0.03, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 9], (L, 3)), jnp.float32)
    xis = [jnp.asarray([0.3 * k, 0.02 * k, 0, 0, 0.03 * k, 0], jnp.float32)
           for k in range(K)]
    Rs, ts = zip(*[lie.se3_exp(x) for x in xis])
    R = jnp.stack(Rs)
    t = jnp.stack(ts)
    obs_kf = jnp.repeat(jnp.arange(K), L)
    obs_lm = jnp.tile(jnp.arange(L), K)
    Xc = jax.vmap(lambda Rk, tk: lie.se3_apply(Rk, tk, X))(R, t)
    uv = (Xc[..., :2] / Xc[..., 2:3]).reshape(K * L, 2)
    uv = uv + jnp.asarray(rng.normal(0, noise / 460.0, uv.shape), jnp.float32)

    # perturb initial guesses
    dR, dt = lie.se3_exp(jnp.asarray(
        rng.normal(0, pose_noise, (K, 6)), jnp.float32))
    R0, t0 = lie.se3_mul(dR, dt, R, t)
    R0 = R0.at[0].set(R[0])
    t0 = t0.at[0].set(t[0])
    R0 = R0.at[1].set(R[1])
    t0 = t0.at[1].set(t[1])
    X0 = X + jnp.asarray(rng.normal(0, 0.05, (L, 3)), jnp.float32)

    prob = ba.make_problem(
        R0, t0, X0, obs_kf, obs_lm, uv,
        jnp.full(K * L, 460.0 ** 2), jnp.ones(K * L, bool),
        jnp.ones(K, bool).at[:2].set(False), jnp.ones(L, bool))
    return prob, (R, t, X)


def test_pcg_matches_dense_schur():
    """ba_solve_pcg must reach the same cost basin as the dense-B solver."""
    prob, _ = _synthetic_problem()
    _, _, _, info_d = ba.ba_solve(prob, n_iters=8)
    _, _, _, info_p = ba.ba_solve_pcg(prob, n_iters=8, cg_iters=50)
    dense_final = float(info_d["costs"][-1])
    pcg_final = float(info_p["costs"][-1])
    assert pcg_final < float(info_p["cost0"]) * 0.05
    assert pcg_final < dense_final * 3.0 + 1e-8


def test_pcg_recovers_poses():
    prob, (R_gt, t_gt, X_gt) = _synthetic_problem()
    Rn, tn, Xn, _ = ba.ba_solve_pcg(prob, n_iters=10, cg_iters=60)
    # camera centers error (gauge pinned by the two fixed KFs)
    c_gt = -jnp.einsum('kij,ki->kj', jnp.swapaxes(R_gt, 1, 2), t_gt)
    c_est = -jnp.einsum('kij,ki->kj', jnp.swapaxes(Rn, 1, 2), tn)
    err = float(jnp.max(jnp.linalg.norm(c_gt - c_est, axis=-1)))
    assert err < 0.01, err


def test_inv6x6():
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.normal(0, 1, (5, 6, 6)), jnp.float32)
    M = jnp.einsum('kab,kcb->kac', A, A) + 0.1 * jnp.eye(6)
    Mi = ba._inv6x6(M)
    eye = jnp.einsum('kab,kbc->kac', M, Mi)
    assert float(jnp.max(jnp.abs(eye - jnp.eye(6)))) < 1e-3


def test_global_ba_improves_map():
    """global_bundle_adjustment on a perturbed MapState reduces reprojection
    cost and moves keyframes toward ground truth."""
    from morb_slam_tpu.mapstate import state as ms
    from morb_slam_tpu.pipeline import global_ba, local_mapping

    rng = np.random.default_rng(1)
    K_cap, F_cap, L_cap = 8, 128, 512
    n_pts = 300
    m = ms.empty_map(K_cap, F_cap, L_cap)
    X = jnp.asarray(rng.uniform([-2, -2, 4], [2, 2, 9], (n_pts, 3)),
                    jnp.float32)

    kf_R, kf_t, feat_lm_all = [], [], []
    for k in range(6):
        R, t = lie.se3_exp(jnp.asarray(
            [0.3 * k, 0, 0, 0, 0.04 * k, 0], jnp.float32))
        Xc = lie.se3_apply(R, t, X)
        uv = Xc[:, :2] / Xc[:, 2:3]
        sel = rng.choice(n_pts, F_cap, replace=False)
        m = m._replace(
            kf_R=m.kf_R.at[k].set(R), kf_t=m.kf_t.at[k].set(t),
            kf_valid=m.kf_valid.at[k].set(True),
            kf_feat_xn=m.kf_feat_xn.at[k].set(uv[sel]),
            kf_feat_valid=m.kf_feat_valid.at[k].set(True),
            kf_feat_lm=m.kf_feat_lm.at[k].set(sel.astype(np.int32)),
        )
        kf_R.append(R)
        kf_t.append(t)
    m = m._replace(
        lm_pos=m.lm_pos.at[:n_pts].set(
            X + jnp.asarray(rng.normal(0, 0.05, (n_pts, 3)), jnp.float32)),
        lm_valid=m.lm_valid.at[:n_pts].set(True),
        n_kf=jnp.asarray(6), n_lm=jnp.asarray(n_pts))
    # perturb poses 1..5 (KF0 is the gauge anchor)
    dR, dt = lie.se3_exp(jnp.asarray(
        rng.normal(0, 0.02, (K_cap, 6)), jnp.float32))
    Rp, tp = lie.se3_mul(dR, dt, m.kf_R, m.kf_t)
    m = m._replace(kf_R=m.kf_R.at[1:6].set(Rp[1:6]),
                   kf_t=m.kf_t.at[1:6].set(tp[1:6]))

    cfg = local_mapping.LocalMapConfig(focal=460.0)
    m2, info = global_ba.global_bundle_adjustment(m, cfg, n_iters=8,
                                                  cg_iters=50)
    assert float(info["costs"][-1]) < float(info["cost0"]) * 0.05
    for k in range(1, 6):
        dRk = jnp.einsum('ab,cb->ac', m2.kf_R[k], kf_R[k])
        ang = float(jnp.arccos(jnp.clip((jnp.trace(dRk) - 1) / 2, -1, 1)))
        assert ang < 0.01, (k, ang)


def _ring_graph(n=12, drift_yaw=0.3, four_dof=False):
    """Circular trajectory with accumulated yaw drift; a loop edge closes
    node n-1 against node 0."""
    f32 = jnp.float32
    one = jnp.asarray(1.0, f32)
    # ground truth: poses around a circle (yaw-only rotations)
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False)
    R_gt, t_gt = [], []
    for a in angles:
        xi = jnp.asarray([np.cos(a) * 2, np.sin(a) * 2, 0, 0, 0, a], f32)
        R, t = lie.se3_exp(xi)
        R_gt.append(R)
        t_gt.append(t)
    R_gt = jnp.stack(R_gt)
    t_gt = jnp.stack(t_gt)

    # odometry with per-step yaw drift
    drift = jnp.asarray([0, 0, 0, 0, 0, drift_yaw / n, 0], f32)
    s = jnp.ones(n, f32)
    R_est, t_est = [R_gt[0]], [t_gt[0]]
    for k in range(1, n):
        # true relative
        sij, Rij, tij = pose_graph.relative_sim3(
            one, R_gt[k], t_gt[k], one, R_gt[k - 1], t_gt[k - 1])
        ds, dR, dt = lie.sim3_exp(drift * k)
        _, Rij_d, tij_d = lie.sim3_mul(ds, dR, dt, sij, Rij, tij)
        Rk, tk = lie.se3_mul(Rij_d, tij_d, R_est[-1], t_est[-1])
        R_est.append(Rk)
        t_est.append(tk)
    R_est = jnp.stack(R_est)
    t_est = jnp.stack(t_est)

    e_i = jnp.arange(1, n, dtype=jnp.int32)
    e_j = jnp.arange(0, n - 1, dtype=jnp.int32)
    meas = [pose_graph.relative_sim3(one, R_gt[i], t_gt[i],
                                     one, R_gt[j], t_gt[j])
            for i, j in zip(range(1, n), range(n - 1))]
    # loop edge: n-1 vs 0, true relative
    loop = pose_graph.relative_sim3(one, R_gt[n - 1], t_gt[n - 1],
                                    one, R_gt[0], t_gt[0])
    e_i = jnp.concatenate([e_i, jnp.asarray([n - 1], jnp.int32)])
    e_j = jnp.concatenate([e_j, jnp.asarray([0], jnp.int32)])
    es = jnp.asarray([float(x[0]) for x in meas] + [float(loop[0])], f32)
    eR = jnp.stack([x[1] for x in meas] + [loop[1]])
    et = jnp.stack([x[2] for x in meas] + [loop[2]])
    g = pose_graph.PoseGraph(
        s=s, R=R_est, t=t_est, edge_i=e_i, edge_j=e_j,
        edge_s=es, edge_R=eR, edge_t=et,
        edge_w=jnp.ones(e_i.shape[0], f32),
        fixed=jnp.zeros(n, bool).at[0].set(True))
    return g, (R_gt, t_gt)


def test_pose_graph_4dof_corrects_yaw_drift():
    g, (R_gt, t_gt) = _ring_graph()
    s, R, t, costs = pose_graph.optimize(g, n_iters=20, four_dof=True)
    assert float(costs[-1]) < float(costs[0]) * 1e-3
    # scale untouched
    assert float(jnp.max(jnp.abs(s - 1.0))) < 1e-5
    # poses recovered
    for k in (3, 7, 11):
        dRk = jnp.einsum('ab,cb->ac', R[k], R_gt[k])
        ang = float(jnp.arccos(jnp.clip((jnp.trace(dRk) - 1) / 2, -1, 1)))
        assert ang < 0.01, (k, ang)


def test_pose_graph_4dof_preserves_roll_pitch():
    """The 4-DoF update must never rotate nodes out of the horizontal plane
    even when residuals suggest it."""
    g, _ = _ring_graph()
    # corrupt one measurement with a roll component
    eR = g.edge_R.at[4].set(
        lie.matmat(lie.so3_exp(jnp.asarray([0.1, 0, 0], jnp.float32)),
                   g.edge_R[4]))
    g = g._replace(edge_R=eR)
    s, R, t, _ = pose_graph.optimize(g, n_iters=15, four_dof=True)
    # all node z-axes must still be world-z (yaw-only rotations)
    z_axes = R[:, 2, 2]
    assert float(jnp.min(z_axes)) > 0.9999
