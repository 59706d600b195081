"""Visual-inertial BA tests: the inertial window solver must pull noisy
keyframe states (pose/velocity/bias) back to ground truth using IMU
preintegration + reprojection edges, and the per-frame pose-inertial
optimization must refine a perturbed frame state (reference
FullInertialBA/LocalInertialBA/PoseInertialOptimization*, Optimizer.cc:364,
2324, 4391)."""
import jax
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rot

from morb_slam_tpu import imu, lie
from morb_slam_tpu.optim import inertial, vi_ba

FREQ = 200.0
DT = 1.0 / FREQ
CALIB = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5, 3e-3,
                       FREQ)
G0 = np.array([0.0, 0.0, -9.81])


def simulate(T=2.0, bg=np.zeros(3), ba=np.zeros(3)):
    n = int(T / DT)
    ts = np.arange(n + 1) * DT
    p = np.stack([0.8 * np.sin(1.3 * ts), 0.5 * np.sin(0.9 * ts + 1.0),
                  0.3 * np.sin(1.7 * ts)], -1)
    v = np.stack([0.8 * 1.3 * np.cos(1.3 * ts),
                  0.5 * 0.9 * np.cos(0.9 * ts + 1.0),
                  0.3 * 1.7 * np.cos(1.7 * ts)], -1)
    a = np.stack([-0.8 * 1.3 ** 2 * np.sin(1.3 * ts),
                  -0.5 * 0.9 ** 2 * np.sin(0.9 * ts + 1.0),
                  -0.3 * 1.7 ** 2 * np.sin(1.7 * ts)], -1)
    w_body = np.array([0.25, -0.15, 0.2])
    R = np.stack([Rot.from_rotvec(w_body * t).as_matrix() for t in ts])
    acc = np.einsum('nij,nj->ni', R.transpose(0, 2, 1), a - G0[None]) \
        + ba[None]
    gyr = np.tile(w_body, (n + 1, 1)) + bg[None]
    acc_mid = 0.5 * (acc[:-1] + acc[1:])
    gyr_mid = 0.5 * (gyr[:-1] + gyr[1:])
    return ts, p, v, R, acc_mid, gyr_mid


def make_problem(W=8, kf_every=50, n_lm=160, noise_pose=0.0, noise_v=0.0,
                 bg=np.zeros(3), ba=np.zeros(3), bias_init=None, seed=0,
                 px_noise=0.0, focal=400.0, fix_vb_none=False):
    rng = np.random.default_rng(seed)
    ts, p, v, R, acc, gyr = simulate(T=(W * kf_every) * DT + 0.01,
                                     bg=bg, ba=ba)
    idx = np.arange(W) * kf_every
    R_gt = R[idx]
    p_gt = p[idx]
    v_gt = v[idx]

    # preintegrations between consecutive KFs (at the INITIAL bias estimate)
    b_init = np.zeros(6) if bias_init is None else bias_init
    ki = inertial.empty_kf_imu(W)
    for k in range(1, W):
        sl = slice((k - 1) * kf_every, k * kf_every)
        pre = imu.preintegrate(
            jnp.asarray(acc[sl]), jnp.asarray(gyr[sl]),
            jnp.full(kf_every, DT), jnp.ones(kf_every, bool),
            jnp.asarray(b_init, jnp.float32), CALIB)
        ki = inertial.set_kf_imu(ki, k, pre, k - 1)

    # landmarks in front of the trajectory
    X = rng.uniform([-3, -3, 2.5], [3, 3, 9], (n_lm, 3)).astype(np.float32)

    # observations: every KF sees every landmark (mask by depth)
    obs_kf, obs_lm, obs_uv, obs_mask = [], [], [], []
    for k in range(W):
        R_cw = R_gt[k].T
        t_cw = -R_cw @ p_gt[k]
        Xc = X @ R_cw.T + t_cw
        ok = Xc[:, 2] > 0.5
        uv = Xc[:, :2] / Xc[:, 2:3]
        uv = uv + rng.normal(0, px_noise / focal, uv.shape)
        obs_kf.append(np.full(n_lm, k))
        obs_lm.append(np.arange(n_lm))
        obs_uv.append(uv)
        obs_mask.append(ok)
    O = W * n_lm

    # noisy initial states
    dR = Rot.from_rotvec(rng.normal(0, noise_pose, (W, 3))).as_matrix()
    R0 = np.einsum('nij,njk->nik', R_gt, dR)
    p0 = p_gt + rng.normal(0, noise_pose, (W, 3))
    v0 = v_gt + rng.normal(0, noise_v, (W, 3))
    # KF0 anchored at truth
    R0[0], p0[0] = R_gt[0], p_gt[0]

    f32 = jnp.float32
    prob = vi_ba.VIBAProblem(
        R_wb=jnp.asarray(R0, f32), p_wb=jnp.asarray(p0, f32),
        v=jnp.asarray(v0, f32),
        bias=jnp.broadcast_to(jnp.asarray(b_init, f32), (W, 6)),
        fix_pose=jnp.arange(W) == 0,
        fix_vb=jnp.zeros(W, bool) if not fix_vb_none else
        jnp.zeros(W, bool),
        X=jnp.asarray(X), lm_opt=jnp.zeros(n_lm, bool),
        obs_kf=jnp.asarray(np.concatenate(obs_kf), jnp.int32),
        obs_lm=jnp.asarray(np.concatenate(obs_lm), jnp.int32),
        obs_uv=jnp.asarray(np.concatenate(obs_uv), f32),
        obs_ur=jnp.full(O, jnp.nan, f32),
        obs_info=jnp.full(O, focal ** 2, f32),
        obs_mask=jnp.asarray(np.concatenate(obs_mask)),
        baseline=jnp.asarray(0.0, f32),
        e_valid=ki.valid, e_prev=jnp.clip(ki.prev, 0, None),
        e_dt=ki.dt, e_dR=ki.dR, e_dV=ki.dV, e_dP=ki.dP,
        e_JRg=ki.J_Rg, e_JVg=ki.J_Vg, e_JVa=ki.J_Va,
        e_JPg=ki.J_Pg, e_JPa=ki.J_Pa,
        e_info=ki.info, e_bias0=ki.bias0, e_rw_info=ki.rw_info,
        prior_bias_info=jnp.zeros((W, 6), f32),
    )
    gt = dict(R=R_gt, p=p_gt, v=v_gt, X=X, ki=ki)
    return prob, gt


def test_vi_ba_zero_residual_at_truth():
    """At ground-truth states with true (zero) bias, the inertial residuals
    are ~0 and the solver does not move the states."""
    prob, gt = make_problem(W=6, noise_pose=0.0, noise_v=0.0)
    prob = prob._replace(R_wb=jnp.asarray(gt["R"], jnp.float32),
                         p_wb=jnp.asarray(gt["p"], jnp.float32),
                         v=jnp.asarray(gt["v"], jnp.float32))
    r, _ = vi_ba._edge_terms(prob, prob.R_wb, prob.p_wb, prob.v, prob.bias)
    assert float(jnp.abs(r).max()) < 2e-3, float(jnp.abs(r).max())
    R, p, v, b, X, info = vi_ba.vi_ba_solve(prob, n_iters=4)
    assert float(jnp.max(jnp.linalg.norm(p - prob.p_wb, axis=-1))) < 5e-3


def test_vi_ba_recovers_perturbed_states():
    """Perturbed poses + velocities converge back to ground truth."""
    prob, gt = make_problem(W=8, noise_pose=0.03, noise_v=0.15, seed=1)
    R, p, v, b, X, info = vi_ba.vi_ba_solve(prob, n_iters=10)
    err_p0 = np.linalg.norm(np.asarray(prob.p_wb) - gt["p"], axis=-1)
    err_p = np.linalg.norm(np.asarray(p) - gt["p"], axis=-1)
    err_v = np.linalg.norm(np.asarray(v) - gt["v"], axis=-1)
    assert err_p.max() < 0.01, (err_p0.max(), err_p.max())
    assert err_v.max() < 0.05, err_v.max()
    costs = np.asarray(info["costs"])
    assert costs[-1] < float(info["cost0"]), (info["cost0"], costs)


def test_vi_ba_estimates_bias():
    """With biased IMU (preintegrated at zero bias), the solver recovers the
    true gyro/acc bias through the bias-Jacobian corrections."""
    bg = np.array([0.01, -0.008, 0.006])
    ba = np.array([0.05, -0.04, 0.06])
    prob, gt = make_problem(W=10, noise_pose=0.0, noise_v=0.05,
                            bg=bg, ba=ba, seed=2)
    R, p, v, b, X, info = vi_ba.vi_ba_solve(prob, n_iters=12)
    b = np.asarray(b)
    # all KFs agree on the bias (RW edges) and match truth
    np.testing.assert_allclose(b[-1, :3], bg, atol=2e-3)
    np.testing.assert_allclose(b[-1, 3:], ba, atol=0.03)


def test_vi_ba_landmark_refinement():
    """Landmark positions perturbed -> optimizing landmarks + states
    reduces reprojection error."""
    prob, gt = make_problem(W=6, noise_pose=0.01, noise_v=0.1, seed=3)
    rng = np.random.default_rng(9)
    Xn = gt["X"] + rng.normal(0, 0.05, gt["X"].shape).astype(np.float32)
    prob = prob._replace(X=jnp.asarray(Xn),
                         lm_opt=jnp.ones(Xn.shape[0], bool))
    R, p, v, b, X, info = vi_ba.vi_ba_solve(prob, n_iters=10)
    err0 = np.linalg.norm(Xn - gt["X"], axis=-1).mean()
    err1 = np.linalg.norm(np.asarray(X) - gt["X"], axis=-1).mean()
    assert err1 < 0.3 * err0, (err0, err1)


def test_pose_inertial_optimization_refines_frame():
    """Per-frame pose-inertial opt: anchor KF fixed at truth, current frame
    perturbed; visual + inertial edges recover pose AND velocity."""
    ts, p, v, R, acc, gyr = simulate(T=0.5)
    k_a, k_c = 40, 50          # anchor sample, current sample (0.05 s apart)
    pre = imu.preintegrate(
        jnp.asarray(acc[k_a:k_c]), jnp.asarray(gyr[k_a:k_c]),
        jnp.full(k_c - k_a, DT), jnp.ones(k_c - k_a, bool),
        jnp.zeros(6, jnp.float32), CALIB)
    rng = np.random.default_rng(4)
    X = rng.uniform([-3, -3, 2.5], [3, 3, 9], (120, 3)).astype(np.float32)
    R_cw_gt = R[k_c].T
    t_cw_gt = -R_cw_gt @ p[k_c]
    Xc = X @ R_cw_gt.T + t_cw_gt
    obs = Xc[:, :2] / Xc[:, 2:3]
    valid = Xc[:, 2] > 0.5
    focal = 400.0

    dR = Rot.from_rotvec([0.02, -0.015, 0.01]).as_matrix()
    R0_cw = jnp.asarray(dR @ R_cw_gt, jnp.float32)
    t0_cw = jnp.asarray(t_cw_gt + np.array([0.03, -0.02, 0.04]),
                        jnp.float32)
    info9 = jnp.linalg.inv(pre.C[:9, :9] + 1e-9 * jnp.eye(9))
    rw = 1.0 / jnp.clip(jnp.diagonal(pre.C[9:, 9:]), 1e-12, None)
    res = vi_ba.optimize_pose_inertial(
        R0_cw, t0_cw, jnp.asarray(v[k_c] + 0.2, jnp.float32),
        jnp.zeros(6, jnp.float32),
        jnp.asarray(X), jnp.asarray(obs, jnp.float32),
        jnp.full(X.shape[0], focal ** 2, jnp.float32),
        jnp.asarray(valid), jnp.full(X.shape[0], jnp.nan, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(R[k_a], jnp.float32), jnp.asarray(p[k_a], jnp.float32),
        jnp.asarray(v[k_a], jnp.float32), jnp.zeros(6, jnp.float32),
        pre.dt, pre.dR, pre.dV, pre.dP, pre.J_Rg, pre.J_Vg, pre.J_Va,
        pre.J_Pg, pre.J_Pa, 0.5 * (info9 + info9.T), jnp.zeros(6),
        rw, n_iters=8)
    t_err = float(jnp.linalg.norm(res.t_cw - jnp.asarray(t_cw_gt)))
    v_err = float(jnp.linalg.norm(res.v - jnp.asarray(v[k_c])))
    assert t_err < 5e-3, t_err
    assert v_err < 0.05, v_err
    assert int(res.n_inliers) > 80
    # marginal prior is PSD-ish and finite
    H = np.asarray(res.H_marg)
    assert np.isfinite(H).all()
    assert np.all(np.linalg.eigvalsh(0.5 * (H + H.T)) > -1e-2)


def test_preintegration_composition_matches_single_shot():
    """Keyframe-cull chain merge: composing two preintegration blocks
    analytically must match the single-shot integration over the
    concatenated samples (deltas exactly; bias Jacobians to the documented
    small-rotation approximation) — reference MergePrevious semantics."""
    rng = np.random.default_rng(3)
    N = 40
    acc = jnp.asarray(rng.normal(0, 1.5, (N, 3)), jnp.float32) \
        + jnp.asarray([0, 0, 9.81])
    gyr = jnp.asarray(rng.normal(0, 0.2, (N, 3)), jnp.float32)
    dts = jnp.full(N, 0.005, jnp.float32)
    bias = jnp.zeros(6, jnp.float32)
    full = imu.preintegrate(acc, gyr, dts, jnp.ones(N, bool), bias, CALIB)
    p1 = imu.preintegrate(acc[:20], gyr[:20], dts[:20],
                          jnp.ones(20, bool), bias, CALIB)
    p2 = imu.preintegrate(acc[20:], gyr[20:], dts[20:],
                          jnp.ones(20, bool), bias, CALIB)
    ki = inertial.empty_kf_imu(3)
    ki = inertial.set_kf_imu(ki, 1, p1, 0)
    ki = inertial.set_kf_imu(ki, 2, p2, 1)
    ki = inertial.merge_entry_into_next(ki, 1, 2)
    assert not bool(ki.valid[1])
    assert int(ki.prev[2]) == 0
    np.testing.assert_allclose(float(ki.dt[2]), float(full.dt), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ki.dR[2]), np.asarray(full.dR),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ki.dV[2]), np.asarray(full.dV),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ki.dP[2]), np.asarray(full.dP),
                               atol=1e-4)
    # bias Jacobians: exact for Rg/Va, approx for Vg/Pg (cross terms)
    np.testing.assert_allclose(np.asarray(ki.J_Rg[2]),
                               np.asarray(full.J_Rg), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ki.J_Va[2]),
                               np.asarray(full.J_Va), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ki.J_Vg[2]),
                               np.asarray(full.J_Vg), atol=5e-3)
    np.testing.assert_allclose(np.asarray(ki.J_Pg[2]),
                               np.asarray(full.J_Pg), atol=5e-3)
    # composed information stays positive definite and same order
    info_full = np.linalg.inv(np.asarray(full.C[:9, :9])
                              + 1e-9 * np.eye(9))
    ev_c = np.linalg.eigvalsh(np.asarray(ki.info[2]))
    ev_f = np.linalg.eigvalsh(info_full)
    assert ev_c.min() > 0
    assert 0.2 < ev_c.max() / ev_f.max() < 5.0
