"""IMU initialization tests: recover gravity direction, scale and biases
from preintegrations + (mis-scaled, mis-rotated) visual poses."""
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation as Rot

from morb_slam_tpu import imu, lie
from morb_slam_tpu.optim import inertial

FREQ = 200.0
DT = 1.0 / FREQ
CALIB = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5, 3e-3,
                       FREQ)
G0 = np.array([0.0, 0.0, -9.81])


def simulate_rich(T=3.0, bg=np.zeros(3), ba=np.zeros(3), seed=0):
    """Wiggly accelerating trajectory in a gravity-aligned world; returns
    IMU samples and dense ground-truth states."""
    n = int(T / DT)
    ts = np.arange(n + 1) * DT
    # analytic position: sinusoids on all axes (rich excitation)
    p = np.stack([0.8 * np.sin(1.3 * ts), 0.5 * np.sin(0.9 * ts + 1.0),
                  0.3 * np.sin(1.7 * ts)], -1)
    v = np.stack([0.8 * 1.3 * np.cos(1.3 * ts),
                  0.5 * 0.9 * np.cos(0.9 * ts + 1.0),
                  0.3 * 1.7 * np.cos(1.7 * ts)], -1)
    a = np.stack([-0.8 * 1.3 ** 2 * np.sin(1.3 * ts),
                  -0.5 * 0.9 ** 2 * np.sin(0.9 * ts + 1.0),
                  -0.3 * 1.7 ** 2 * np.sin(1.7 * ts)], -1)
    w_body = np.array([0.3, -0.2, 0.25])
    R = np.stack([Rot.from_rotvec(w_body * t).as_matrix() for t in ts])
    acc_meas = np.einsum('nij,nj->ni', R.transpose(0, 2, 1), a - G0[None]) \
        + ba[None]
    gyr_meas = np.tile(w_body, (n + 1, 1)) + bg[None]
    # midpoint sampling like the integrator expects
    acc_mid = 0.5 * (acc_meas[:-1] + acc_meas[1:])
    gyr_mid = 0.5 * (gyr_meas[:-1] + gyr_meas[1:])
    return ts, p, v, R, acc_mid, gyr_mid


def build_kf_imu(ts, acc, gyr, kf_every=50, bias=np.zeros(6)):
    n_kf = (len(acc)) // kf_every + 1
    ki = inertial.empty_kf_imu(n_kf)
    for k in range(1, n_kf):
        sl = slice((k - 1) * kf_every, k * kf_every)
        a = jnp.asarray(acc[sl])
        g = jnp.asarray(gyr[sl])
        d = jnp.full(a.shape[0], DT)
        pre = imu.preintegrate(a, g, d, jnp.ones(a.shape[0], bool),
                               jnp.asarray(bias, jnp.float32), CALIB)
        ki = inertial.set_kf_imu(ki, k, pre, k - 1)
    return ki, n_kf


def test_recover_scale_gravity_bias():
    bg = np.array([0.004, -0.003, 0.002])
    ba = np.array([0.03, -0.02, 0.04])
    ts, p, v, R, acc, gyr = simulate_rich(T=3.0, bg=bg, ba=ba)
    ki, n_kf = build_kf_imu(ts, acc, gyr)
    kf_every = 50
    idx = np.arange(n_kf) * kf_every
    # visual world: rotated by R_vg, scaled by 1/s_true
    s_true = 2.5
    R_vg = Rot.from_rotvec([0.25, -0.15, 0.1]).as_matrix()
    R_wb_vis = jnp.asarray(np.einsum('ij,njk->nik', R_vg, R[idx]),
                           jnp.float32)
    p_vis = jnp.asarray((p[idx] @ R_vg.T) / s_true, jnp.float32)
    # closed-form linear alignment nails the scale on accurate poses
    s_lin, g_lin, v_lin, rms = inertial.linear_alignment(
        ki, R_wb_vis, p_vis, jnp.ones(n_kf, bool))
    assert abs(float(s_lin) - s_true) / s_true < 0.02, float(s_lin)
    R_wg, s, bg_e, ba_e, v_e, costs = inertial.inertial_only_optimize(
        ki, R_wb_vis, p_vis, jnp.ones(n_kf, bool), n_iters=40,
        s0=float(s_lin), v0=v_lin,
        R_wg0=inertial.gravity_rotation(g_lin))
    assert abs(float(s) - s_true) / s_true < 0.04, float(s)
    # gravity direction in visual world
    g_est = np.asarray(lie.matvec(R_wg, jnp.asarray(G0, jnp.float32)))
    g_true = R_vg @ G0
    cos = g_est @ g_true / (np.linalg.norm(g_est) * np.linalg.norm(g_true))
    assert cos > 0.9995, (g_est, g_true)
    np.testing.assert_allclose(np.asarray(bg_e), bg, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ba_e), ba, atol=0.06)
    # velocities near ground truth (visual-world, scaled)
    v_true_vis = (v[idx] @ R_vg.T)
    np.testing.assert_allclose(np.asarray(v_e)[2:], v_true_vis[2:],
                               atol=0.08)


def test_apply_gauge_consistency():
    ts, p, v, R, acc, gyr = simulate_rich(T=2.0)
    ki, n_kf = build_kf_imu(ts, acc, gyr)
    kf_every = 50
    idx = np.arange(n_kf) * kf_every
    s_true = 1.7
    R_vg = Rot.from_rotvec([0.2, 0.1, -0.3]).as_matrix()
    R_wb_vis = jnp.asarray(np.einsum('ij,njk->nik', R_vg, R[idx]),
                           jnp.float32)
    p_vis = jnp.asarray((p[idx] @ R_vg.T) / s_true, jnp.float32)
    R_wg, s, bg_e, ba_e, v_e, _ = inertial.inertial_only_optimize(
        ki, R_wb_vis, p_vis, jnp.ones(n_kf, bool), n_iters=40)
    # apply: convert camera-convention poses and check residuals vanish
    kf_R_cw = jnp.swapaxes(R_wb_vis, -1, -2)
    kf_t_cw = -lie.matvec(kf_R_cw, p_vis)
    lm = jnp.asarray(np.random.default_rng(0).normal(size=(50, 3)),
                     jnp.float32)
    R2, t2, lm2, v2 = inertial.apply_gauge(kf_R_cw, kf_t_cw, lm, v_e,
                                           R_wg, s)
    # new body states
    R_wb2 = jnp.swapaxes(R2, -1, -2)
    p2 = -lie.matvec(R_wb2, t2)
    r = inertial.inertial_residuals(
        ki, R_wb2, p2, v2, bg_e, ba_e,
        jnp.asarray(G0, jnp.float32), jnp.asarray(1.0, jnp.float32))
    assert float(jnp.abs(r).max()) < 0.05, float(jnp.abs(r).max())
