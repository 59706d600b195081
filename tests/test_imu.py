"""IMU preintegration tests against analytic trajectories and
finite-difference bias Jacobians."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import imu, lie

FREQ = 200.0
DT = 1.0 / FREQ
CALIB = imu.make_calib(np.eye(3), np.zeros(3), 1.7e-4, 2e-3, 1.9e-5, 3e-3,
                       FREQ)


def simulate(T=0.5, w=np.array([0.3, -0.2, 0.5]),
             a_w=np.array([0.4, 0.1, -0.2]), R0=np.eye(3),
             v0=np.array([0.1, 0.0, 0.05])):
    """Constant body rate w, constant world acceleration a_w (incl. gravity
    compensation). Returns measurements and analytic end state."""
    n = int(round(T / DT))
    g = np.array([0.0, 0.0, -9.81])
    ts = np.arange(n) * DT
    accs, gyros = [], []
    from scipy.spatial.transform import Rotation as Rot
    for t in ts:
        # measurement over [t, t+DT] — sample at midpoint for 2nd-order accuracy
        tm = t + DT / 2
        R = R0 @ Rot.from_rotvec(w * tm).as_matrix()
        accs.append(R.T @ (a_w - g))
        gyros.append(w)
    RT = R0 @ Rot.from_rotvec(w * T).as_matrix()
    vT = v0 + a_w * T
    pT = v0 * T + 0.5 * a_w * T * T
    return (np.asarray(accs), np.asarray(gyros), np.full(n, DT), RT, vT, pT)


def test_preintegrate_matches_analytic():
    accs, gyros, dts, RT, vT, pT = simulate()
    n = len(dts)
    pre = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                           jnp.asarray(dts), jnp.ones(n, bool),
                           jnp.zeros(6), CALIB)
    R0 = jnp.eye(3)
    p0 = jnp.zeros(3)
    v0 = jnp.asarray([0.1, 0.0, 0.05])
    Rj, pj, vj = imu.predict_state(R0, p0, v0, jnp.zeros(6), pre)
    # Euler-within-interval integration (same scheme as the reference's
    # IntegrateNewMeasurement) has O(T*dt) truncation: ~|w||f|*T*dt/2 ~ 4e-3
    np.testing.assert_allclose(np.asarray(Rj), RT, atol=2e-4)
    np.testing.assert_allclose(np.asarray(vj), vT, atol=6e-3)
    np.testing.assert_allclose(np.asarray(pj), pT, atol=3e-3)


def test_mask_padding_is_noop():
    accs, gyros, dts, *_ = simulate(T=0.2)
    n = len(dts)
    pad = 32
    pre1 = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                            jnp.asarray(dts), jnp.ones(n, bool),
                            jnp.zeros(6), CALIB)
    acc_p = jnp.concatenate([jnp.asarray(accs), jnp.full((pad, 3), 1e3)])
    gyr_p = jnp.concatenate([jnp.asarray(gyros), jnp.full((pad, 3), 1e3)])
    dts_p = jnp.concatenate([jnp.asarray(dts), jnp.full(pad, 1e3)])
    mask = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(pad, bool)])
    pre2 = imu.preintegrate(acc_p, gyr_p, dts_p, mask, jnp.zeros(6), CALIB)
    np.testing.assert_allclose(np.asarray(pre2.dR), np.asarray(pre1.dR),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(pre2.dP), np.asarray(pre1.dP),
                               atol=1e-6)
    np.testing.assert_allclose(float(pre2.dt), float(pre1.dt), atol=1e-6)


def test_bias_jacobians_vs_reintegration():
    """delta getters with a bias update must match re-integrating with the
    new bias (first order)."""
    accs, gyros, dts, *_ = simulate(T=0.3)
    n = len(dts)
    b0 = jnp.zeros(6)
    db = jnp.asarray([0.003, -0.002, 0.004, 0.02, -0.015, 0.01])
    pre0 = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                            jnp.asarray(dts), jnp.ones(n, bool), b0, CALIB)
    pre1 = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                            jnp.asarray(dts), jnp.ones(n, bool), b0 + db,
                            CALIB)
    dR_lin = imu.delta_rotation(pre0, b0 + db)
    dV_lin = imu.delta_velocity(pre0, b0 + db)
    dP_lin = imu.delta_position(pre0, b0 + db)
    np.testing.assert_allclose(np.asarray(dR_lin), np.asarray(pre1.dR),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(dV_lin), np.asarray(pre1.dV),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(dP_lin), np.asarray(pre1.dP),
                               atol=1e-3)


def test_covariance_grows_and_spd():
    accs, gyros, dts, *_ = simulate(T=0.3)
    n = len(dts)
    pre = imu.preintegrate(jnp.asarray(accs), jnp.asarray(gyros),
                           jnp.asarray(dts), jnp.ones(n, bool),
                           jnp.zeros(6), CALIB)
    C = np.asarray(pre.C)
    assert np.allclose(C, C.T, atol=1e-10)
    ev = np.linalg.eigvalsh(C[:9, :9])
    assert (ev > 0).all()
    # longer integration -> larger covariance
    pre2 = imu.preintegrate(jnp.asarray(accs)[:n // 2],
                            jnp.asarray(gyros)[:n // 2],
                            jnp.asarray(dts)[:n // 2],
                            jnp.ones(n // 2, bool), jnp.zeros(6), CALIB)
    assert np.trace(np.asarray(pre2.C)[:9, :9]) < np.trace(C[:9, :9])
