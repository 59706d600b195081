"""Umeyama / ATE alignment tests against known transforms."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import alignment, lie

RNG = np.random.default_rng(2)


def test_umeyama_recovers_sim3():
    src = jnp.asarray(RNG.normal(size=(100, 3)), jnp.float32)
    xi = jnp.asarray(RNG.normal(size=(7,)) * 0.5, jnp.float32)
    s_gt, R_gt, t_gt = lie.sim3_exp(xi)
    dst = lie.sim3_apply(s_gt[None], R_gt[None], t_gt[None], src)
    s, R, t = alignment.umeyama(src, dst, with_scale=True)
    np.testing.assert_allclose(float(s), float(s_gt), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_umeyama_se3_mode():
    src = jnp.asarray(RNG.normal(size=(50, 3)), jnp.float32)
    R_gt, t_gt = lie.se3_exp(jnp.asarray(RNG.normal(size=(6,)), jnp.float32))
    dst = lie.se3_apply(R_gt[None], t_gt[None], src)
    s, R, t = alignment.umeyama(src, dst, with_scale=False)
    assert float(s) == 1.0
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)


def test_umeyama_weights_ignore_outliers():
    src = jnp.asarray(RNG.normal(size=(60, 3)), jnp.float32)
    R_gt, t_gt = lie.se3_exp(jnp.asarray([0.1, -0.2, 0.3, 0.2, 0.1, -0.1], jnp.float32))
    dst = lie.se3_apply(R_gt[None], t_gt[None], src)
    dst = dst.at[:5].add(100.0)  # gross outliers
    w = jnp.ones(60).at[:5].set(0.0)
    s, R, t = alignment.umeyama(src, dst, weights=w, with_scale=False)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)


def test_ate_rmse_zero_for_aligned():
    est = jnp.asarray(RNG.normal(size=(40, 3)), jnp.float32)
    s_gt, R_gt, t_gt = lie.sim3_exp(jnp.asarray(RNG.normal(size=(7,)) * 0.3, jnp.float32))
    gt = lie.sim3_apply(s_gt[None], R_gt[None], t_gt[None], est)
    rmse, *_ = alignment.ate_rmse(est, gt, with_scale=True)
    assert float(rmse) < 1e-4


def test_ate_rmse_measures_noise():
    est = jnp.asarray(RNG.normal(size=(500, 3)), jnp.float32)
    noise = 0.05
    gt = est + jnp.asarray(RNG.normal(size=(500, 3)) * noise, jnp.float32)
    rmse, *_ = alignment.ate_rmse(est, gt, with_scale=False)
    expected = noise * np.sqrt(3)
    assert 0.5 * expected < float(rmse) < 1.5 * expected


def test_reflection_handled():
    # degenerate near-planar cloud must still return a proper rotation (det=+1)
    src = jnp.asarray(RNG.normal(size=(30, 3)) * np.array([1, 1, 1e-4]), jnp.float32)
    R_gt, t_gt = lie.se3_exp(jnp.asarray([0.3, 0.1, -0.2, 0.5, -0.4, 0.2], jnp.float32))
    dst = lie.se3_apply(R_gt[None], t_gt[None], src)
    _, R, _ = alignment.umeyama(src, dst, with_scale=False)
    assert float(jnp.linalg.det(R)) > 0.99
