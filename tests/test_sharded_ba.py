"""Sharded BA must reproduce single-device BA on the virtual 8-device mesh
(the driver's multi-chip validation path)."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from morb_slam_tpu.optim import ba
from morb_slam_tpu.parallel import sharded_ba

from test_optim import build_problem


def test_sharded_matches_single_device():
    rng = np.random.default_rng(40)
    prob, (R, t, X) = build_problem(rng)
    prob = sharded_ba.pad_problem_for_mesh(prob, 8)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), (sharded_ba.OBS_AXIS,))
    R1, t1, X1, info1 = ba.ba_solve(prob, n_iters=6)
    R8, t8, X8, info8 = sharded_ba.ba_solve_sharded(prob, mesh, n_iters=6)
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(X8), np.asarray(X1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(info8["costs"]),
                               np.asarray(info1["costs"]), rtol=1e-4)


def test_sharded_converges():
    rng = np.random.default_rng(41)
    prob, (R, t, X) = build_problem(rng)
    prob = sharded_ba.pad_problem_for_mesh(prob, 8)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), (sharded_ba.OBS_AXIS,))
    Rf, tf, Xf, info = sharded_ba.ba_solve_sharded(prob, mesh, n_iters=12)
    assert float(info["costs"][-1]) < 0.5 * float(info["cost0"])
    np.testing.assert_allclose(np.asarray(Rf), np.asarray(R), atol=3e-3)
