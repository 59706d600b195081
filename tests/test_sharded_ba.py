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


def test_pcg_sharded_matches_single_device():
    """The scalable PCG GBA path: sharded implicit-Schur matvecs must
    reproduce the single-device PCG solver."""
    rng = np.random.default_rng(42)
    prob, (R, t, X) = build_problem(rng)
    prob = sharded_ba.pad_problem_for_mesh(prob, 8)
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), (sharded_ba.OBS_AXIS,))
    R1, t1, X1, info1 = ba.ba_solve_pcg(prob, n_iters=4, cg_iters=25)
    R8, t8, X8, info8 = sharded_ba.ba_solve_pcg_sharded(
        prob, mesh, n_iters=4, cg_iters=25)
    np.testing.assert_allclose(np.asarray(R8), np.asarray(R1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(t8), np.asarray(t1), atol=2e-4)
    assert float(info8["costs"][-1]) < 0.8 * float(info8["cost0"])


def test_pcg_lm_sharded_matches_single_device():
    """Landmark-sharded PCG (device owns whole landmark blocks, only (K,6)
    psum per matvec) must reproduce the single-device PCG solver through a
    landmark permutation."""
    rng = np.random.default_rng(44)
    prob, (R, t, X) = build_problem(rng)
    R1, t1, X1, info1 = ba.ba_solve_pcg(prob, n_iters=4, cg_iters=25)
    for n_dev in (1, 8):
        pn, new2old = sharded_ba.partition_problem_by_lm(prob, n_dev)
        mesh = Mesh(np.asarray(jax.devices()[:n_dev]).reshape(n_dev),
                    (sharded_ba.OBS_AXIS,))
        Rn, tn, Xn, infon = sharded_ba.ba_solve_pcg_lm_sharded(
            pn, mesh, n_iters=4, cg_iters=25)
        np.testing.assert_allclose(np.asarray(Rn), np.asarray(R1), atol=2e-4)
        np.testing.assert_allclose(np.asarray(tn), np.asarray(t1), atol=2e-4)
        keep = np.asarray(new2old) >= 0
        X_back = np.zeros_like(np.asarray(X1))
        X_back[np.asarray(new2old)[keep]] = np.asarray(Xn)[keep]
        np.testing.assert_allclose(X_back, np.asarray(X1), atol=5e-4)
        assert float(infon["costs"][-1]) < 0.8 * float(infon["cost0"])


def test_lm_partition_balances_observations():
    """Equal-obs boundaries: no device block may carry more than ~1.3x the
    mean observation load even when landmark ids are heavily clustered."""
    from morb_slam_tpu.optim import ba as ba_mod
    rng = np.random.default_rng(45)
    K, L, O = 16, 4096, 60000
    # clustered: 80% of observations hit the first 10% of landmark ids
    lm = np.where(rng.random(O) < 0.8,
                  rng.integers(0, L // 10, O), rng.integers(0, L, O))
    prob = ba_mod.make_problem(
        jnp.tile(jnp.eye(3), (K, 1, 1)), jnp.zeros((K, 3)),
        jnp.asarray(rng.normal(0, 1, (L, 3)), jnp.float32),
        jnp.asarray(rng.integers(0, K, O), jnp.int32),
        jnp.asarray(lm, jnp.int32),
        jnp.zeros((O, 2), jnp.float32), jnp.ones(O, jnp.float32),
        jnp.ones(O, bool), jnp.ones(K, bool), jnp.ones(L, bool))
    pn, _ = sharded_ba.partition_problem_by_lm(prob, 8)
    per_dev = np.asarray(pn.obs_mask).reshape(8, -1).sum(axis=1)
    assert per_dev.max() <= 1.3 * per_dev.mean(), per_dev


def test_sharded_place_recognition():
    """Keyframe-block-sharded BoW scoring equals the replicated query."""
    import jax.numpy as jnp
    from morb_slam_tpu.vocab import database as kfdb
    rng = np.random.default_rng(7)
    K, W = 64, 256
    bow = jnp.asarray(rng.random((K, W)), jnp.float32)
    bow = bow / jnp.sum(bow, axis=1, keepdims=True)
    db = kfdb.KeyframeDatabase(bow=bow, valid=jnp.ones(K, bool))
    mesh = Mesh(np.asarray(jax.devices()).reshape(8), ("kf",))
    q = bow[11]
    ids_r, sc_r, ok_r = kfdb.top_candidates(db, q, 3)
    ids_s, sc_s, ok_s = kfdb.top_candidates_sharded(db, q, 3, mesh)
    assert int(ids_s[0]) == int(ids_r[0]) == 11
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_r),
                               atol=1e-5)


def test_distributed_entry_points():
    """Multi-host wiring (parallel.distributed): the single-process no-op
    initialize, the global mesh over every (virtual) device, the padded
    distributed GBA, and the scaling-efficiency measurement."""
    from morb_slam_tpu.parallel import distributed

    distributed.initialize(num_processes=1)          # must be a no-op
    mesh = distributed.global_obs_mesh()
    assert mesh.devices.size == 8

    rng = np.random.default_rng(43)
    prob, _ = build_problem(rng)
    R, t, X, info = distributed.global_ba_distributed(prob, mesh,
                                                      n_iters=3,
                                                      cg_iters=20)
    assert float(info["costs"][-1]) < 0.8 * float(info["cost0"])

    ips_n, ips_1, eff = distributed.ba_scaling_efficiency(prob, n_iters=1,
                                                          cg_iters=8)
    assert ips_n > 0 and ips_1 > 0 and np.isfinite(eff)
