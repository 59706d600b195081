"""Optimizer tests: motion-only pose optimization and window BA with Schur
reduction — convergence, outlier handling, gauge behavior."""
import jax
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import lie
from morb_slam_tpu.optim import ba, pose_opt

FOCAL = 460.0
INFO = FOCAL ** 2  # sigma = 1 px


def make_world(rng, n_pts=300, n_kfs=6, spread=0.4):
    X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], (n_pts, 3)),
                    jnp.float32)
    poses = []
    for k in range(n_kfs):
        xi = np.zeros(6)
        xi[0] = spread * k / max(n_kfs - 1, 1)  # translate along x
        xi[3:] = rng.normal(0, 0.02, 3)
        poses.append(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
    R = jnp.stack([p[0] for p in poses])
    t = jnp.stack([p[1] for p in poses])
    return X, R, t


def project_all(R, t, X, rng=None, noise_px=0.0):
    Xc = jax.vmap(lambda Rk, tk: lie.se3_apply(Rk, tk, X))(R, t)  # (K, N, 3)
    uv = Xc[..., :2] / Xc[..., 2:3]
    if noise_px:
        uv = uv + jnp.asarray(rng.normal(0, noise_px / FOCAL, uv.shape),
                              jnp.float32)
    return uv


class TestPoseOpt:
    def test_converges_to_gt(self):
        rng = np.random.default_rng(20)
        X, R, t = make_world(rng, n_kfs=1)
        uv = project_all(R, t, X, rng, noise_px=0.5)[0]
        # perturb initial pose
        dx = jnp.asarray([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], jnp.float32)
        dR, dt = lie.se3_exp(dx)
        R0, t0 = lie.se3_mul(dR, dt, R[0], t[0])
        res = pose_opt.optimize_pose(
            R0, t0, X, uv, jnp.full(X.shape[0], INFO),
            jnp.ones(X.shape[0], bool))
        assert int(res.n_inliers) > 280
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R[0]),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t[0]),
                                   atol=5e-3)

    def test_outliers_rejected(self):
        rng = np.random.default_rng(21)
        X, R, t = make_world(rng, n_kfs=1)
        uv = project_all(R, t, X, rng, noise_px=0.5)[0]
        n_out = 60
        uv = uv.at[:n_out].add(
            jnp.asarray(rng.uniform(-0.1, 0.1, (n_out, 2)), jnp.float32) + 0.02)
        dx = jnp.asarray([0.05, -0.02, 0.04, 0.01, -0.02, 0.01], jnp.float32)
        dR, dt = lie.se3_exp(dx)
        R0, t0 = lie.se3_mul(dR, dt, R[0], t[0])
        res = pose_opt.optimize_pose(
            R0, t0, X, uv, jnp.full(X.shape[0], INFO),
            jnp.ones(X.shape[0], bool))
        inl = np.asarray(res.inliers)
        assert inl[:n_out].sum() < 5            # outliers excluded
        assert inl[n_out:].sum() > 220          # inliers kept
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R[0]),
                                   atol=3e-3)

    def test_stereo_rows(self):
        rng = np.random.default_rng(22)
        X, R, t = make_world(rng, n_kfs=1)
        b = 0.11  # meters
        uv = project_all(R, t, X, rng, noise_px=0.5)[0]
        Xc = lie.se3_apply(R[0], t[0], X)
        ur = (Xc[:, 0] - b) / Xc[:, 2]
        dx = jnp.asarray([0.1, -0.05, 0.08, 0.02, -0.03, 0.01], jnp.float32)
        dR, dt = lie.se3_exp(dx)
        R0, t0 = lie.se3_mul(dR, dt, R[0], t[0])
        res = pose_opt.optimize_pose(
            R0, t0, X, uv, jnp.full(X.shape[0], INFO),
            jnp.ones(X.shape[0], bool), obs_ur=ur, baseline=b)
        assert int(res.n_inliers) > 280
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t[0]),
                                   atol=5e-3)


def build_problem(rng, noise_px=0.5, perturb=True, n_kfs=6, n_pts=300):
    # wide 2m baseline: keeps triangulation depth-uncertainty well below the
    # perturbation so landmark recovery is actually testable
    X, R, t = make_world(rng, n_pts=n_pts, n_kfs=n_kfs, spread=2.0)
    uv = project_all(R, t, X, rng, noise_px=noise_px)      # (K, N, 2)
    K, N = n_kfs, n_pts
    obs_kf = jnp.repeat(jnp.arange(K), N)
    obs_lm = jnp.tile(jnp.arange(N), K)
    obs_uv = uv.reshape(K * N, 2)
    R0, t0, X0 = R, t, X
    if perturb:
        rngj = np.random.default_rng(99)
        dxi = jnp.asarray(
            np.concatenate([np.zeros((2, 6)),
                            rngj.normal(0, 0.01, (K - 2, 6))]), jnp.float32)
        dR, dt = lie.se3_exp(dxi)
        R0, t0 = lie.se3_mul(dR, dt, R, t)
        X0 = X + jnp.asarray(rngj.normal(0, 0.05, (N, 3)), jnp.float32)
    kf_opt = jnp.ones(K, bool).at[:2].set(False)   # gauge: fix first two
    prob = ba.make_problem(
        R0, t0, X0, obs_kf, obs_lm, obs_uv,
        jnp.full(K * N, INFO), jnp.ones(K * N, bool),
        kf_opt, jnp.ones(N, bool))
    return prob, (R, t, X)


class TestBA:
    def test_cost_decreases_and_recovers(self):
        rng = np.random.default_rng(30)
        prob, (R, t, X) = build_problem(rng)
        Rf, tf, Xf, info = ba.ba_solve(prob, n_iters=15)
        assert float(info["costs"][-1]) < 0.5 * float(info["cost0"])
        # poses recovered (gauge fixed by 2 anchored KFs)
        np.testing.assert_allclose(np.asarray(Rf), np.asarray(R), atol=3e-3)
        np.testing.assert_allclose(np.asarray(tf), np.asarray(t), atol=1e-2)
        # landmark error drops to the triangulation noise floor
        # (z^2 sigma / (b f) ~ 0.035 m at this geometry)
        err0 = float(jnp.linalg.norm(prob.X - X, axis=-1).mean())
        err1 = float(jnp.linalg.norm(Xf - X, axis=-1).mean())
        assert err1 < 0.6 * err0 and err1 < 0.05, (err0, err1)

    def test_fixed_entities_stay_fixed(self):
        rng = np.random.default_rng(31)
        prob, _ = build_problem(rng)
        Rf, tf, Xf, _ = ba.ba_solve(prob, n_iters=5)
        np.testing.assert_array_equal(np.asarray(Rf[:2]), np.asarray(prob.R[:2]))
        np.testing.assert_array_equal(np.asarray(tf[:2]), np.asarray(prob.t[:2]))

    def test_masked_observations_ignored(self):
        rng = np.random.default_rng(32)
        prob, gt = build_problem(rng)
        # corrupt some observations but mask them out
        bad = prob.obs_uv.at[:100].add(10.0)
        mask = prob.obs_mask.at[:100].set(False)
        prob2 = prob._replace(obs_uv=bad, obs_mask=mask)
        Rf, tf, Xf, info = ba.ba_solve(prob2, n_iters=15)
        np.testing.assert_allclose(np.asarray(Rf), np.asarray(gt[0]), atol=3e-3)

    def test_outlier_classification(self):
        rng = np.random.default_rng(33)
        prob, gt = build_problem(rng, perturb=False)
        bad = prob.obs_uv.at[:50].add(20.0 / FOCAL)   # 20 px off
        prob2 = prob._replace(obs_uv=bad)
        keep = ba.classify_outliers(prob2, prob.R, prob.t, prob.X)
        k = np.asarray(keep)
        assert k[:50].sum() == 0
        assert k[50:].mean() > 0.95
