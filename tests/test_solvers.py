"""Solver tests: triangulation, two-view init (E and H paths), PnP, Sim3 —
all against synthetic ground truth."""
import jax
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import lie
from morb_slam_tpu.solvers import pnp, sim3, triangulation, two_view

KEY = jax.random.PRNGKey(0)


def make_scene(rng, n=200, planar=False):
    if planar:
        X = rng.uniform([-2, -2, 4], [2, 2, 4.0001], (n, 3))
    else:
        X = rng.uniform([-2, -2, 4], [2, 2, 8], (n, 3))
    return jnp.asarray(X, jnp.float32)


def cam2_pose(tx=0.3):
    xi = jnp.asarray([tx, 0.02, 0.01, 0.01, 0.05, -0.02], jnp.float32)
    return lie.se3_exp(xi)  # world(=cam1) -> cam2


def normalized_obs(rng, X, R=None, t=None, noise=0.0):
    Xc = X if R is None else lie.se3_apply(R[None], t[None], X)
    x = Xc[:, :2] / Xc[:, 2:3]
    if noise:
        x = x + jnp.asarray(rng.normal(0, noise, x.shape), jnp.float32)
    return x


class TestTriangulation:
    def test_exact(self):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 100)
        R21, t21 = cam2_pose()
        x1 = normalized_obs(rng, X)
        x2 = normalized_obs(rng, X, R21, t21)
        Xt = triangulation.triangulate_two_view(x1, x2, R21, t21)
        np.testing.assert_allclose(np.asarray(Xt), np.asarray(X), atol=1e-2)

    def test_checks_reject_behind(self):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 50)
        Xbad = X.at[:10, 2].set(-5.0)  # behind camera 1
        R21, t21 = cam2_pose()
        x1 = normalized_obs(rng, Xbad)
        x2 = normalized_obs(rng, Xbad, R21, t21)
        good, _ = triangulation.depth_and_reproj_checks(
            Xbad, x1, x2, R21, t21, th2=1e-4)
        assert not bool(good[:10].any())
        assert bool(good[10:].all())


class TestTwoView:
    def _run(self, planar, noise=0.5 / 460.0):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 300, planar=planar)
        R21, t21 = cam2_pose()
        x1 = normalized_obs(rng, X, noise=noise)
        x2 = normalized_obs(rng, X, R21, t21, noise=noise)
        res = two_view.reconstruct_two_view(
            KEY, x1, x2, jnp.ones(300, bool), focal=460.0)
        return res, R21, t21

    def test_general_scene_recovers_motion(self):
        rng = np.random.default_rng(11)
        res, R21, t21 = self._run(planar=False)
        assert int(res.n_good) > 200, int(res.n_good)
        # linear-method accuracy under 0.5px noise is ~1 deg; the pipeline
        # (like the reference) refines init with a global BA right after
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R21),
                                   atol=1e-2)
        t_est = np.asarray(res.t21)
        t_gt = np.asarray(t21 / jnp.linalg.norm(t21))
        np.testing.assert_allclose(t_est, t_gt, atol=2e-2)

    def test_planar_scene_uses_homography(self):
        rng = np.random.default_rng(11)
        res, R21, t21 = self._run(planar=True)
        assert bool(res.used_h)
        assert int(res.n_good) > 150, int(res.n_good)
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R21),
                                   atol=2e-2)

    def test_outlier_robustness(self):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 300)
        R21, t21 = cam2_pose()
        x1 = normalized_obs(rng, X, noise=0.5 / 460.0)
        x2 = normalized_obs(rng, X, R21, t21, noise=0.5 / 460.0)
        # corrupt 25% of matches
        idx = rng.choice(300, 75, replace=False)
        x2 = x2.at[idx].set(jnp.asarray(rng.uniform(-0.5, 0.5, (75, 2)),
                                        jnp.float32))
        res = two_view.reconstruct_two_view(
            KEY, x1, x2, jnp.ones(300, bool), focal=460.0)
        np.testing.assert_allclose(np.asarray(res.R21), np.asarray(R21),
                                   atol=1e-2)


class TestPnP:
    def test_recovers_pose(self):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 150)
        R, t = cam2_pose(tx=0.5)
        x = normalized_obs(rng, X, R, t, noise=0.5 / 460.0)
        res = pnp.solve_pnp(KEY, X, x, jnp.ones(150, bool), focal=460.0)
        assert int(res.n_inliers) > 120, int(res.n_inliers)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=2e-2)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t), atol=5e-2)

    def test_with_outliers(self):
        rng = np.random.default_rng(11)
        X = make_scene(rng, 150)
        R, t = cam2_pose(tx=0.5)
        x = normalized_obs(rng, X, R, t, noise=0.5 / 460.0)
        idx = rng.choice(150, 50, replace=False)
        x = x.at[idx].set(jnp.asarray(rng.uniform(-0.5, 0.5, (50, 2)),
                                      jnp.float32))
        res = pnp.solve_pnp(KEY, X, x, jnp.ones(150, bool), focal=460.0)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=3e-2)


class TestSim3:
    def test_recovers_similarity(self):
        rng = np.random.default_rng(11)
        n = 100
        X2 = make_scene(rng, n)
        xi = jnp.asarray([0.3, -0.1, 0.2, 0.1, -0.05, 0.15, 0.2], jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        X1 = lie.sim3_apply(s[None], R[None], t[None], X2)
        x1 = X1[:, :2] / X1[:, 2:3]
        x2 = X2[:, :2] / X2[:, 2:3]
        # corrupt 20 correspondences
        X2c = X2.at[:20].add(jnp.asarray(rng.normal(0, 2.0, (20, 3)),
                                         jnp.float32))
        res = sim3.solve_sim3(KEY, X1, X2c, x1, x2, jnp.ones(n, bool),
                              focal=460.0, fix_scale=False)
        assert int(res.n_inliers) >= 70
        np.testing.assert_allclose(float(res.s), float(s), rtol=1e-3)
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=1e-3)
        np.testing.assert_allclose(np.asarray(res.t), np.asarray(t), atol=1e-2)

    def test_fix_scale_mode(self):
        rng = np.random.default_rng(11)
        n = 80
        X2 = make_scene(rng, n)
        R, t = lie.se3_exp(jnp.asarray([0.3, -0.1, 0.2, 0.1, -0.05, 0.15],
                                       jnp.float32))
        X1 = lie.se3_apply(R[None], t[None], X2)
        x1 = X1[:, :2] / X1[:, 2:3]
        x2 = X2[:, :2] / X2[:, 2:3]
        res = sim3.solve_sim3(KEY, X1, X2, x1, x2, jnp.ones(n, bool),
                              focal=460.0, fix_scale=True)
        assert float(res.s) == 1.0
        np.testing.assert_allclose(np.asarray(res.R), np.asarray(R), atol=1e-3)
