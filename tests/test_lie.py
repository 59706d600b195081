"""Unit tests for the Lie-group core (SO3/SE3/Sim3) against scipy golden values
and algebraic properties (exp/log round trip, Jacobian identities)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from morb_slam_tpu import lie

RNG = np.random.default_rng(0)


def rand_w(n, scale=2.0):
    return jnp.asarray(RNG.normal(size=(n, 3)) * scale, jnp.float32)


class TestSO3:
    def test_exp_matches_scipy(self):
        w = rand_w(64)
        R = lie.so3_exp(w)
        R_ref = ScipyRot.from_rotvec(np.asarray(w)).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)

    def test_exp_log_roundtrip(self):
        w = rand_w(128, scale=1.0)
        # log returns the wrapped tangent, so keep |w| < pi
        n = jnp.linalg.norm(w, axis=-1, keepdims=True)
        w = w * jnp.minimum(n, 3.0) / n
        w2 = lie.so3_log(lie.so3_exp(w))
        np.testing.assert_allclose(np.asarray(w2), np.asarray(w), atol=1e-4)

    def test_log_near_pi(self):
        axes = np.asarray(RNG.normal(size=(32, 3)))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for ang in [np.pi - 1e-4, np.pi - 1e-5, np.pi]:
            w = jnp.asarray(axes * ang, jnp.float32)
            R = lie.so3_exp(w)
            w2 = lie.so3_log(R)
            # near pi, w and -w are equivalent; compare rotations
            R2 = lie.so3_exp(w2)
            np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=2e-3)

    def test_log_identity(self):
        R = jnp.broadcast_to(jnp.eye(3), (4, 3, 3))
        np.testing.assert_allclose(np.asarray(lie.so3_log(R)), 0.0, atol=1e-7)

    def test_small_angle(self):
        w = rand_w(16, scale=1e-6)
        R = lie.so3_exp(w)
        np.testing.assert_allclose(np.asarray(lie.so3_log(R)), np.asarray(w),
                                   atol=1e-8)

    def test_right_jacobian_fd(self):
        """exp(w + d) ~= exp(w) exp(Jr(w) d)."""
        w = rand_w(16, scale=1.0)
        d = rand_w(16, scale=1e-4)
        lhs = lie.so3_exp(w + d)
        Jr = lie.so3_right_jacobian(w)
        rhs = lie.so3_exp(w) @ lie.so3_exp((Jr @ d[..., None])[..., 0])
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)

    def test_right_jacobian_inv(self):
        w = rand_w(32, scale=1.5)
        J = lie.so3_right_jacobian(w)
        Jinv = lie.so3_right_jacobian_inv(w)
        eye = np.broadcast_to(np.eye(3), (32, 3, 3))
        np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-5)


class TestSE3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(64, 6)), jnp.float32)
        n = jnp.linalg.norm(xi[:, 3:], axis=-1, keepdims=True)
        xi = xi.at[:, 3:].mul(jnp.minimum(n, 3.0) / n)  # keep |phi| < pi
        R, t = lie.se3_exp(xi)
        xi2 = lie.se3_log(R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=1e-4)

    def test_inverse(self):
        xi = jnp.asarray(RNG.normal(size=(16, 6)), jnp.float32)
        R, t = lie.se3_exp(xi)
        Ri, ti = lie.se3_inv(R, t)
        Rc, tc = lie.se3_mul(R, t, Ri, ti)
        np.testing.assert_allclose(np.asarray(Rc),
                                   np.broadcast_to(np.eye(3), (16, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply_matches_matrix(self):
        xi = jnp.asarray(RNG.normal(size=(8, 6)), jnp.float32)
        R, t = lie.se3_exp(xi)
        p = jnp.asarray(RNG.normal(size=(8, 3)), jnp.float32)
        q = lie.se3_apply(R, t, p)
        T = lie.se3_matrix(R, t)
        ph = jnp.concatenate([p, jnp.ones((8, 1))], axis=-1)
        q2 = (T @ ph[..., None])[..., :3, 0]
        np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self):
        xi = jnp.asarray(RNG.normal(size=(64, 7)) * 0.8, jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        xi2 = lie.sim3_log(s, R, t)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)

    def test_reduces_to_se3_at_zero_sigma(self):
        xi7 = jnp.asarray(RNG.normal(size=(16, 7)), jnp.float32).at[:, 6].set(0.0)
        s, R, t = lie.sim3_exp(xi7)
        R2, t2 = lie.se3_exp(xi7[:, :6])
        np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t2), atol=1e-5)

    def test_group_ops(self):
        xi = jnp.asarray(RNG.normal(size=(16, 7)) * 0.5, jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        si, Ri, ti = lie.sim3_inv(s, R, t)
        sc, Rc, tc = lie.sim3_mul(s, R, t, si, Ri, ti)
        np.testing.assert_allclose(np.asarray(sc), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tc), 0.0, atol=1e-5)

    def test_apply(self):
        xi = jnp.asarray(RNG.normal(size=(4, 7)) * 0.5, jnp.float32)
        s, R, t = lie.sim3_exp(xi)
        p = jnp.asarray(RNG.normal(size=(4, 3)), jnp.float32)
        q = lie.sim3_apply(s, R, t, p)
        q_ref = s[:, None] * np.einsum('nij,nj->ni', np.asarray(R), np.asarray(p)) + t
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), atol=1e-5)


class TestQuat:
    def test_roundtrip(self):
        q = np.asarray(ScipyRot.random(64, rng=RNG).as_quat(), np.float32)  # xyzw
        R = lie.quat_to_rotmat(jnp.asarray(q))
        R_ref = ScipyRot.from_quat(q).as_matrix()
        np.testing.assert_allclose(np.asarray(R), R_ref, atol=1e-5)
        q2 = lie.rotmat_to_quat(R)
        # sign-canonicalize reference
        q_ref = np.where(q[..., 3:4] < 0, -q, q)
        np.testing.assert_allclose(np.asarray(q2), q_ref, atol=1e-5)


def test_jit_and_vmap_compose():
    f = jax.jit(jax.vmap(lambda w: lie.so3_log(lie.so3_exp(w))))
    w = rand_w(8, 0.5)
    np.testing.assert_allclose(np.asarray(f(w)), np.asarray(w), atol=1e-5)
