"""Camera model tests: project/unproject round trips, Jacobians vs autodiff,
and golden comparison against OpenCV's fisheye/pinhole routines."""
import cv2
import jax
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import cameras

RNG = np.random.default_rng(1)

# EuRoC cam0 intrinsics (pinhole + radtan)
PIN = cameras.pinhole(458.654, 457.296, 367.215, 248.375,
                      dist=[-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05])
# TUM-VI style KB8 fisheye
KB8 = cameras.kannala_brandt8(190.978, 190.973, 254.932, 256.897,
                              0.00348238, 0.000715034, -0.00205323, 0.000202936)


def rand_cam_points(n, fov_scale=0.6):
    d = RNG.normal(size=(n, 3)) * np.array([fov_scale, fov_scale, 0.0]) + np.array([0, 0, 1.0])
    d[:, 2] = RNG.uniform(0.5, 10.0, size=n)
    d[:, :2] *= d[:, 2:3]
    return jnp.asarray(d, jnp.float32)


class TestPinhole:
    def test_project_unproject(self):
        p = rand_cam_points(256)
        uv = cameras.project(PIN, p)
        rays = cameras.unproject(PIN, uv)
        p_norm = p / p[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays), np.asarray(p_norm), atol=1e-4)

    def test_jacobian_vs_autodiff(self):
        p = rand_cam_points(32)
        J = cameras.project_jac(PIN, p)
        J_ad = jax.vmap(jax.jacfwd(lambda q: cameras.project(PIN, q)))(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=1e-4, atol=1e-4)

    def test_distorted_project_matches_opencv(self):
        p = np.asarray(rand_cam_points(64), np.float64)
        K = np.asarray(PIN.K(), np.float64)
        dist = np.asarray(PIN.params[4:9], np.float64)[[0, 1, 2, 3, 4]]
        # OpenCV ordering: k1 k2 p1 p2 k3 — same as ours
        uv_cv, _ = cv2.projectPoints(p.reshape(-1, 1, 3), np.zeros(3), np.zeros(3), K, dist)
        uv = cameras.project_distorted(PIN, jnp.asarray(p, jnp.float32))
        np.testing.assert_allclose(np.asarray(uv), uv_cv.reshape(-1, 2), atol=0.1)

    def test_undistort_matches_opencv(self):
        p = rand_cam_points(256, fov_scale=0.3)
        uv_raw_all = cameras.project_distorted(PIN, p)
        # fixed-point undistortion (ours and cv2's) is only valid inside the
        # image region; keep points that project there
        inside = np.asarray((uv_raw_all[:, 0] > 20) & (uv_raw_all[:, 0] < 730) &
                            (uv_raw_all[:, 1] > 20) & (uv_raw_all[:, 1] < 460))
        uv_raw = uv_raw_all[np.nonzero(inside)[0][:64]]
        K = np.asarray(PIN.K(), np.float64)
        dist = np.asarray(PIN.params[4:9], np.float64)
        und_cv = cv2.undistortPoints(np.asarray(uv_raw, np.float64).reshape(-1, 1, 2),
                                     K, dist, P=K).reshape(-1, 2)
        und = cameras.undistort_points(PIN, uv_raw)
        np.testing.assert_allclose(np.asarray(und), und_cv, atol=0.1)


class TestKB8:
    def test_project_matches_opencv_fisheye(self):
        p = np.asarray(rand_cam_points(64, fov_scale=1.0), np.float64)
        K = np.asarray(KB8.K(), np.float64)
        D = np.asarray(KB8.params[4:8], np.float64)
        uv_cv, _ = cv2.fisheye.projectPoints(p.reshape(-1, 1, 3), np.zeros(3),
                                             np.zeros(3), K, D)
        uv = cameras.project(KB8, jnp.asarray(p, jnp.float32))
        np.testing.assert_allclose(np.asarray(uv), uv_cv.reshape(-1, 2), atol=0.05)

    def test_unproject_roundtrip(self):
        p = rand_cam_points(256, fov_scale=1.2)
        uv = cameras.project(KB8, p)
        rays = cameras.unproject(KB8, uv)
        p_norm = p / p[:, 2:3]
        np.testing.assert_allclose(np.asarray(rays), np.asarray(p_norm), atol=1e-3)

    def test_jacobian_vs_autodiff(self):
        p = rand_cam_points(32, fov_scale=1.0)
        J = cameras.project_jac(KB8, p)
        J_ad = jax.vmap(jax.jacfwd(lambda q: cameras.project(KB8, q)))(p)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ad), rtol=2e-3, atol=2e-3)

    def test_wide_angle(self):
        # points at ~80 deg off-axis must still round-trip (fisheye FOV)
        theta = np.deg2rad(80.0)
        d = np.stack([np.sin(theta) * np.cos(np.linspace(0, 6, 16)),
                      np.sin(theta) * np.sin(np.linspace(0, 6, 16)),
                      np.full(16, np.cos(theta))], axis=-1)
        p = jnp.asarray(d * 3.0, jnp.float32)
        uv = cameras.project(KB8, p)
        rays = cameras.unproject_bearing(KB8, uv)
        d_unit = d / np.linalg.norm(d, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(rays), d_unit, atol=1e-3)
