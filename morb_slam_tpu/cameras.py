"""Camera projection models: pinhole (+ radial-tangential distortion) and
Kannala-Brandt-8 equidistant fisheye.

TPU-native replacement for the reference's CameraModels
(/root/reference/include/CameraModels/{GeometricCamera,Pinhole,KannalaBrandt8}.h,
src/CameraModels/*.cpp): project / unproject / projection Jacobian, with the
fisheye unprojection solved by a fixed-iteration Newton scheme (the reference
uses precision 1e-6, KannalaBrandt8.h:41).

Cameras are plain pytrees (dataclass-style dicts of arrays) so they vmap/jit
freely; all ops broadcast over leading batch dims of the point arrays.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

CAM_PINHOLE = 0
CAM_FISHEYE = 1


class Camera(NamedTuple):
    """A camera model. `kind` is static (python int) so jit specializes on it.

    params layout:
      pinhole: [fx, fy, cx, cy, k1, k2, p1, p2, k3]  (distortion optional -> 0)
      fisheye (KB8): [fx, fy, cx, cy, k1, k2, k3, k4, 0]
    """
    kind: int
    params: jnp.ndarray  # (9,)

    @property
    def fx(self):
        return self.params[..., 0]

    @property
    def fy(self):
        return self.params[..., 1]

    @property
    def cx(self):
        return self.params[..., 2]

    @property
    def cy(self):
        return self.params[..., 3]

    def K(self):
        """3x3 intrinsics matrix (reference GeometricCamera::toK)."""
        fx, fy, cx, cy = self.params[0], self.params[1], self.params[2], self.params[3]
        z = jnp.zeros_like(fx)
        o = jnp.ones_like(fx)
        return jnp.stack([
            jnp.stack([fx, z, cx]),
            jnp.stack([z, fy, cy]),
            jnp.stack([z, z, o]),
        ])


def pinhole(fx, fy, cx, cy, dist=None, dtype=jnp.float32) -> Camera:
    d = jnp.zeros(5, dtype) if dist is None else jnp.asarray(dist, dtype)
    d = jnp.concatenate([d, jnp.zeros(5 - d.shape[0], dtype)]) if d.shape[0] < 5 else d[:5]
    return Camera(CAM_PINHOLE, jnp.concatenate([jnp.asarray([fx, fy, cx, cy], dtype), d]))


def kannala_brandt8(fx, fy, cx, cy, k1, k2, k3, k4, dtype=jnp.float32) -> Camera:
    return Camera(CAM_FISHEYE,
                  jnp.asarray([fx, fy, cx, cy, k1, k2, k3, k4, 0.0], dtype))


# ---------------------------------------------------------------------------
# Projection
# ---------------------------------------------------------------------------

def project(cam: Camera, pts):
    """Camera-frame 3D points (..., 3) -> pixel coords (..., 2).

    Pinhole path assumes *undistorted* projection (the SLAM pipeline works on
    undistorted keypoints, matching reference Frame::UndistortKeyPoints); the
    distortion coefficients are used only by `distort`/`undistort_points`.
    """
    if cam.kind == CAM_PINHOLE:
        z = pts[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        x = pts[..., 0] / zs
        y = pts[..., 1] / zs
        return jnp.stack([cam.params[0] * x + cam.params[2],
                          cam.params[1] * y + cam.params[3]], axis=-1)
    else:
        return _kb8_project(cam.params, pts)


def _kb8_theta_d(params, theta):
    k1, k2, k3, k4 = params[4], params[5], params[6], params[7]
    t2 = theta * theta
    return theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))


def _kb8_project(params, pts):
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.arctan2(r, z)
    theta_d = _kb8_theta_d(params, theta)
    r_safe = jnp.where(r < 1e-9, 1.0, r)
    scale = jnp.where(r < 1e-9, jnp.zeros_like(r), theta_d / r_safe)
    u = params[0] * scale * x + params[2]
    v = params[1] * scale * y + params[3]
    return jnp.stack([u, v], axis=-1)


def project_jac(cam: Camera, pts):
    """d(pixel)/d(camera-frame point): (..., 2, 3).

    Mirrors reference GeometricCamera::projectJac (Pinhole.cpp / KannalaBrandt8.cpp
    analytic Jacobians) but computed with closed forms below (autodiff-checked in
    tests).
    """
    if cam.kind == CAM_PINHOLE:
        fx, fy = cam.params[0], cam.params[1]
        z = pts[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        inv_z = 1.0 / zs
        inv_z2 = inv_z * inv_z
        x, y = pts[..., 0], pts[..., 1]
        zero = jnp.zeros_like(z)
        row0 = jnp.stack([fx * inv_z, zero, -fx * x * inv_z2], axis=-1)
        row1 = jnp.stack([zero, fy * inv_z, -fy * y * inv_z2], axis=-1)
        return jnp.stack([row0, row1], axis=-2)
    else:
        # closed-form KB8 Jacobian
        p = cam.params
        fx, fy = p[0], p[1]
        k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
        x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
        r2 = x * x + y * y
        r = jnp.sqrt(jnp.maximum(r2, 1e-18))
        theta = jnp.arctan2(r, z)
        t2 = theta * theta
        theta_d = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4))))
        d_theta_d = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        R2 = r2 + z * z
        # d theta / d(x,y,z)
        dth_dx = x * z / (R2 * r)
        dth_dy = y * z / (R2 * r)
        dth_dz = -r / R2
        inv_r = 1.0 / r
        s = theta_d * inv_r
        # u = fx * s * x + cx ;  ds/dq = (d_theta_d * dth_dq) / r - theta_d * (dr_dq) / r^2
        dr_dx = x * inv_r
        dr_dy = y * inv_r
        ds_dx = d_theta_d * dth_dx * inv_r - theta_d * dr_dx * inv_r * inv_r
        ds_dy = d_theta_d * dth_dy * inv_r - theta_d * dr_dy * inv_r * inv_r
        ds_dz = d_theta_d * dth_dz * inv_r
        du_dx = fx * (ds_dx * x + s)
        du_dy = fx * ds_dy * x
        du_dz = fx * ds_dz * x
        dv_dx = fy * ds_dx * y
        dv_dy = fy * (ds_dy * y + s)
        dv_dz = fy * ds_dz * y
        row0 = jnp.stack([du_dx, du_dy, du_dz], axis=-1)
        row1 = jnp.stack([dv_dx, dv_dy, dv_dz], axis=-1)
        return jnp.stack([row0, row1], axis=-2)


# ---------------------------------------------------------------------------
# Unprojection
# ---------------------------------------------------------------------------

def unproject(cam: Camera, uv):
    """Pixel coords (..., 2) -> unit-depth bearing (..., 3) with z = 1.

    KB8 inverts theta_d(theta) by Newton iteration (fixed 10 steps; reference
    iterates to 1e-6 precision, KannalaBrandt8.cpp unprojection)."""
    mx = (uv[..., 0] - cam.params[2]) / cam.params[0]
    my = (uv[..., 1] - cam.params[3]) / cam.params[1]
    if cam.kind == CAM_PINHOLE:
        return jnp.stack([mx, my, jnp.ones_like(mx)], axis=-1)
    p = cam.params
    k1, k2, k3, k4 = p[4], p[5], p[6], p[7]
    theta_d = jnp.sqrt(mx * mx + my * my)
    theta_d_c = jnp.clip(theta_d, -jnp.pi / 2, jnp.pi / 2)
    theta = theta_d_c

    def newton(_, th):
        t2 = th * th
        f = th * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - theta_d_c
        fp = 1.0 + t2 * (3 * k1 + t2 * (5 * k2 + t2 * (7 * k3 + t2 * 9 * k4)))
        return th - f / jnp.where(jnp.abs(fp) < 1e-8, 1e-8, fp)

    theta = jax.lax.fori_loop(0, 10, newton, theta)
    scale = jnp.where(theta_d < 1e-9, jnp.ones_like(theta),
                      jnp.tan(theta) / jnp.where(theta_d < 1e-9, 1.0, theta_d))
    return jnp.stack([mx * scale, my * scale, jnp.ones_like(mx)], axis=-1)


def unproject_bearing(cam: Camera, uv):
    """Pixel -> unit-norm bearing vector."""
    v = unproject(cam, uv)
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


# ---------------------------------------------------------------------------
# Pinhole distortion (for undistorting raw keypoints; radtan model)
# ---------------------------------------------------------------------------

def distort(cam: Camera, uv_norm):
    """Apply radtan distortion to normalized coords (..., 2) (pinhole only)."""
    k1, k2, p1, p2, k3 = (cam.params[4], cam.params[5], cam.params[6],
                          cam.params[7], cam.params[8])
    x, y = uv_norm[..., 0], uv_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    yd = y * radial + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_points(cam: Camera, uv):
    """Undistort raw pixel keypoints -> undistorted pixel coords (..., 2).

    Fixed-point iteration (8 steps), mirroring cv::undistortPoints semantics used
    by reference Frame::UndistortKeyPoints (Frame.cc:829)."""
    if cam.kind != CAM_PINHOLE:
        # fisheye pipeline works on distorted coords directly (reference skips
        # undistortion for KannalaBrandt8, Frame.cc mvKeysUn = mvKeys)
        return uv
    fx, fy, cx, cy = cam.params[0], cam.params[1], cam.params[2], cam.params[3]
    xd = (uv[..., 0] - cx) / fx
    yd = (uv[..., 1] - cy) / fy
    d = jnp.stack([xd, yd], axis=-1)

    def body(_, x):
        dx = distort(cam, x) - x
        return d - dx

    x = jax.lax.fori_loop(0, 8, body, d)
    return jnp.stack([x[..., 0] * fx + cx, x[..., 1] * fy + cy], axis=-1)


def project_distorted(cam: Camera, pts):
    """Camera-frame 3D -> raw (distorted) pixel coords; used by synthetic data gen."""
    if cam.kind == CAM_PINHOLE:
        z = pts[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        n = jnp.stack([pts[..., 0] / zs, pts[..., 1] / zs], axis=-1)
        dn = distort(cam, n)
        return jnp.stack([cam.params[0] * dn[..., 0] + cam.params[2],
                          cam.params[1] * dn[..., 1] + cam.params[3]], axis=-1)
    return _kb8_project(cam.params, pts)
