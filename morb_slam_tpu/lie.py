"""Lie groups SO(3) / SE(3) / Sim(3) as pure JAX functions.

TPU-native replacement for the reference's vendored Sophus headers
(/root/reference/Thirdparty/Sophus/sophus/{so3,se3,sim3,rxso3}.hpp): exp/log maps,
composition, group actions and the left/right Jacobians used by IMU preintegration
(reference ImuTypes.cc) and the inertial optimizer edges (reference G2oTypes.cc).

Conventions
-----------
* Rotations are (..., 3, 3) matrices; translations (..., 3); every function
  broadcasts over leading batch dims and is safe under vmap/jit/grad.
* SE(3) elements are (R, t) pairs; Sim(3) elements are (s, R, t) with scalar s.
* Tangent ordering: se3 = [rho(3), phi(3)] (translation first, rotation second,
  matching Sophus); sim3 = [rho(3), phi(3), sigma(1)].
* All small-angle branches use `jnp.where` on safe arguments so derivatives stay
  finite (no NaN from 0/0 under autodiff).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def _stack_last(rows):
    return jnp.stack(rows, axis=-2)


def _safe_norm(w):
    """|w| with a finite gradient at w = 0 (jnp.linalg.norm's gradient is
    NaN there, which poisons jacfwd of exp/log at the identity — exactly
    where optimization residuals live)."""
    return jnp.sqrt(jnp.sum(w * w, axis=-1) + 1e-24)


# Small-matrix products stay OFF the MXU: on TPU, `@` defaults to bf16 MXU
# passes, which corrupts 3x3 rotation algebra (observed rotation-level error
# ~1.2 from exp/log round trips). Broadcast-multiply + sum runs exact f32 on
# the VPU and is faster than a 3x3 matmul padded onto a 128x128 systolic array.

def matvec(M, v):
    """(..., m, n) x (..., n) -> (..., m), exact f32 on VPU."""
    return jnp.sum(M * v[..., None, :], axis=-1)


def matmat(A, B):
    """(..., m, k) x (..., k, n) -> (..., m, n), exact f32 on VPU."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _hat_sq(w):
    """hat(w) @ hat(w) = w w^T - |w|^2 I, computed without matmul."""
    outer = w[..., :, None] * w[..., None, :]
    n2 = jnp.sum(w * w, axis=-1)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), outer.shape)
    return outer - n2 * eye


# ---------------------------------------------------------------------------
# SO(3)
# ---------------------------------------------------------------------------

def so3_hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return _stack_last([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ])


def so3_vee(W):
    """(..., 3, 3) skew -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc(x):
    """sin(x)/x, stable at 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x):
    """(1-cos(x))/x^2, stable at 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(xs)) / (xs * xs))


def _sinc3(x):
    """(x - sin(x))/x^3, stable at 0."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 1.0 / 6.0 - x * x / 120.0, (xs - jnp.sin(xs)) / (xs ** 3))


def so3_exp(w):
    """Exponential map (..., 3) -> (..., 3, 3) via Rodrigues."""
    theta = _safe_norm(w)
    W = so3_hat(w)
    W2 = _hat_sq(w)
    a = _sinc(theta)[..., None, None]
    b = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + a * W + b * W2


def so3_log(R):
    """Log map (..., 3, 3) -> (..., 3). Robust near 0 and pi."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    # clip strictly inside (-1, 1): arccos has infinite gradient at the
    # endpoints, which would NaN any autodiff through log at the identity
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_theta)
    # generic branch: vee((R - R^T)/2) * theta/sin(theta)
    w_generic = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5
    scale = jnp.where(theta < 1e-4,
                      1.0 + theta * theta / 6.0,
                      theta / jnp.sin(jnp.where(theta < 1e-4, 1.0, theta)))
    w_small = w_generic * scale[..., None]
    # near pi: axis from diagonal of (R + I)/2 = aa^T cos-corrected
    # R = I + sin(t) W + (1-cos t) W^2 ; near pi, sin t ~ 0, use R+I ~ 2 aa^T(1-cos)+...
    B = (R + jnp.swapaxes(R, -1, -2)) * 0.5  # symmetric part
    # diag(B) = cos + (1-cos) a_i^2  => a_i^2 = (B_ii - cos)/(1-cos)
    one_minus = jnp.clip(1.0 - cos_theta, 1e-8, None)[..., None]
    diag = jnp.stack([B[..., 0, 0], B[..., 1, 1], B[..., 2, 2]], axis=-1)
    a2 = jnp.clip((diag - cos_theta[..., None]) / one_minus, 1e-12, None)
    a = jnp.sqrt(a2)
    # fix signs using off-diagonal of symmetric part and the skew part
    # sign of largest component set +, others from B_ij = (1-cos) a_i a_j
    idx = jnp.argmax(a2, axis=-1)
    off = jnp.stack([
        jnp.stack([diag[..., 0], B[..., 0, 1], B[..., 0, 2]], axis=-1),
        jnp.stack([B[..., 0, 1], diag[..., 1], B[..., 1, 2]], axis=-1),
        jnp.stack([B[..., 0, 2], B[..., 1, 2], diag[..., 2]], axis=-1),
    ], axis=-2)
    row = jnp.take_along_axis(off, idx[..., None, None].repeat(3, -1), axis=-2)[..., 0, :]
    # off-diagonal B_ij = (1-cos) a_i a_j gives sign(a_j) under the convention
    # a_dominant > 0; the diagonal entry can be negative, so pin it to + explicitly.
    onehot = jax.lax.broadcasted_iota(jnp.int32, row.shape, row.ndim - 1) == idx[..., None]
    sign = jnp.where(onehot, 1.0, jnp.where(row < 0, -1.0, 1.0))
    a_signed = a * sign
    # remaining overall sign ambiguity: match skew part when sin(theta) != 0
    w_skew = so3_vee(R - jnp.swapaxes(R, -1, -2)) * 0.5
    dot = jnp.sum(a_signed * w_skew, axis=-1, keepdims=True)
    a_signed = jnp.where(dot < 0, -a_signed, a_signed)
    w_pi = a_signed * theta[..., None]
    near_pi = (jnp.pi - theta) < 1e-3
    return jnp.where(near_pi[..., None], w_pi, w_small)


def so3_left_jacobian(w):
    """Left Jacobian J_l of SO(3): exp((J_l w) ^) approx relation. (...,3)->(...,3,3)."""
    theta = _safe_norm(w)
    W = so3_hat(w)
    W2 = _hat_sq(w)
    b = _cosc(theta)[..., None, None]
    c = _sinc3(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + b * W + c * W2


def so3_right_jacobian(w):
    """Right Jacobian J_r(w) = J_l(-w). Mirrors reference ImuTypes right-Jacobian
    helpers (include/ImuTypes.h:261-269)."""
    return so3_left_jacobian(-w)


def so3_right_jacobian_inv(w):
    theta = _safe_norm(w)
    W = so3_hat(w)
    W2 = _hat_sq(w)
    small = theta < 1e-4
    ts = jnp.where(small, jnp.ones_like(theta), theta)
    coef = jnp.where(
        small,
        1.0 / 12.0 + theta * theta / 720.0,
        (1.0 / (ts * ts)) - (1.0 + jnp.cos(ts)) / (2.0 * ts * jnp.sin(ts)),
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + 0.5 * W + coef * W2


def so3_left_jacobian_inv(w):
    return so3_right_jacobian_inv(-w)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------

def se3_exp(xi):
    """(..., 6) tangent [rho, phi] -> (R (...,3,3), t (...,3))."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    V = so3_left_jacobian(phi)
    t = matvec(V, rho)
    return R, t


def se3_log(R, t):
    """(R, t) -> (..., 6) tangent [rho, phi]."""
    phi = so3_log(R)
    Vinv = so3_left_jacobian_inv(phi)
    rho = matvec(Vinv, t)
    return jnp.concatenate([rho, phi], axis=-1)


def se3_inv(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -matvec(Rt, t)


def se3_mul(Ra, ta, Rb, tb):
    return matmat(Ra, Rb), matvec(Ra, tb) + ta


def se3_apply(R, t, p):
    """Apply transform to points p (..., 3)."""
    return matvec(R, p) + t


def se3_matrix(R, t):
    """(R, t) -> (..., 4, 4) homogeneous matrix."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    bottom = jnp.zeros(batch + (1, 4), dtype=R.dtype).at[..., 0, 3].set(1.0)
    top = jnp.concatenate([jnp.broadcast_to(R, batch + (3, 3)),
                           jnp.broadcast_to(t, batch + (3,))[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------

def sim3_exp(xi):
    """(..., 7) tangent [rho, phi, sigma] -> (s, R, t).

    Uses the RxSO3 W-matrix (Sophus sim3.hpp semantics): t = W rho,
    s = exp(sigma), R = exp(phi^).
    """
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(phi)
    theta = _safe_norm(phi)
    W = _sim3_W(theta, sigma, phi)
    t = matvec(W, rho)
    return s, R, t


def _sim3_W(theta, sigma, phi):
    """W matrix of Sim(3) exp (coefficients A, B, C of I, Phi, Phi^2)."""
    dtype = phi.dtype
    Phi = so3_hat(phi)
    Phi2 = _hat_sq(phi)
    s = jnp.exp(sigma)
    small_sig = jnp.abs(sigma) < 1e-5
    small_th = theta < 1e-5
    sig_safe = jnp.where(small_sig, jnp.ones_like(sigma), sigma)
    th_safe = jnp.where(small_th, jnp.ones_like(theta), theta)

    # C = (s - 1)/sigma
    C = jnp.where(small_sig, 1.0 + sigma / 2.0 + sigma * sigma / 6.0,
                  (s - 1.0) / sig_safe)

    # general both-nonzero coefficients
    a = s * jnp.sin(th_safe)
    b = s * jnp.cos(th_safe)
    th2 = th_safe * th_safe
    sig2 = sig_safe * sig_safe
    denom = jnp.where(small_sig | small_th, jnp.ones_like(sigma), sig2 + th2)
    A_gen = (a * sig_safe + (1.0 - b) * th_safe) / (th_safe * denom)
    B_gen = (C - ((b - 1.0) * sig_safe + a * th_safe) / denom) / th2

    # sigma -> 0 limits
    A_sig0 = _cosc(theta)          # (1 - cos)/theta^2
    B_sig0 = _sinc3(theta)         # (theta - sin)/theta^3
    # theta -> 0 limits
    A_th0 = jnp.where(small_sig, 0.5 + sigma / 6.0,
                      ((sig_safe - 1.0) * s + 1.0) / sig2)
    B_th0 = jnp.where(small_sig, 1.0 / 6.0 + sigma / 24.0,
                      (s * 0.5 * sig2 + s - 1.0 - sig_safe * s) / (sig2 * sig_safe))

    A = jnp.where(small_th, A_th0, jnp.where(small_sig, A_sig0, A_gen))
    B = jnp.where(small_th, B_th0, jnp.where(small_sig, B_sig0, B_gen))

    eye = jnp.broadcast_to(jnp.eye(3, dtype=dtype), Phi.shape)
    return C[..., None, None] * eye + A[..., None, None] * Phi + B[..., None, None] * Phi2


def sim3_log(s, R, t):
    """(s, R, t) -> (..., 7) tangent."""
    sigma = jnp.log(s)
    phi = so3_log(R)
    theta = _safe_norm(phi)
    W = _sim3_W(theta, sigma, phi)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)


def sim3_inv(s, R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    return s_inv, Rt, -s_inv[..., None] * matvec(Rt, t)


def sim3_mul(sa, Ra, ta, sb, Rb, tb):
    return sa * sb, matmat(Ra, Rb), sa[..., None] * matvec(Ra, tb) + ta


def sim3_apply(s, R, t, p):
    return s[..., None] * matvec(R, p) + t


# ---------------------------------------------------------------------------
# Quaternions (for IO / trajectory formats; Hamilton convention, [x, y, z, w])
# ---------------------------------------------------------------------------

def quat_to_rotmat(q):
    """(..., 4) [x,y,z,w] unit quaternion -> (..., 3, 3)."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return _stack_last([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
    ])


def rotmat_to_quat(R):
    """(..., 3, 3) -> (..., 4) [x,y,z,w]. Branch-free Shepperd via 4 candidates."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate quaternions, scaled; pick the numerically largest pivot
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], -1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], -1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], -1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], -1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 pivots, 4 comps [w?|..])
    # candidate i has components ordered [pivot-specific]; build proper xyzw per pivot
    # pivot 0 (w): [1+tr, m21-m12, m02-m20, m10-m01] -> (w, x, y, z)
    # pivot 1 (x): qx ordering is (w, x, y, z) as well by construction above
    pivots = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                        1 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    q_wxyz = jnp.take_along_axis(cands, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q_wxyz = q_wxyz / jnp.linalg.norm(q_wxyz, axis=-1, keepdims=True)
    x, y, z, w = q_wxyz[..., 1], q_wxyz[..., 2], q_wxyz[..., 3], q_wxyz[..., 0]
    q = jnp.stack([x, y, z, w], axis=-1)
    # canonical sign: w >= 0
    return jnp.where(q[..., 3:4] < 0, -q, q)
