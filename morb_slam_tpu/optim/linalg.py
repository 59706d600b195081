"""Dense linear-algebra helpers tuned for TPU.

jnp.linalg.solve lowers to LU with partial pivoting — row pivoting is a
sequential, scalar-heavy pattern the TPU executes poorly. Every dense system
in this framework is symmetric positive definite (damped Gauss-Newton /
Schur complements), so Cholesky + two triangular solves is both cheaper
(n^3/3 vs 2n^3/3) and maps onto XLA's blocked TPU Cholesky.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_spd(A, b, jitter: float = 0.0):
    """Solve A x = b for symmetric positive-definite A ((..., N, N) and
    (..., N) or (..., N, K)). `jitter` optionally adds eps*I for safety."""
    if jitter:
        A = A + jitter * jnp.eye(A.shape[-1], dtype=A.dtype)
    L = jax.lax.linalg.cholesky(A)
    vec = b.ndim == A.ndim - 1
    if vec:
        b = b[..., None]
    y = jax.lax.linalg.triangular_solve(L, b, left_side=True, lower=True,
                                        transpose_a=False)
    x = jax.lax.linalg.triangular_solve(L, y, left_side=True, lower=True,
                                        transpose_a=True)
    return x[..., 0] if vec else x


def inv3x3(M):
    """Closed-form batched 3x3 inverse via adjugate (no LU dispatch)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    adj = jnp.stack([jnp.stack([A, B, C], -1),
                     jnp.stack([D, E, F], -1),
                     jnp.stack([G, H, I], -1)], -2)
    return adj / det[..., None, None]


def _mm(a, b):
    """Exact small-matrix product — tiny matmuls must stay off the MXU's
    default bf16 path (see lie.matmat; the @ operator is precision-unsafe
    for 3x3 geometry on TPU)."""
    return jnp.einsum('...ij,...jk->...ik', a, b, precision='highest')


def inv6x6(M):
    """Batched 6x6 inverse via blockwise 3x3 Schur (closed-form 3x3s only —
    no LU/Cholesky dispatch; right size for per-pose Hessian blocks)."""
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, :3]
    D = M[..., 3:, 3:]
    Ai = inv3x3(A)
    S = D - _mm(C, _mm(Ai, B))
    Si = inv3x3(S)
    AiB = _mm(Ai, B)
    CAi = _mm(C, Ai)
    top_left = Ai + _mm(AiB, _mm(Si, CAi))
    top_right = -_mm(AiB, Si)
    bot_left = -_mm(Si, CAi)
    return jnp.concatenate([
        jnp.concatenate([top_left, top_right], axis=-1),
        jnp.concatenate([bot_left, Si], axis=-1)], axis=-2)


def solve_6x6(H, g):
    """x = H^-1 g for 6x6 SPD blocks via the closed-form inverse."""
    return jnp.einsum('...ab,...b->...a', inv6x6(H), g)
