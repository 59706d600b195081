"""Robust kernel weights for iteratively-reweighted least squares.

Replaces g2o's RobustKernelHuber/Cauchy (reference
Thirdparty/g2o/g2o/core/robust_kernel_impl.cpp) in the IRLS form: each
residual block's information is scaled by w(chi2) = rho'(chi2)."""
from __future__ import annotations

import jax.numpy as jnp


def huber_weight(chi2, delta2):
    """IRLS weight for the Huber kernel at squared error chi2 (delta2 =
    delta^2). w = 1 inside, delta/|r| outside."""
    return jnp.where(chi2 <= delta2, 1.0,
                     jnp.sqrt(delta2 / jnp.clip(chi2, 1e-12, None)))


def cauchy_weight(chi2, delta2):
    return 1.0 / (1.0 + chi2 / delta2)
