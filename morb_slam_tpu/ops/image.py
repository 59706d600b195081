"""Image-level ops: pyramid construction, separable Gaussian blur.

TPU-native replacement for the reference's ORBextractor::ComputePyramid
(/root/reference/src/ORBextractor.cc:1088) and the pre-descriptor GaussianBlur
(7x7, sigma=2) call. Shapes are static per pyramid level so XLA compiles each
level once.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def level_shapes(h: int, w: int, n_levels: int, scale: float):
    """Static (h, w) per pyramid level, floor-rounded like cv::resize."""
    shapes = []
    for l in range(n_levels):
        inv = 1.0 / (scale ** l)
        shapes.append((int(round(h * inv)), int(round(w * inv))))
    return shapes


def resize_bilinear(img, out_hw):
    """Bilinear resize (H, W) -> out_hw, matching cv::resize INTER_LINEAR
    pixel-center alignment."""
    return jax.image.resize(img, out_hw, method="linear")


def build_pyramid(img, n_levels: int, scale: float):
    """Grayscale (H, W) float32 -> list of per-level images (static shapes).

    Successive downscale from the previous level (like the reference) rather
    than from level 0 — cheaper and matches its aliasing behavior.
    """
    h, w = img.shape
    shapes = level_shapes(h, w, n_levels, scale)
    levels = [img]
    for l in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[l]))
    return levels


def _gaussian_kernel1d(ksize: int, sigma: float):
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return jnp.asarray(k / k.sum(), jnp.float32)


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img, ksize: int = 7, sigma: float = 2.0):
    """Separable Gaussian blur with edge replication (cv::BORDER_REFLECT_101
    approximated by edge replication; difference only in outermost rows)."""
    k = _gaussian_kernel1d(ksize, sigma)
    r = ksize // 2
    # rows
    p = jnp.pad(img, ((r, r), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[0], axis=0)
    # cols
    p = jnp.pad(out, ((0, 0), (r, r)), mode="edge")
    out2 = jnp.zeros_like(img)
    for i in range(ksize):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(p, i, img.shape[1], axis=1)
    return out2
