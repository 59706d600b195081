"""Stereo rectification: Bouguet-style rectifying rotations, precomputed
remap grids, and a jitted bilinear remap.

TPU-native replacement for the reference's
Settings::precomputeRectificationMaps (/root/reference/src/Settings.cc:
185-199, which calls cv::stereoRectify + cv::initUndistortRectifyMap) and
the cv::remap preamble of System::TrackStereo (src/System.cc:253-268).

The maps are computed ONCE on the host (numpy-compatible jnp, any camera
model including KB8 fisheye via project_distorted), then every frame pays
one fused gather kernel (`remap_bilinear`) on device — the remap rides the
same dispatch as extraction.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import cameras, lie


class RectifyMaps(NamedTuple):
    """Precomputed rectification state for one stereo rig.

    map1, map2: (H, W, 2) source pixel coords (x, y) for each rectified
      output pixel of the left/right camera.
    cam_new: rectified pinhole camera (shared intrinsics, zero distortion).
    baseline: () rectified baseline (m) — pure x translation.
    R_rect1: (3,3) rotation applied to camera-1 frame (world anchoring:
      X_rect = R_rect1 @ X_c1).
    """
    map1: jnp.ndarray
    map2: jnp.ndarray
    cam_new: cameras.Camera
    baseline: jnp.ndarray
    R_rect1: jnp.ndarray


def rectifying_rotations(R_12, t_12):
    """Bouguet split-rotation rectification (cv::stereoRectify's scheme).

    T_12 = (R_12, t_12) maps camera-2 points into camera-1
    (X_c1 = R_12 X_c2 + t_12 — the reference's Stereo.T_c1_c2).
    Returns (R_rect1, R_rect2, baseline) with
      R_rect1 @ R_12 = R_rect2   and   R_rect1 @ t_12 = [b, 0, 0].
    """
    r = lie.so3_log(R_12)
    A1 = lie.so3_exp(-0.5 * r)          # half-rotation applied to cam1
    A2 = lie.matmat(A1, R_12)           # = exp(+r/2)
    t_h = lie.matvec(A1, t_12)          # baseline in the half-rotated frame
    b = jnp.linalg.norm(t_h)
    e1 = t_h / jnp.where(b < 1e-12, 1.0, b)
    up = jnp.asarray([0.0, 0.0, 1.0], R_12.dtype)
    e2 = jnp.cross(up, e1)
    e2 = e2 / jnp.clip(jnp.linalg.norm(e2), 1e-12, None)
    e3 = jnp.cross(e1, e2)
    Wrow = jnp.stack([e1, e2, e3])      # rows
    R_rect1 = lie.matmat(Wrow, A1)
    R_rect2 = lie.matmat(Wrow, A2)
    return R_rect1, R_rect2, b


def _build_map(cam_src: cameras.Camera, R_rect, cam_new: cameras.Camera,
               width: int, height: int):
    """(H, W, 2) source-pixel lookup for one camera: rectified pixel ->
    bearing in the rectified frame -> original camera frame -> distorted
    projection through the ORIGINAL model."""
    u = jnp.arange(width, dtype=jnp.float32)
    v = jnp.arange(height, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)                      # (H, W)
    xn = jnp.stack([(uu - cam_new.params[2]) / cam_new.params[0],
                    (vv - cam_new.params[3]) / cam_new.params[1],
                    jnp.ones_like(uu)], axis=-1)     # (H, W, 3)
    dirs = lie.matvec(R_rect.T[None, None], xn)      # into original cam
    return cameras.project_distorted(cam_src, dirs)  # (H, W, 2)


def build_rectify_maps(cam1: cameras.Camera, cam2: cameras.Camera,
                       T_c1_c2, width: int, height: int,
                       focal: float = None) -> RectifyMaps:
    """Precompute both remap grids from the raw calibration (reference
    Settings::precomputeRectificationMaps, Settings.cc:185)."""
    T = jnp.asarray(T_c1_c2, jnp.float32)
    R_12, t_12 = T[:3, :3], T[:3, 3]
    R_rect1, R_rect2, b = rectifying_rotations(R_12, t_12)
    f = float(focal) if focal is not None else float(cam1.params[0])
    cam_new = cameras.pinhole(f, f, width / 2.0, height / 2.0)
    map1 = _build_map(cam1, R_rect1, cam_new, width, height)
    map2 = _build_map(cam2, R_rect2, cam_new, width, height)
    return RectifyMaps(map1=map1, map2=map2, cam_new=cam_new,
                       baseline=b, R_rect1=R_rect1)


@jax.jit
def remap_bilinear(img, map_xy):
    """Sample `img` (H_s, W_s) at `map_xy` (H, W, 2 = x,y source coords)
    with bilinear interpolation; out-of-bounds -> 0 (matches cv::remap
    BORDER_CONSTANT used by the reference)."""
    Hs, Ws = img.shape
    x = map_xy[..., 0]
    y = map_xy[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, Ws - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, Hs - 1)
    x1i = jnp.clip(x0i + 1, 0, Ws - 1)
    y1i = jnp.clip(y0i + 1, 0, Hs - 1)
    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    out = (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
           + v10 * (1 - fx) * fy + v11 * fx * fy)
    inside = (x >= 0) & (x <= Ws - 1) & (y >= 0) & (y <= Hs - 1)
    return jnp.where(inside, out, 0.0)
