"""FAST-9/16 corner detection as dense vectorized array ops.

TPU-native replacement for the per-cell cv::FAST calls in the reference's
ORBextractor::ComputeKeyPointsOctTree (/root/reference/src/ORBextractor.cc:740).
Instead of scalar pixel loops, the whole level is scored at once: 16 shifted
copies of the image give the Bresenham circle, bit-parallel rotations give the
"9 contiguous" test, and the FAST corner score is the max-over-runs of the
min-over-run intensity margin (the same quantity cv::FAST's cornerScore
computes by threshold bisection).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle radius 3, circular order (dx, dy) — OpenCV pixel order.
CIRCLE = np.array([
    (0, -3), (1, -3), (2, -2), (3, -1), (3, 0), (3, 1), (2, 2), (1, 3),
    (0, 3), (-1, 3), (-2, 2), (-3, 1), (-3, 0), (-3, -1), (-2, -2), (-1, -3),
], dtype=np.int32)


def _circle_diffs(img):
    """(H, W) -> (16, H, W) of I(p_i) - I(p) for the 16 circle pixels."""
    shifted = []
    for dx, dy in CIRCLE:
        shifted.append(jnp.roll(img, shift=(-int(dy), -int(dx)), axis=(0, 1)))
    return jnp.stack(shifted) - img[None]


def _run9_min(d):
    """(16, H, W) -> (16, H, W): min over the 9 consecutive circle entries
    starting at each position (circular), via log-step folding."""
    m = jnp.minimum(d, jnp.roll(d, -1, axis=0))       # runs of 2
    m = jnp.minimum(m, jnp.roll(m, -2, axis=0))       # 4
    m = jnp.minimum(m, jnp.roll(m, -4, axis=0))       # 8
    return jnp.minimum(m, jnp.roll(d, -8, axis=0))    # 9 = 8 + 1


def fast_score(img):
    """Dense FAST-9 corner score for every pixel.

    Returns float32 (H, W): the largest threshold t for which the pixel is
    still a FAST-9 corner (0 where not a corner at t=0+). Border of 3 px is
    garbage (circular roll wrap) — callers mask it.
    """
    d = _circle_diffs(img)
    bright = jnp.max(_run9_min(d), axis=0)      # > t  -> bright corner
    dark = jnp.max(_run9_min(-d), axis=0)       # > t  -> dark corner
    return jnp.maximum(bright, dark)


def fast_corners(img, threshold: float):
    """Boolean corner mask at a given threshold (no NMS). Matches
    cv2.FastFeatureDetector(TYPE_9_16, nonmaxSuppression=False) away from the
    3-px border."""
    return fast_score(img) > threshold


def nms3(score):
    """3x3 non-max suppression mask: True where score is the strict max of its
    neighborhood (ties broken towards the earlier pixel via >=)."""
    neigh = -jnp.inf * jnp.ones_like(score)
    p = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            neigh = jnp.maximum(
                neigh, jax.lax.dynamic_slice(p, (1 + dy, 1 + dx), score.shape))
    return score >= neigh


def border_mask(h: int, w: int, border: int):
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    return ((ys >= border) & (ys < h - border) &
            (xs >= border) & (xs < w - border))
