"""Oriented BRIEF-256 descriptors + intensity-centroid orientation.

TPU-native replacement for the reference's IC_Angle / computeOrbDescriptor
(/root/reference/src/ORBextractor.cc:75,102): per-keypoint patch gathers are
vmapped over the whole keypoint batch instead of scalar loops.

The 256-pair sampling pattern is *generated* (seeded Gaussian pairs, the
original BRIEF construction) rather than copied from the reference's hardcoded
bit_pattern_31_ table — descriptor spaces are self-consistent within this
framework (matching + vocabulary are trained on the same pattern), so ORB
bit-compatibility is not required.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_R = 15          # orientation patch radius (reference HALF_PATCH_SIZE=15)
PATTERN_R = 13        # max abs pattern coordinate (reference pattern fits +-13)
DESC_PAD = 20         # sampling pad: ceil(13 * sqrt(2)) + 1


def make_pattern(seed: int = 42):
    """(256, 4) int32 of (x1, y1, x2, y2) test pairs ~ N(0, (31/5)^2), clipped."""
    rng = np.random.default_rng(seed)
    p = rng.normal(0.0, 31.0 / 5.0, size=(256, 4))
    return jnp.asarray(np.clip(np.round(p), -PATTERN_R, PATTERN_R), jnp.int32)


PATTERN = make_pattern()

# circular orientation mask, precomputed (31 x 31)
_vu = np.mgrid[-PATCH_R:PATCH_R + 1, -PATCH_R:PATCH_R + 1]
ORI_MASK = jnp.asarray((_vu[0] ** 2 + _vu[1] ** 2) <= PATCH_R ** 2, jnp.float32)
ORI_U = jnp.asarray(_vu[1], jnp.float32) * ORI_MASK
ORI_V = jnp.asarray(_vu[0], jnp.float32) * ORI_MASK


def compute_orientations(img, kps_yx):
    """Intensity-centroid angles for integer keypoints on one pyramid level.

    Args:
      img: (H, W) float32 raw level image.
      kps_yx: (N, 2) int32 (y, x) level coordinates.
    Returns:
      (N,) float32 angle in radians, in (-pi, pi].
    """
    pad = PATCH_R
    imgp = jnp.pad(img, pad, mode="reflect")

    def one(yx):
        patch = jax.lax.dynamic_slice(imgp, (yx[0], yx[1]),
                                      (2 * PATCH_R + 1, 2 * PATCH_R + 1))
        m10 = jnp.sum(ORI_U * patch)
        m01 = jnp.sum(ORI_V * patch)
        return jnp.arctan2(m01, m10)

    return jax.vmap(one)(kps_yx)


def compute_descriptors(img_blur, kps_yx, angles, pattern=PATTERN):
    """Rotated BRIEF-256, packed to uint32[..., 8].

    Args:
      img_blur: (H, W) float32 *blurred* level image (reference blurs with
        GaussianBlur 7x7 sigma=2 before describing).
      kps_yx: (N, 2) int32 (y, x) level coords.
      angles: (N,) float32 radians.
    Returns:
      (N, 8) uint32 packed descriptors (bit i of word w = test 32*w + i).
    """
    pad = DESC_PAD
    imgp = jnp.pad(img_blur, pad, mode="reflect")
    px1 = pattern[:, 0].astype(jnp.float32)
    py1 = pattern[:, 1].astype(jnp.float32)
    px2 = pattern[:, 2].astype(jnp.float32)
    py2 = pattern[:, 3].astype(jnp.float32)
    side = 2 * pad + 1

    def one(yx, ang):
        patch = jax.lax.dynamic_slice(imgp, (yx[0], yx[1]), (side, side))
        flat = patch.reshape(-1)
        ca, sa = jnp.cos(ang), jnp.sin(ang)

        def sample(px, py):
            xr = jnp.round(px * ca - py * sa).astype(jnp.int32) + pad
            yr = jnp.round(px * sa + py * ca).astype(jnp.int32) + pad
            return flat[yr * side + xr]

        bits = sample(px1, py1) < sample(px2, py2)  # (256,)
        words = bits.reshape(8, 32).astype(jnp.uint32)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        return jnp.sum(words << shifts, axis=-1).astype(jnp.uint32)

    return jax.vmap(one)(kps_yx, angles)
