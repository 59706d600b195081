"""ORB feature extraction: pyramid + FAST + spatially-balanced selection +
orientation + rotated BRIEF, as one jitted array program per image geometry.

TPU-native replacement for the reference's ORBextractor::operator()
(/root/reference/src/ORBextractor.cc:1006-1086): the per-cell FAST loops and
the recursive quadtree (DistributeOctTree, ORBextractor.cc:540) become dense
whole-level scoring plus a deterministic fixed-grid top-k selection — cap k
per 16px cell, then keep the best N_level globally. The two-threshold retry
(iniThFAST then minThFAST, ORBextractor.cc:740) is reproduced in one pass by
key-boosting corners that clear the high threshold.

Outputs are fixed-capacity masked arrays — the TPU contract for dynamic counts.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops import fast as fast_ops
from .ops import image as image_ops
from .ops import orb_descriptor as orb_desc

BORDER = 16          # detection inset per level (reference EDGE_THRESHOLD-3)
CELL = 16            # selection grid cell size in px
CELL_K = 2           # max keypoints kept per cell
STRONG_BOOST = 1e4   # key boost for corners above the high threshold


@dataclass(frozen=True)
class OrbConfig:
    n_features: int = 1200
    n_levels: int = 8
    scale: float = 1.2
    th_fast_hi: float = 20.0
    th_fast_lo: float = 7.0

    def per_level_counts(self):
        """Geometric feature budget per level (reference ORBextractor ctor)."""
        f = 1.0 / self.scale
        total = (1 - f ** self.n_levels) / (1 - f)
        counts = [int(round(self.n_features / total * f ** l))
                  for l in range(self.n_levels)]
        counts[-1] = max(0, self.n_features - sum(counts[:-1]))
        return counts


class Features(NamedTuple):
    """Fixed-capacity extracted features (capacity = config.n_features).

    uv: (N, 2) float32 level-0 pixel coords (x, y)
    response: (N,) float32 FAST score
    angle: (N,) float32 radians
    octave: (N,) int32 pyramid level
    size: (N,) float32 patch diameter at level scale
    desc: (N, 8) uint32 packed BRIEF-256
    valid: (N,) bool
    """
    uv: jnp.ndarray
    response: jnp.ndarray
    angle: jnp.ndarray
    octave: jnp.ndarray
    size: jnp.ndarray
    desc: jnp.ndarray
    valid: jnp.ndarray

    @property
    def n(self):
        return jnp.sum(self.valid.astype(jnp.int32))


def _select_level_keypoints(score, n_keep: int):
    """Grid-balanced top-k selection on one level's key map.

    score: (H, W) float32 selection key (-inf where not a candidate).
    Returns (yx (n_keep, 2) int32, key (n_keep,) float32).
    """
    h, w = score.shape
    hp = -(-h // CELL) * CELL
    wp = -(-w // CELL) * CELL
    s = jnp.pad(score, ((0, hp - h), (0, wp - w)), constant_values=-jnp.inf)
    ncy, ncx = hp // CELL, wp // CELL
    cells = s.reshape(ncy, CELL, ncx, CELL).transpose(0, 2, 1, 3).reshape(
        ncy * ncx, CELL * CELL)
    vals, idx = jax.lax.top_k(cells, CELL_K)            # (ncells, K)
    cy = jnp.arange(ncy * ncx) // ncx
    cx = jnp.arange(ncy * ncx) % ncx
    ys = cy[:, None] * CELL + idx // CELL
    xs = cx[:, None] * CELL + idx % CELL
    flat_vals = vals.reshape(-1)
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    top_vals, top_i = jax.lax.top_k(flat_vals, n_keep)
    yx = jnp.stack([flat_y[top_i], flat_x[top_i]], axis=-1).astype(jnp.int32)
    return yx, top_vals


def _extract_level(img, n_keep: int, cfg: OrbConfig):
    """Full single-level pipeline -> per-level feature slots."""
    h, w = img.shape
    score = fast_ops.fast_score(img)
    nms = fast_ops.nms3(score)
    mask = fast_ops.border_mask(h, w, BORDER)
    is_weak = (score > cfg.th_fast_lo) & nms & mask
    is_strong = score > cfg.th_fast_hi
    key = jnp.where(is_weak, score + STRONG_BOOST * is_strong, -jnp.inf)
    yx, keyv = _select_level_keypoints(key, n_keep)
    valid = keyv > -jnp.inf / 2
    yx = jnp.where(valid[:, None], yx, 0)

    angles = orb_desc.compute_orientations(img, yx)
    blurred = image_ops.gaussian_blur(img)
    desc = orb_desc.compute_descriptors(blurred, yx, angles)
    resp = score[yx[:, 0], yx[:, 1]]
    return yx, angles, desc, resp, valid


def extract_orb(img, cfg: OrbConfig = OrbConfig()):
    """Grayscale (H, W) float32 in [0, 255] -> Features (capacity n_features).

    Jit this per image geometry; all shapes are static.
    """
    levels = image_ops.build_pyramid(img, cfg.n_levels, cfg.scale)
    counts = cfg.per_level_counts()
    uv_all, resp_all, ang_all, oct_all, size_all, desc_all, valid_all = \
        [], [], [], [], [], [], []
    for l, (lvl_img, n_keep) in enumerate(zip(levels, counts)):
        if n_keep == 0:
            continue
        yx, ang, desc, resp, valid = _extract_level(lvl_img, n_keep, cfg)
        s = cfg.scale ** l
        uv = jnp.stack([yx[:, 1].astype(jnp.float32) * s,
                        yx[:, 0].astype(jnp.float32) * s], axis=-1)
        uv_all.append(uv)
        resp_all.append(resp)
        ang_all.append(ang)
        oct_all.append(jnp.full((n_keep,), l, jnp.int32))
        size_all.append(jnp.full((n_keep,), 31.0 * s, jnp.float32))
        desc_all.append(desc)
        valid_all.append(valid)
    return Features(
        uv=jnp.concatenate(uv_all),
        response=jnp.concatenate(resp_all),
        angle=jnp.concatenate(ang_all),
        octave=jnp.concatenate(oct_all),
        size=jnp.concatenate(size_all),
        desc=jnp.concatenate(desc_all),
        valid=jnp.concatenate(valid_all),
    )


extract_orb_jit = jax.jit(extract_orb, static_argnames=("cfg",))
