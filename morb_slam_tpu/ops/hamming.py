"""Hamming distance kernels over packed 256-bit binary descriptors.

TPU-native replacement for the reference's ORBmatcher::DescriptorDistance
popcount bithack (/root/reference/src/ORBmatcher.cc:1880) and the scalar
best/second-best search loops: the whole NxM distance matrix is produced at
once, two ways —

  * `hamming_matrix`   : XOR + population_count on the VPU (exact, uint32)
  * `hamming_matrix_mxu`: bit-unpack to +-1 bf16 and matmul on the MXU with
    f32 accumulation: dist = (256 - <a, b>) / 2. Exact because every partial
    sum is a small integer. This is the "popcount as matmul" form from
    SURVEY.md §2.2 and wins for large N, M.

Matching thresholds follow the reference (TH_HIGH=100, TH_LOW=50,
ratio 0.9/0.75 by call site; ORBmatcher.cc:35-37).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

TH_HIGH = 100
TH_LOW = 50

_BIT_SHIFTS = jnp.arange(32, dtype=jnp.uint32)


def unpack_bits(desc):
    """uint32 (..., 8) -> float (..., 256) of {0, 1} bits."""
    bits = (desc[..., :, None] >> _BIT_SHIFTS) & jnp.uint32(1)
    return bits.reshape(*desc.shape[:-1], 256)


def hamming_matrix(a, b):
    """(N, 8) x (M, 8) packed uint32 -> (N, M) int32 Hamming distances (VPU)."""
    x = a[:, None, :] ^ b[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def hamming_matrix_mxu(a, b):
    """Same result as hamming_matrix, computed as an MXU matmul.

    d(a,b) = popcount(a ^ b) = (256 - <sa, sb>)/2 with s* in {-1, +1}^256.
    bf16 inputs with f32 accumulation keep every term exact (|values| <= 256,
    integers)."""
    sa = (unpack_bits(a).astype(jnp.bfloat16) * 2 - 1)
    sb = (unpack_bits(b).astype(jnp.bfloat16) * 2 - 1)
    dot = jax.lax.dot_general(sa, sb, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def top2_min(d, big=jnp.int32(1 << 20)):
    """Row-wise best / best-index / second-best of a distance matrix.

    Three VPU reduction passes instead of jax.lax.top_k, which lowers to a
    (N, M) sort on TPU (~0.4 ms per 1200x1200 call — the matchers run
    dozens of these per mapping step)."""
    best_idx = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(d, best_idx[:, None], axis=1)[:, 0]
    cols = jnp.arange(d.shape[1], dtype=jnp.int32)
    second = jnp.min(jnp.where(cols[None, :] == best_idx[:, None],
                               jnp.asarray(big, d.dtype), d), axis=1)
    return best, best_idx, second


def match_nn(dist, a_valid, b_valid, max_dist=TH_LOW, ratio=1.0,
             cross_check=True):
    """Nearest-neighbour descriptor matching with Lowe ratio + cross check.

    Args:
      dist: (N, M) int32 distance matrix.
      a_valid: (N,) bool, b_valid: (M,) bool — capacity masks.
      max_dist: absolute acceptance threshold (reference TH_LOW/TH_HIGH).
      ratio: best < ratio * second-best test (reference mfNNratio).
      cross_check: also require argmin over rows to agree (mutual best).

    Returns:
      (idx (N,) int32 — match in b or -1, dist_best (N,) int32)
    """
    big = jnp.int32(1 << 20)
    d = jnp.where(a_valid[:, None] & b_valid[None, :], dist, big)
    best, best_idx, second = top2_min(d, big)
    ok = (best <= max_dist) & (best.astype(jnp.float32)
                               < ratio * second.astype(jnp.float32))
    if cross_check:
        rev_best = jnp.argmin(d, axis=0)  # (M,)
        ok &= rev_best[best_idx] == jnp.arange(d.shape[0])
    ok &= a_valid
    return jnp.where(ok, best_idx, -1), best


def rotation_consistency_mask(angles_a, angles_b, idx, n_bins: int = 30,
                              n_keep: int = 3):
    """Keep only matches whose angle difference falls in the 3 dominant
    histogram bins (reference ORBmatcher::ComputeThreeMaxima,
    ORBmatcher.cc:1844, HISTO_LENGTH=30).

    Args:
      angles_a: (N,) radians; angles_b: (M,) radians; idx: (N,) match or -1.
    Returns: (N,) bool — True where match kept.
    """
    matched = idx >= 0
    rot = angles_a - angles_b[jnp.clip(idx, 0, None)]
    frac = (rot / (2 * jnp.pi)) % 1.0
    bins = jnp.clip((frac * n_bins).astype(jnp.int32), 0, n_bins - 1)
    hist = jnp.zeros(n_bins, jnp.int32).at[bins].add(matched.astype(jnp.int32))
    top_vals, top_bins = jax.lax.top_k(hist, n_keep)
    # reference drops bins whose count < 0.1 * max
    keep_bin = top_vals >= (0.1 * top_vals[0]).astype(jnp.int32)
    in_top = jnp.any((bins[:, None] == top_bins[None, :]) & keep_bin[None, :],
                     axis=-1)
    return matched & in_top
