"""Monocular two-view initialization: parallel-hypothesis E/H RANSAC with
model selection and motion reconstruction.

TPU-native replacement for the reference's TwoViewReconstruction
(/root/reference/src/TwoViewReconstruction.cc): both a homography and an
epipolar model are fitted from the same 8-point samples, scored with the
symmetric transfer error, and the winner (score ratio > 0.4 -> H, else E;
TwoViewReconstruction.cc model selection) is decomposed and cheirality-checked.
Differences by design: we work in normalized camera coordinates with an
essential matrix instead of pixel-space F (the cameras are calibrated —
E = K2^T F K1), and all 200 hypotheses and all 8+4 motion candidates are
evaluated batched instead of in sequential loops with early exit.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import lie
from . import ransac, triangulation

CHI2_EPI = 3.841     # 1-dof inlier gate (reference CheckFundamental)
CHI2_H = 5.991       # 2-dof inlier gate (reference CheckHomography)
SCORE_TH = 5.991     # score cap (reference thScore)


class TwoViewResult(NamedTuple):
    R21: jnp.ndarray        # (3, 3) rotation cam1 -> cam2
    t21: jnp.ndarray        # (3,) unit-norm translation
    points: jnp.ndarray     # (N, 3) triangulated points in cam-1 frame
    is_good: jnp.ndarray    # (N,) bool triangulation gates passed
    n_good: jnp.ndarray     # () int32
    parallax_deg: jnp.ndarray  # () median parallax of good points
    used_h: jnp.ndarray     # () bool which model won


# ---------------------------------------------------------------------------
# model fits (8-point DLT for both E and H, like the reference)
# ---------------------------------------------------------------------------

def _hartley(x, w):
    """Weighted Hartley normalization: returns (x_norm, T) with
    x_norm = s (x - mu), T the 3x3 homogeneous transform. Without it the
    linear E/H estimates are measurably biased (reference Normalize(),
    TwoViewReconstruction.cc)."""
    wsum = jnp.clip(jnp.sum(w), 1e-9, None)
    mu = jnp.sum(x * w[:, None], axis=0) / wsum
    d = x - mu
    mean_norm = jnp.sum(jnp.linalg.norm(d, axis=-1) * w) / wsum
    s = jnp.sqrt(2.0) / jnp.clip(mean_norm, 1e-9, None)
    T = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                    x.dtype) * s
    T = T.at[2, 2].set(1.0).at[0, 2].set(-s * mu[0]).at[1, 2].set(-s * mu[1])
    return d * s, T


def _fit_essential(x1, x2, w=None):
    """Correspondences (k, 2) normalized -> (3, 3) essential matrix.
    Optional per-row weights enable masked all-inlier refits."""
    if w is None:
        w = jnp.ones(x1.shape[0], x1.dtype)
    n1, T1 = _hartley(x1, w)
    n2, T2 = _hartley(x2, w)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1,
                   jnp.ones_like(u1)], axis=-1)
    A = A * w[:, None]
    # direct SVD of A (not eigh of A^T A): avoids squaring the condition
    # number, which costs real accuracy at f32
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    En = Vt[-1, :].reshape(3, 3)
    E0 = lie.matmat(T2.T, lie.matmat(En, T1))
    # project onto essential manifold: singular values (1, 1, 0)
    U, S, Vt = jnp.linalg.svd(E0)
    return lie.matmat(U, jnp.diag(jnp.asarray([1.0, 1.0, 0.0], E0.dtype)) @ Vt)


def _fit_homography(x1, x2, w=None):
    """Correspondences -> (3, 3) homography x2 ~ H x1 (normalized coords)."""
    if w is None:
        w = jnp.ones(x1.shape[0], x1.dtype)
    n1, T1 = _hartley(x1, w)
    n2, T2 = _hartley(x2, w)
    u1, v1 = n1[:, 0], n1[:, 1]
    u2, v2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)
    A = A * jnp.concatenate([w, w])[:, None]
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    Hn = Vt[-1, :].reshape(3, 3)
    return lie.matmat(jnp.linalg.inv(T2), lie.matmat(Hn, T1))


# ---------------------------------------------------------------------------
# scoring (reference CheckFundamental / CheckHomography semantics)
# ---------------------------------------------------------------------------

def _score_essential(E, x1h, x2h, valid, inv_sigma2):
    Ex1 = jnp.einsum('ij,nj->ni', E, x1h, precision='highest')
    Etx2 = jnp.einsum('ji,nj->ni', E, x2h, precision='highest')
    x2Ex1 = jnp.sum(x2h * Ex1, axis=-1)
    d2_2 = x2Ex1 ** 2 / jnp.clip(Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2, 1e-12, None)
    d2_1 = x2Ex1 ** 2 / jnp.clip(Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2, 1e-12, None)
    chi1 = d2_1 * inv_sigma2
    chi2 = d2_2 * inv_sigma2
    inl = (chi1 < CHI2_EPI) & (chi2 < CHI2_EPI) & valid
    sc = (jnp.where(chi1 < CHI2_EPI, SCORE_TH - chi1, 0.0)
          + jnp.where(chi2 < CHI2_EPI, SCORE_TH - chi2, 0.0))
    return jnp.sum(sc * valid), inl


def _score_homography(H, x1h, x2h, valid, inv_sigma2):
    Hinv = jnp.linalg.inv(H)

    def transfer(M, a, b):
        p = jnp.einsum('ij,nj->ni', M, a, precision='highest')
        w = jnp.where(jnp.abs(p[:, 2:3]) < 1e-12, 1e-12, p[:, 2:3])
        e = p[:, :2] / w - b[:, :2]
        return jnp.sum(e * e, axis=-1)

    chi_12 = transfer(H, x1h, x2h) * inv_sigma2
    chi_21 = transfer(Hinv, x2h, x1h) * inv_sigma2
    inl = (chi_12 < CHI2_H) & (chi_21 < CHI2_H) & valid
    sc = (jnp.where(chi_12 < CHI2_H, SCORE_TH - chi_12, 0.0)
          + jnp.where(chi_21 < CHI2_H, SCORE_TH - chi_21, 0.0))
    return jnp.sum(sc * valid), inl


# ---------------------------------------------------------------------------
# motion reconstruction
# ---------------------------------------------------------------------------

def _decompose_essential(E):
    """E -> 4 candidate (R, t) (reference DecomposeE)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                    E.dtype)
    R1 = lie.matmat(lie.matmat(U, W), Vt)
    R2 = lie.matmat(lie.matmat(U, W.T), Vt)
    t = U[:, 2]
    t = t / jnp.clip(jnp.linalg.norm(t), 1e-12, None)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _decompose_homography(H):
    """Faugeras SVD decomposition of a Euclidean homography -> 8 (R, t)
    candidates (reference ReconstructH, TwoViewReconstruction.cc)."""
    U, d, Vt = jnp.linalg.svd(H)
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    d1, d2, d3 = d[0], d[1], d[2]
    denom = jnp.clip(d1 * d1 - d3 * d3, 1e-12, None)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, None))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, None))
    eps = jnp.asarray([(1.0, 1.0), (1.0, -1.0), (-1.0, 1.0), (-1.0, -1.0)],
                      H.dtype)

    d2s = jnp.where(jnp.abs(d2) < 1e-12, 1e-12, d2)

    def case_pos(e):
        e1, e3 = e[0], e[1]
        st = (d1 - d3) * x1 * x3 * e1 * e3 / d2s
        ct = (d1 * x3 * x3 + d3 * x1 * x1) / d2s
        Rp = jnp.asarray([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]],
                         H.dtype)
        tp = jnp.asarray([e1 * x1, 0.0, -e3 * x3], H.dtype) * (d1 - d3)
        return Rp, tp

    def case_neg(e):
        e1, e3 = e[0], e[1]
        sp = (d1 + d3) * x1 * x3 * e1 * e3 / d2s
        cp = (d3 * x1 * x1 - d1 * x3 * x3) / d2s
        Rp = jnp.asarray([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]],
                         H.dtype)
        tp = jnp.asarray([e1 * x1, 0.0, e3 * x3], H.dtype) * (d1 + d3)
        return Rp, tp

    Rp_pos, tp_pos = jax.vmap(case_pos)(eps)
    Rp_neg, tp_neg = jax.vmap(case_neg)(eps)
    Rp = jnp.concatenate([Rp_pos, Rp_neg])
    tp = jnp.concatenate([tp_pos, tp_neg])
    R = s * jnp.einsum('ij,njk,kl->nil', U, Rp, Vt, precision='highest')
    t = jnp.einsum('ij,nj->ni', U, tp, precision='highest')
    t = t / jnp.clip(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12, None)
    return R, t


def _check_motion(R, t, x1, x2, inliers, th2):
    """Triangulate all inliers under (R, t) and count good points
    (reference CheckRT)."""
    X = triangulation.triangulate_two_view(x1, x2, R, t)
    good, cosp = triangulation.depth_and_reproj_checks(X, x1, x2, R, t, th2)
    good = good & inliers
    # parallax of good points: take the 50th best cos (reference uses min of
    # top-50); approximate with median over good
    n_good = jnp.sum(good)
    cos_sorted = jnp.sort(jnp.where(good, cosp, jnp.inf))
    cos_med = cos_sorted[jnp.clip(n_good // 2, 0, cosp.shape[0] - 1)]
    cos_med = jnp.where(n_good > 0, cos_med, 1.0)
    par = jnp.degrees(jnp.arccos(jnp.clip(cos_med, -1.0, 1.0)))
    return X, good, n_good, par


def reconstruct_two_view(key, x1, x2, valid, focal: float,
                         sigma_px: float = 1.0, n_hyp: int = 200):
    """Full monocular initialization from matched normalized coords.

    Args:
      x1, x2: (N, 2) normalized camera coords of matches (cam1, cam2).
      valid: (N,) bool.
      focal: focal length in px (converts the reference's pixel thresholds).
    Returns TwoViewResult; host decides acceptance from n_good/parallax
    (reference: >=50 triangulated, parallax > 1 deg).
    """
    inv_sigma2 = (focal / sigma_px) ** 2   # chi2 in normalized coords
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[:, :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[:, :1])], axis=-1)

    def fit_e(idx):
        return _fit_essential(x1[idx], x2[idx])

    def fit_h(idx):
        return _fit_homography(x1[idx], x2[idx])

    ke, kh = jax.random.split(key)
    E, sE, inlE, _ = ransac.run(
        ke, fit_e, lambda E: _score_essential(E, x1h, x2h, valid, inv_sigma2),
        n_hyp, 8, valid)
    H, sH, inlH, _ = ransac.run(
        kh, fit_h, lambda H: _score_homography(H, x1h, x2h, valid, inv_sigma2),
        n_hyp, 8, valid)

    # all-inlier refit, two rounds (the reference keeps the raw 8-point model;
    # refit-and-rescore markedly improves the unoptimized motion estimate and
    # converges the inlier set)
    for _ in range(2):
        E = _fit_essential(x1, x2, w=inlE.astype(x1.dtype))
        H = _fit_homography(x1, x2, w=inlH.astype(x1.dtype))
        _, inlE = _score_essential(E, x1h, x2h, valid, inv_sigma2)
        _, inlH = _score_homography(H, x1h, x2h, valid, inv_sigma2)

    use_h = sH / jnp.clip(sH + sE, 1e-9, None) > 0.40  # reference ratio

    th2 = 4.0 * sigma_px ** 2 / focal ** 2
    RsE, tsE = _decompose_essential(E)
    RsH, tsH = _decompose_homography(H)
    Rs = jnp.concatenate([RsE, RsH])       # (12, 3, 3)
    ts = jnp.concatenate([tsE, tsH])
    inl = jnp.where(use_h, inlH, inlE)     # (N,)
    cand_mask = jnp.where(
        use_h,
        jnp.asarray([0] * 4 + [1] * 8, bool),
        jnp.asarray([1] * 4 + [0] * 8, bool))

    X_all, good_all, n_all, par_all = jax.vmap(
        lambda R, t: _check_motion(R, t, x1, x2, inl, th2))(Rs, ts)
    n_all = jnp.where(cand_mask, n_all, -1)
    best = jnp.argmax(n_all)
    return TwoViewResult(
        R21=Rs[best], t21=ts[best], points=X_all[best],
        is_good=good_all[best], n_good=n_all[best],
        parallax_deg=par_all[best], used_h=use_h)
