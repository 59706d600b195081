"""Multi-device bundle adjustment: observations sharded over a device mesh,
Hessian blocks reduced with psum, reduced camera system solved replicated.

This is the framework's distribution story (SURVEY.md §2.4 P5/P6 and §7
design stance #4): the reference is a single-process pthreads system with no
distributed backend; here the BA data parallelism over observations — the
SLAM analog of DP — rides `shard_map` + `psum` over ICI. Keyframe/landmark
state stays replicated (it is small); the observation stream (the bulk) is
sharded. The Schur reduction and dense solve run replicated per device —
cheap relative to the per-observation work, and avoiding a gather.

`ba_solve_sharded` produces bit-comparable results to optim.ba.ba_solve
(asserted in tests/test_sharded_ba.py) because the math is identical — only
the segment-sum reductions are split across devices and psum'd.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from .. import lie
from ..optim import ba as ba_mod


OBS_AXIS = "obs"


def pad_problem_for_mesh(p: ba_mod.BAProblem, n_devices: int):
    """Pad observation arrays so their length divides the mesh size."""
    O = p.obs_uv.shape[0]
    pad = (-O) % n_devices
    if pad == 0:
        return p
    f = lambda x: jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return p._replace(
        obs_kf=f(p.obs_kf), obs_lm=f(p.obs_lm), obs_uv=f(p.obs_uv),
        obs_ur=jnp.concatenate([p.obs_ur, jnp.full(pad, jnp.nan,
                                                   p.obs_ur.dtype)]),
        obs_info=f(p.obs_info),
        obs_mask=jnp.concatenate([p.obs_mask, jnp.zeros(pad, bool)]))


def ba_solve_sharded(p: ba_mod.BAProblem, mesh: Mesh, n_iters: int = 10,
                     lambda0: float = 1e-4):
    """LM bundle adjustment with observation-sharded Hessian assembly.

    Args:
      p: BAProblem with obs length divisible by the mesh size
         (pad_problem_for_mesh).
      mesh: 1-D mesh whose single axis is named OBS_AXIS.
    Returns (R, t, X, info) like optim.ba.ba_solve.
    """
    K = p.R.shape[0]
    L = p.X.shape[0]
    f32 = p.obs_uv.dtype
    kf_opt_f = p.kf_opt.astype(f32)
    lm_opt_f = p.lm_opt.astype(f32)

    obs_spec = ba_mod.BAProblem(
        R=P(), t=P(), X=P(),
        obs_kf=P(OBS_AXIS), obs_lm=P(OBS_AXIS), obs_uv=P(OBS_AXIS),
        obs_ur=P(OBS_AXIS), obs_info=P(OBS_AXIS), obs_mask=P(OBS_AXIS),
        kf_opt=P(), lm_opt=P(), baseline=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(obs_spec, P(), P(), P(), P()),
             out_specs=(P(), P(), P()))
    def lm_step(p_local, R, t, X, lam):
        r, Jp, Jl, w, _ = ba_mod._obs_terms(p_local, R, t, X, robust=True)
        Hpp = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jp, w, Jp, precision='highest'),
            p_local.obs_kf, num_segments=K)
        Hll = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jl, w, Jl, precision='highest'),
            p_local.obs_lm, num_segments=L)
        bp = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jp, w, r, precision='highest'),
            p_local.obs_kf, num_segments=K)
        bl = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jl, w, r, precision='highest'),
            p_local.obs_lm, num_segments=L)
        Wpl = jnp.einsum('oia,o,oib->oab', Jp, w, Jl, precision='highest')
        B_local = jnp.zeros((K, 6, L, 3), f32)
        B_local = B_local.at[p_local.obs_kf, :, p_local.obs_lm, :].add(
            Wpl * p_local.obs_mask[:, None, None])
        # one reduction for everything that crosses shards
        Hpp, Hll, bp, bl, B = jax.lax.psum(
            (Hpp, Hll, bp, bl, B_local), OBS_AXIS)

        # ---- replicated reduced-system solve (identical to optim.ba) ----
        eyeK = jnp.eye(6, dtype=f32)
        eyeL = jnp.eye(3, dtype=f32)
        Hpp = Hpp + lam * eyeK * jnp.maximum(
            jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeK
        Hll_d = Hll + lam * eyeL * jnp.maximum(
            jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeL
        Hll_d = jnp.where(p.lm_opt[:, None, None], Hll_d,
                          jnp.broadcast_to(eyeL, Hll_d.shape))
        bl = bl * lm_opt_f[:, None]
        Hll_inv = ba_mod._inv3x3(Hll_d)
        Bm = B.reshape(K * 6, L, 3)
        BC = jnp.einsum('mlb,lbc->mlc', Bm, Hll_inv, precision='highest')
        S_off = jnp.einsum('mlc,nlc->mn', BC, Bm, precision='highest')
        Hpp_dense = jnp.zeros((K, 6, K, 6), f32)
        Hpp_dense = Hpp_dense.at[jnp.arange(K), :, jnp.arange(K), :].set(Hpp)
        S = Hpp_dense.reshape(K * 6, K * 6) - S_off
        b_schur = (bp.reshape(K * 6)
                   - jnp.einsum('mlc,lc->m', BC, bl, precision='highest'))
        free = jnp.repeat(kf_opt_f, 6)
        S = S * free[:, None] * free[None, :] + jnp.diag(1.0 - free)
        b_schur = b_schur * free
        dxp = jnp.linalg.solve(S, b_schur)
        Btdxp = jnp.einsum('mlc,m->lc', Bm, dxp, precision='highest')
        dxl = jnp.einsum('lab,lb->la', Hll_inv, bl - Btdxp,
                         precision='highest') * lm_opt_f[:, None]
        dxp = dxp.reshape(K, 6) * kf_opt_f[:, None]
        dR, dt = lie.se3_exp(dxp)
        R_new, t_new = lie.se3_mul(dR, dt, R, t)
        return R_new, t_new, X + dxl

    @partial(shard_map, mesh=mesh, in_specs=(obs_spec, P(), P(), P()),
             out_specs=P())
    def cost_fn(p_local, R, t, X):
        r, _, _, w, _ = ba_mod._obs_terms(p_local, R, t, X, robust=True)
        return jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), OBS_AXIS)

    def iteration(carry, _):
        R, t, X, lam, cost = carry
        R_new, t_new, X_new = lm_step(p, R, t, X, lam)
        new_cost = cost_fn(p, R_new, t_new, X_new)
        accept = new_cost < cost
        R, t, X = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), (R_new, t_new, X_new),
            (R, t, X))
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (R, t, X, lam, cost), cost

    cost0 = cost_fn(p, p.R, p.t, p.X)
    (R, t, X, lam, cost), costs = jax.lax.scan(
        iteration, (p.R, p.t, p.X, jnp.asarray(lambda0, f32), cost0),
        None, length=n_iters)
    return R, t, X, {"cost0": cost0, "costs": costs, "lambda": lam}


def partition_problem_by_lm(p: ba_mod.BAProblem, n_devices: int):
    """Host-side repartition for the landmark-sharded solver: device d owns
    a contiguous landmark-id range and EVERY observation of those landmarks.

    Block boundaries are chosen by EQUAL OBSERVATION COUNT (not equal
    landmark count): landmark ids are spatially/temporally clustered in a
    SLAM map, so equal-size blocks leave one device with far more
    observations than the rest, and since every per-device array is padded
    to the max block, imbalance turns directly into wasted FLOPs (measured
    1.55x total work at 8 devices with equal-size blocks on a K=512/O=1M
    problem; ~1.0x with equal-obs boundaries).

    Returns (problem, lm_new2old) where the problem's landmark arrays are a
    block-padded permutation of the input (length n_devices * Lb) and
    `lm_new2old[j]` is the original landmark id of packed row j (-1 for
    padding). Observation arrays are n equal-length contiguous device
    blocks; padded rows are masked out.

    This is the data layout of SURVEY.md §5's long-context plan: partition
    observations so each device owns whole landmark blocks — the Schur
    landmark work then needs no collective at all.
    """
    import numpy as np
    L = int(p.X.shape[0])
    obs_lm = np.asarray(p.obs_lm)
    obs_mask = np.asarray(p.obs_mask)
    counts = np.bincount(obs_lm[obs_mask], minlength=L).astype(np.int64)
    cum = np.cumsum(counts)
    total = int(cum[-1])
    # boundary[d] = first landmark id of device d's range
    targets = (np.arange(1, n_devices) * total) // n_devices
    bounds = np.concatenate([[0], np.searchsorted(cum, targets, "left") + 1,
                             [L]])
    bounds = np.maximum.accumulate(np.clip(bounds, 0, L))
    starts, ends = bounds[:-1], bounds[1:]
    Lb = max(int((ends - starts).max()), 1)
    # landmark permutation: device d's rows [d*Lb, d*Lb+len) <- old ids
    lm_new2old = np.full(n_devices * Lb, -1, np.int64)
    lm_old2new = np.zeros(L, np.int64)
    for d in range(n_devices):
        ln = ends[d] - starts[d]
        lm_new2old[d * Lb:d * Lb + ln] = np.arange(starts[d], ends[d])
        lm_old2new[starts[d]:ends[d]] = d * Lb + np.arange(ln)
    src = np.where(lm_new2old < 0, 0, lm_new2old)
    X_new = np.asarray(p.X)[src]
    lm_opt_new = np.asarray(p.lm_opt)[src] & (lm_new2old >= 0)

    owner = np.where(obs_mask, np.searchsorted(ends, obs_lm, "right"), 0)
    ocounts = np.bincount(owner[obs_mask], minlength=n_devices)
    cap = max(int(ocounts.max()), 1)
    cap = -(-cap // 8) * 8
    sel = np.full((n_devices, cap), -1, np.int64)
    for d in range(n_devices):
        rows = np.nonzero(obs_mask & (owner == d))[0]
        sel[d, :len(rows)] = rows
    sel_flat = sel.reshape(-1)
    pad = sel_flat < 0
    idx = np.where(pad, 0, sel_flat)

    def take(x, fill=None):
        x = np.asarray(x)
        out = x[idx]
        if fill is not None:
            out[pad] = fill
        return jnp.asarray(out)

    # padded rows: mask False, landmark = first row of the owning block
    # (keeps the local index in range), kf = 0, zero info
    own_first = np.repeat(np.arange(n_devices) * Lb, cap)
    obs_lm_new = lm_old2new[obs_lm[idx]]
    obs_lm_new[pad] = own_first[pad]
    p_new = p._replace(
        X=jnp.asarray(X_new),
        lm_opt=jnp.asarray(lm_opt_new),
        obs_kf=take(p.obs_kf, 0),
        obs_lm=jnp.asarray(obs_lm_new),
        obs_uv=take(p.obs_uv),
        obs_ur=take(p.obs_ur),
        obs_info=take(p.obs_info, 0.0),
        obs_mask=jnp.asarray(~pad),
    )
    return p_new, jnp.asarray(lm_new2old)


def ba_solve_pcg_lm_sharded(p: ba_mod.BAProblem, mesh: Mesh,
                            n_iters: int = 8, cg_iters: int = 40,
                            lambda0: float = 1e-4):
    """Landmark-sharded implicit-Schur PCG global BA.

    Requires the layout of `partition_problem_by_lm`: device d owns
    landmark block d and all of its observations. Everything landmark-sized
    (Hll, bl, Hll_inv, dxl, X) lives SHARDED; the only collectives are

      * one (K,6,6)+(K,6) psum per LM iteration (pose Hessian assembly),
      * one (K,6) psum per CG matvec (the B y product),
      * one scalar psum per iteration (the LM accept/reject cost).

    vs. the observation-sharded solver's two landmark-sized psums per
    matvec — the measured 8-device scaling was 0.11 there because every
    device also repeated all L-sized work. Here per-device work is
    O(obs/n + L/n) with K-sized replication only (CG state, dense solve on
    the reduced system is nothing landmark-sized).

    Reference behavior covered: Optimizer::GlobalBundleAdjustemnt
    (/root/reference/src/Optimizer.cc:47) + Marginalize-style Schur
    (Optimizer.cc:2898), distributed per SURVEY §2.4 P5.
    """
    K = p.R.shape[0]
    L = p.X.shape[0]
    f32 = p.obs_uv.dtype
    n = mesh.devices.size
    Lb = L // n
    kf_opt_f = p.kf_opt.astype(f32)

    spec = ba_mod.BAProblem(
        R=P(), t=P(), X=P(OBS_AXIS),
        obs_kf=P(OBS_AXIS), obs_lm=P(OBS_AXIS), obs_uv=P(OBS_AXIS),
        obs_ur=P(OBS_AXIS), obs_info=P(OBS_AXIS), obs_mask=P(OBS_AXIS),
        kf_opt=P(), lm_opt=P(OBS_AXIS), baseline=P())

    @partial(shard_map, mesh=mesh, in_specs=(spec,),
             out_specs=(P(), P(), P(OBS_AXIS), P()))
    def solve(pl):
        d = jax.lax.axis_index(OBS_AXIS)
        lm_loc = pl.obs_lm - d * Lb                       # local lm index
        lm_opt_l = pl.lm_opt                              # (Lb,)
        lm_opt_lf = lm_opt_l.astype(f32)
        lm_opt_obs = lm_opt_lf[lm_loc] * pl.obs_mask
        eyeK = jnp.eye(6, dtype=f32)
        eyeL = jnp.eye(3, dtype=f32)
        pv = pl._replace(obs_lm=lm_loc)                   # local-index view

        def terms_of(R, t, X_l):
            r, Jp, Jl, w, _ = ba_mod._obs_terms(pv, R, t, X_l, robust=True)
            return r, Jp, Jl, w

        def cost_of(terms):
            r, _, _, w = terms
            return jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)),
                                OBS_AXIS)

        def lm_step(terms, R, t, X_l, lam):
            r, Jp, Jl, w = terms
            Hpp = jax.ops.segment_sum(
                jnp.einsum('oia,o,oib->oab', Jp, w, Jp,
                           precision='highest'),
                pl.obs_kf, num_segments=K)
            bp = -jax.ops.segment_sum(
                jnp.einsum('oia,o,oi->oa', Jp, w, r, precision='highest'),
                pl.obs_kf, num_segments=K)
            Hll = jax.ops.segment_sum(
                jnp.einsum('oia,o,oib->oab', Jl, w, Jl,
                           precision='highest'),
                lm_loc, num_segments=Lb)                  # LOCAL, no psum
            bl = -jax.ops.segment_sum(
                jnp.einsum('oia,o,oi->oa', Jl, w, r, precision='highest'),
                lm_loc, num_segments=Lb)
            Hpp, bp = jax.lax.psum((Hpp, bp), OBS_AXIS)
            Wpl = jnp.einsum('oia,o,oib->oab', Jp, w, Jl,
                             precision='highest') \
                * lm_opt_obs[:, None, None]

            Hpp_d = Hpp + lam * eyeK * jnp.maximum(
                jnp.diagonal(Hpp, axis1=-2, axis2=-1),
                1e-6)[..., None] * eyeK
            Hll_d = Hll + lam * eyeL * jnp.maximum(
                jnp.diagonal(Hll, axis1=-2, axis2=-1),
                1e-6)[..., None] * eyeL
            Hll_d = jnp.where(lm_opt_l[:, None, None], Hll_d,
                              jnp.broadcast_to(eyeL, Hll_d.shape))
            bl_m = bl * lm_opt_lf[:, None]
            Hll_inv = ba_mod._inv3x3(Hll_d)

            def Btx(xp):
                """B^T x -> (Lb, 3) local: every obs of a local landmark
                is local, so NO collective."""
                return jax.ops.segment_sum(
                    jnp.einsum('oab,oa->ob', Wpl, xp[pl.obs_kf],
                               precision='highest'),
                    lm_loc, num_segments=Lb)

            def By(y_l):
                """B y -> (K, 6): one small psum."""
                part = jax.ops.segment_sum(
                    jnp.einsum('oab,ob->oa', Wpl, y_l[lm_loc],
                               precision='highest'),
                    pl.obs_kf, num_segments=K)
                return jax.lax.psum(part, OBS_AXIS)

            def S_matvec(xp):
                xp = xp * kf_opt_f[:, None]
                y = jnp.einsum('lab,lb->la', Hll_inv, Btx(xp),
                               precision='highest') * lm_opt_lf[:, None]
                Sx = jnp.einsum('kab,kb->ka', Hpp_d, xp,
                                precision='highest') - By(y)
                return Sx * kf_opt_f[:, None]

            y0 = jnp.einsum('lab,lb->la', Hll_inv, bl_m,
                            precision='highest')
            rhs = (bp - By(y0)) * kf_opt_f[:, None]
            Minv = ba_mod._inv6x6(Hpp_d)

            def precond(v):
                return jnp.einsum('kab,kb->ka', Minv, v,
                                  precision='highest') * kf_opt_f[:, None]

            def cg_body(carry, _):
                x, res, z, pdir, rz = carry
                Ap = S_matvec(pdir)
                pAp = jnp.sum(pdir * Ap)
                alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
                x = x + alpha * pdir
                res = res - alpha * Ap
                z = precond(res)
                rz_new = jnp.sum(res * z)
                beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
                pdir = z + beta * pdir
                return (x, res, z, pdir, rz_new), rz_new

            x0 = jnp.zeros_like(rhs)
            z0 = precond(rhs)
            (dxp, _, _, _, _), _ = jax.lax.scan(
                cg_body, (x0, rhs, z0, z0, jnp.sum(rhs * z0)), None,
                length=cg_iters)
            dxp = dxp * kf_opt_f[:, None]
            dxl = jnp.einsum('lab,lb->la', Hll_inv, bl_m - Btx(dxp),
                             precision='highest') * lm_opt_lf[:, None]
            dR, dt = lie.se3_exp(dxp)
            R_new, t_new = lie.se3_mul(dR, dt, R, t)
            return R_new, t_new, X_l + dxl

        def iteration(carry, _):
            R, t, X_l, terms, lam, cost = carry
            R_c, t_c, X_c = lm_step(terms, R, t, X_l, lam)
            terms_c = terms_of(R_c, t_c, X_c)
            new_cost = cost_of(terms_c)
            accept = new_cost < cost
            sel = lambda a, b: jnp.where(accept, a, b)
            R, t, X_l = jax.tree.map(sel, (R_c, t_c, X_c), (R, t, X_l))
            terms = jax.tree.map(sel, terms_c, terms)
            cost = jnp.where(accept, new_cost, cost)
            lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0),
                           1e-9, 1e4)
            return (R, t, X_l, terms, lam, cost), cost

        terms0 = terms_of(pl.R, pl.t, pl.X)
        cost0 = cost_of(terms0)
        (R, t, X_l, _, lam, cost), costs = jax.lax.scan(
            iteration,
            (pl.R, pl.t, pl.X, terms0, jnp.asarray(lambda0, f32), cost0),
            None, length=n_iters)
        return R, t, X_l, {"cost0": cost0, "costs": costs, "lambda": lam}

    return solve(p)


def ba_solve_pcg_sharded(p: ba_mod.BAProblem, mesh: Mesh,
                         n_iters: int = 8, cg_iters: int = 40,
                         lambda0: float = 1e-4):
    """SCALABLE distributed global BA: observation-sharded implicit-Schur
    PCG (the full-map GBA path, reference GlobalBundleAdjustemnt run in the
    detached thread, LoopClosing.cc:2284).

    Unlike `ba_solve_sharded` (dense B — fine for small windows, wrong
    memory scaling for maps), nothing landmark x keyframe sized is ever
    materialized: each device keeps only its observation shard's coupling
    blocks Wpl (O_local, 6, 3), and every CG matvec is two local
    gather+segment-sum passes plus two small psums ((L,3) and (K,6)).
    Per-device memory is O(O/devices) for the bulk — keyframe/landmark
    state (small) stays replicated; collectives ride ICI.
    """
    K = p.R.shape[0]
    L = p.X.shape[0]
    f32 = p.obs_uv.dtype
    kf_opt_f = p.kf_opt.astype(f32)
    lm_opt_f = p.lm_opt.astype(f32)

    obs_spec = ba_mod.BAProblem(
        R=P(), t=P(), X=P(),
        obs_kf=P(OBS_AXIS), obs_lm=P(OBS_AXIS), obs_uv=P(OBS_AXIS),
        obs_ur=P(OBS_AXIS), obs_info=P(OBS_AXIS), obs_mask=P(OBS_AXIS),
        kf_opt=P(), lm_opt=P(), baseline=P())

    @partial(shard_map, mesh=mesh,
             in_specs=(obs_spec, P(), P(), P(), P()),
             out_specs=(P(), P(), P()))
    def lm_step(p_local, R, t, X, lam):
        r, Jp, Jl, w, _ = ba_mod._obs_terms(p_local, R, t, X, robust=True)
        Hpp = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jp, w, Jp, precision='highest'),
            p_local.obs_kf, num_segments=K)
        Hll = jax.ops.segment_sum(
            jnp.einsum('oia,o,oib->oab', Jl, w, Jl, precision='highest'),
            p_local.obs_lm, num_segments=L)
        bp = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jp, w, r, precision='highest'),
            p_local.obs_kf, num_segments=K)
        bl = -jax.ops.segment_sum(
            jnp.einsum('oia,o,oi->oa', Jl, w, r, precision='highest'),
            p_local.obs_lm, num_segments=L)
        Hpp, Hll, bp, bl = jax.lax.psum((Hpp, Hll, bp, bl), OBS_AXIS)

        # LOCAL coupling blocks — never reduced, never materialized dense
        Wpl = jnp.einsum('oia,o,oib->oab', Jp, w, Jl, precision='highest') \
            * (p_local.obs_mask * lm_opt_f[p_local.obs_lm])[:, None, None]

        eyeK = jnp.eye(6, dtype=f32)
        eyeL = jnp.eye(3, dtype=f32)
        Hpp_d = Hpp + lam * eyeK * jnp.maximum(
            jnp.diagonal(Hpp, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeK
        Hll_d = Hll + lam * eyeL * jnp.maximum(
            jnp.diagonal(Hll, axis1=-2, axis2=-1), 1e-6)[..., None] * eyeL
        Hll_d = jnp.where(p.lm_opt[:, None, None], Hll_d,
                          jnp.broadcast_to(eyeL, Hll_d.shape))
        bl_m = bl * lm_opt_f[:, None]
        Hll_inv = ba_mod._inv3x3(Hll_d)

        def Btx(xp):
            """B^T x: local partial + psum -> (L, 3) replicated."""
            part = jax.ops.segment_sum(
                jnp.einsum('oab,oa->ob', Wpl, xp[p_local.obs_kf],
                           precision='highest'),
                p_local.obs_lm, num_segments=L)
            return jax.lax.psum(part, OBS_AXIS)

        def By(y):
            """B y: local partial + psum -> (K, 6) replicated."""
            part = jax.ops.segment_sum(
                jnp.einsum('oab,ob->oa', Wpl, y[p_local.obs_lm],
                           precision='highest'),
                p_local.obs_kf, num_segments=K)
            return jax.lax.psum(part, OBS_AXIS)

        def S_matvec(xp):
            xp = xp * kf_opt_f[:, None]
            y = jnp.einsum('lab,lb->la', Hll_inv, Btx(xp),
                           precision='highest') * lm_opt_f[:, None]
            Sx = jnp.einsum('kab,kb->ka', Hpp_d, xp,
                            precision='highest') - By(y)
            return Sx * kf_opt_f[:, None]

        y0 = jnp.einsum('lab,lb->la', Hll_inv, bl_m, precision='highest')
        rhs = (bp - By(y0)) * kf_opt_f[:, None]
        Minv = ba_mod._inv6x6(Hpp_d)

        def precond(v):
            return jnp.einsum('kab,kb->ka', Minv, v,
                              precision='highest') * kf_opt_f[:, None]

        def cg_body(carry, _):
            x, res, z, pdir, rz = carry
            Ap = S_matvec(pdir)
            pAp = jnp.sum(pdir * Ap)
            alpha = rz / jnp.where(jnp.abs(pAp) < 1e-20, 1e-20, pAp)
            x = x + alpha * pdir
            res = res - alpha * Ap
            z = precond(res)
            rz_new = jnp.sum(res * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            pdir = z + beta * pdir
            return (x, res, z, pdir, rz_new), rz_new

        x0 = jnp.zeros_like(rhs)
        z0 = precond(rhs)
        (dxp, _, _, _, _), _ = jax.lax.scan(
            cg_body, (x0, rhs, z0, z0, jnp.sum(rhs * z0)), None,
            length=cg_iters)
        dxp = dxp * kf_opt_f[:, None]
        dxl = jnp.einsum('lab,lb->la', Hll_inv, bl_m - Btx(dxp),
                         precision='highest') * lm_opt_f[:, None]
        dR, dt = lie.se3_exp(dxp)
        R_new, t_new = lie.se3_mul(dR, dt, R, t)
        return R_new, t_new, X + dxl

    @partial(shard_map, mesh=mesh, in_specs=(obs_spec, P(), P(), P()),
             out_specs=P())
    def cost_fn(p_local, R, t, X):
        r, _, _, w, _ = ba_mod._obs_terms(p_local, R, t, X, robust=True)
        return jax.lax.psum(jnp.sum(w * jnp.sum(r * r, axis=-1)), OBS_AXIS)

    def iteration(carry, _):
        R, t, X, lam, cost = carry
        R_new, t_new, X_new = lm_step(p, R, t, X, lam)
        new_cost = cost_fn(p, R_new, t_new, X_new)
        accept = new_cost < cost
        R, t, X = jax.tree.map(
            lambda n, o: jnp.where(accept, n, o), (R_new, t_new, X_new),
            (R, t, X))
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
        return (R, t, X, lam, cost), cost

    cost0 = cost_fn(p, p.R, p.t, p.X)
    (R, t, X, lam, cost), costs = jax.lax.scan(
        iteration, (p.R, p.t, p.X, jnp.asarray(lambda0, f32), cost0),
        None, length=n_iters)
    return R, t, X, {"cost0": cost0, "costs": costs, "lambda": lam}
