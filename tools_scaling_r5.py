"""Measure lm-sharded PCG GBA scaling on the virtual CPU mesh at 1/2/8 devs.

K=512 keyframes, L=65536 landmarks, ~1M observations (VERDICT r4 item 1).
"""
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.sharding import Mesh
from morb_slam_tpu import lie
from morb_slam_tpu.optim import ba
from morb_slam_tpu.parallel import sharded_ba

rng = np.random.default_rng(1)
K, L = 512, 65536
OBS_PER_KF = 2048
O = K * OBS_PER_KF
X = jnp.asarray(rng.uniform([-40, -6, 2], [40, 6, 10], (L, 3)), jnp.float32)
xi = np.zeros((K, 6), np.float32)
xi[:, 0] = 0.1 * np.arange(K)
xi[:, 4] = 0.001 * np.arange(K)
R, t = lie.se3_exp(jnp.asarray(xi))
obs_kf = jnp.repeat(jnp.arange(K), OBS_PER_KF)
obs_lm = jnp.asarray(
    (rng.integers(0, 8192, O)
     + np.repeat(np.arange(K), OBS_PER_KF) * ((L - 8192) // K)) % L,
    jnp.int32)
Xo = X[obs_lm]
Xc = lie.se3_apply(R[obs_kf], t[obs_kf], Xo)
z_ok = Xc[:, 2] > 0.2
obs_uv = Xc[:, :2] / jnp.clip(Xc[:, 2:3], 0.2, None)
prob = ba.make_problem(
    R, t, X + 0.01, obs_kf, obs_lm, obs_uv,
    jnp.full(O, 460.0 ** 2), z_ok,
    jnp.ones(K, bool).at[:2].set(False), jnp.ones(L, bool))

devices = np.asarray(jax.devices())
N_IT, CG = 2, 12


def run(n_dev, solver):
    mesh = Mesh(devices[:n_dev].reshape(n_dev), (sharded_ba.OBS_AXIS,))
    if solver == "lm":
        p, _ = sharded_ba.partition_problem_by_lm(prob, n_dev)
        f = lambda: sharded_ba.ba_solve_pcg_lm_sharded(
            p, mesh, n_iters=N_IT, cg_iters=CG)
    else:
        p = sharded_ba.pad_problem_for_mesh(prob, n_dev)
        f = lambda: sharded_ba.ba_solve_pcg_sharded(
            p, mesh, n_iters=N_IT, cg_iters=CG)
    w = f()
    jax.block_until_ready(w[:3])
    t0 = time.perf_counter()
    c0t = time.process_time()
    r = f()
    jax.block_until_ready(r[:3])
    dt = time.perf_counter() - t0
    dc = time.process_time() - c0t
    c0, c1 = float(r[3]["cost0"]), float(r[3]["costs"][-1])
    return N_IT / dt, dc, c0, c1


for solver in ("lm", "obs"):
    base = base_cpu = None
    for n in (1, 2, 8):
        ips, cpu_s, c0, c1 = run(n, solver)
        if base is None:
            base, base_cpu = ips, cpu_s
        eff = ips / (base * n)
        cpu_eff = base_cpu / cpu_s
        print(f"{solver}-sharded n={n}: {ips:.3f} it/s  wall_eff={eff:.2f}  "
              f"cpu_s={cpu_s:.1f} cpu_eff={cpu_eff:.2f}  "
              f"cost {c0:.4g}->{c1:.4g}", flush=True)
