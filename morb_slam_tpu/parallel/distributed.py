"""Multi-host wiring: `jax.distributed` initialization + cross-host meshes.

The reference has no distributed backend at all (SURVEY.md §2.4 P5: one
process, std::thread + mutexes); the TPU-native framework distributes the
two map-sized computations — global bundle adjustment and place-recognition
scoring — over every chip of every host. Within a host/slice the
collectives ride ICI; across hosts they ride DCN. The BASELINE north star
is >= 70% BA scaling efficiency at 2 hosts.

Usage (one call per process, before any jax computation):

    from morb_slam_tpu.parallel import distributed
    distributed.initialize(coordinator="host0:1234", num_processes=2,
                           process_id=int(os.environ["HOST_ID"]))
    mesh = distributed.global_obs_mesh()
    R, t, X, info = distributed.global_ba_distributed(problem, mesh)

Single-host multi-chip works with the same entry points — `initialize` is
a no-op when num_processes == 1, and the mesh spans the local devices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from . import sharded_ba


def initialize(coordinator: str = None, num_processes: int = 1,
               process_id: int = 0, local_device_ids=None):
    """Bring up the multi-host JAX runtime (jax.distributed.initialize).

    No-op for a single process so the same launch script serves one host
    and many. After this, jax.devices() lists EVERY chip in the job and
    collectives compiled into pjit/shard_map programs span hosts (DCN)
    and chips (ICI) transparently.
    """
    if num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def global_obs_mesh(devices=None) -> Mesh:
    """1-D observation-sharding mesh over every device of the job.

    Device order follows jax.devices(), which groups by process — so the
    observation blocks of neighboring shards land on the same host first
    (psum reductions then form a host-local tree before crossing DCN)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (sharded_ba.OBS_AXIS,))


def global_ba_distributed(problem, mesh: Mesh = None, n_iters: int = 10,
                          pcg: bool = True, cg_iters: int = 24):
    """Global bundle adjustment over a (possibly multi-host) mesh.

    Pads the observation stream to the mesh size, then runs the
    implicit-Schur PCG solver (nothing K x L is materialized; per-device
    memory is O(obs / n_devices)) or the dense-Schur LM solver.
    """
    mesh = mesh if mesh is not None else global_obs_mesh()
    n_dev = mesh.devices.size
    problem = sharded_ba.pad_problem_for_mesh(problem, n_dev)
    if pcg:
        return sharded_ba.ba_solve_pcg_sharded(problem, mesh,
                                               n_iters=n_iters,
                                               cg_iters=cg_iters)
    return sharded_ba.ba_solve_sharded(problem, mesh, n_iters=n_iters)


def ba_scaling_efficiency(problem, n_iters: int = 2, cg_iters: int = 12):
    """Measured BA scaling efficiency on the current job's devices
    (BASELINE metric: >= 70% at 2 hosts): sharded iters/s on the full
    mesh vs a single device, normalized by device count. Returns
    (ips_full, ips_1, efficiency)."""
    import time

    devices = np.asarray(jax.devices())
    n = devices.size

    def run(n_dev):
        mesh = Mesh(devices[:n_dev].reshape(n_dev), (sharded_ba.OBS_AXIS,))
        p = sharded_ba.pad_problem_for_mesh(problem, n_dev)
        w = sharded_ba.ba_solve_pcg_sharded(p, mesh, n_iters=n_iters,
                                            cg_iters=cg_iters)
        jax.block_until_ready(w[:3])     # compile outside the timing
        t0 = time.perf_counter()
        r = sharded_ba.ba_solve_pcg_sharded(p, mesh, n_iters=n_iters,
                                            cg_iters=cg_iters)
        jax.block_until_ready(r[:3])
        return n_iters / (time.perf_counter() - t0)

    ips_full = run(n)
    ips_1 = run(1)
    return ips_full, ips_1, ips_full / (ips_1 * n)
