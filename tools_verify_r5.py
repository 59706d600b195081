"""Verify round-5 compute-path changes on the REAL TPU via the public API:
new ba_solve, closed-form triangulation, top2_min matchers (inside mono
tracking), and the landmark-sharded PCG solver."""
import sys, os, time
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
import numpy as np
import jax, jax.numpy as jnp

print(time.strftime("%H:%M:%S"), "devices:", jax.devices(), flush=True)

# --- 1. BA recovery on TPU -------------------------------------------------
from morb_slam_tpu import lie
from morb_slam_tpu.optim import ba

rng = np.random.default_rng(30)
n_pts, n_kfs = 300, 6
X = jnp.asarray(rng.uniform([-3, -2, 4], [3, 2, 10], (n_pts, 3)), jnp.float32)
poses = []
for k in range(n_kfs):
    xi = np.zeros(6); xi[0] = 2.0 * k / 5; xi[3:] = rng.normal(0, 0.02, 3)
    poses.append(lie.se3_exp(jnp.asarray(xi, jnp.float32)))
R = jnp.stack([p[0] for p in poses]); t = jnp.stack([p[1] for p in poses])
Xc = jax.vmap(lambda Rk, tk: lie.se3_apply(Rk, tk, X))(R, t)
uv = Xc[..., :2] / Xc[..., 2:3] + jnp.asarray(
    rng.normal(0, 0.5 / 460.0, (n_kfs, n_pts, 2)), jnp.float32)
rngj = np.random.default_rng(99)
dxi = jnp.asarray(np.concatenate([np.zeros((2, 6)),
                                  rngj.normal(0, 0.01, (4, 6))]), jnp.float32)
dR, dt = lie.se3_exp(dxi)
R0, t0 = lie.se3_mul(dR, dt, R, t)
X0 = X + jnp.asarray(rngj.normal(0, 0.05, (n_pts, 3)), jnp.float32)
prob = ba.make_problem(
    R0, t0, X0, jnp.repeat(jnp.arange(n_kfs), n_pts),
    jnp.tile(jnp.arange(n_pts), n_kfs), uv.reshape(-1, 2),
    jnp.full(n_kfs * n_pts, 460.0 ** 2), jnp.ones(n_kfs * n_pts, bool),
    jnp.ones(n_kfs, bool).at[:2].set(False), jnp.ones(n_pts, bool))
Rf, tf, Xf, info = ba.ba_solve(prob, n_iters=15)
jax.block_until_ready(Rf)
pose_err = float(jnp.abs(Rf - R).max())
lm_err = float(jnp.linalg.norm(Xf - X, axis=-1).mean())
print(time.strftime("%H:%M:%S"),
      f"BA on TPU: cost {float(info['cost0']):.3g} -> "
      f"{float(info['costs'][-1]):.3g}, pose_err {pose_err:.2e}, "
      f"lm_err {lm_err:.4f}", flush=True)
assert float(info['costs'][-1]) < 0.5 * float(info['cost0'])
assert pose_err < 3e-3 and lm_err < 0.05

# --- 2. landmark-sharded PCG on a 1-device TPU mesh ------------------------
from jax.sharding import Mesh
from morb_slam_tpu.parallel import sharded_ba
p2, _ = sharded_ba.partition_problem_by_lm(prob, 1)
mesh = Mesh(np.asarray(jax.devices()[:1]), (sharded_ba.OBS_AXIS,))
R2, t2, X2, info2 = sharded_ba.ba_solve_pcg_lm_sharded(
    p2, mesh, n_iters=8, cg_iters=24)
jax.block_until_ready(R2)
print(time.strftime("%H:%M:%S"),
      f"lm-sharded PCG: cost {float(info2['cost0']):.3g} -> "
      f"{float(info2['costs'][-1]):.3g}, pose_err "
      f"{float(jnp.abs(R2 - R).max()):.2e}", flush=True)
assert float(info2['costs'][-1]) < 0.5 * float(info2['cost0'])
assert float(jnp.abs(R2 - R).max()) < 5e-3

# --- 3. mono tracking end-to-end on TPU (triangulation + matchers + BA) ----
from morb_slam_tpu import cameras, alignment
from morb_slam_tpu.pipeline import tracking
from synthetic_world import PlaneWorld, camera_path

W, H, FX = 752, 480, 460.0
cam = cameras.pinhole(FX, FX, W / 2, H / 2)
Km = np.array([[FX, 0, W / 2], [0, FX, H / 2], [0, 0, 1.0]])
world = PlaneWorld(Km, W, H, seed=0)
n_frames = 60
poses = camera_path(n_frames, step=0.05)
frames = [np.clip(world.render(Rp, tp), 0, 255).astype(np.uint8)
          for Rp, tp in poses]
cfg = tracking.TrackerConfig(width=W, height=H, focal=FX, n_feat=1200,
                             max_kf=256, max_lm=16384, n_levels=8,
                             min_init_matches=80, min_init_points=50)
tr = tracking.Tracker(cam, cfg)
t0 = time.perf_counter()
for i, img in enumerate(frames):
    tr.track_mono(img, ts=float(i))
tr.flush()
el = time.perf_counter() - t0
traj = tr.trajectory_world()
est, gt = [], []
for ts, pp in traj:
    i = int(round(ts)); Rp, tp = poses[i]
    gt.append(-(Rp.T @ tp)); est.append(pp)
rmse, s, _, _ = alignment.ate_rmse(
    jnp.asarray(np.asarray(est), jnp.float32),
    jnp.asarray(np.asarray(gt), jnp.float32), with_scale=True)
print(time.strftime("%H:%M:%S"),
      f"mono tracking on TPU: state={tr.state} kfs={tr.n_kf_host} "
      f"frames={len(traj)}/{n_frames} ate={float(rmse):.4f} "
      f"({el:.1f}s incl compile)", flush=True)
assert tr.state == "OK" and float(rmse) < 0.05
print("VERIFY OK", flush=True)
