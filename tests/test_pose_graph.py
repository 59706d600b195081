"""Pose-graph optimization tests: loop-closure drift correction on a
synthetic drifty circular trajectory (the essential-graph use case)."""
import jax.numpy as jnp
import numpy as np

from morb_slam_tpu import lie
from morb_slam_tpu.optim import pose_graph


def circle_poses(n, radius=3.0):
    """Ground-truth camera poses around a circle (world->cam)."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        Rwc = np.asarray(lie.so3_exp(jnp.asarray([0.0, a, 0.0], jnp.float32)))
        c = np.array([radius * np.sin(a), 0.0, radius * (1 - np.cos(a))])
        R = Rwc.T
        t = -R @ c
        poses.append((jnp.asarray(R, jnp.float32), jnp.asarray(t, jnp.float32)))
    return poses


def build_drifty_graph(n=40, drift_rot=0.004, drift_scale=1.004, seed=0):
    """Integrate noisy+drifty odometry; add a clean loop edge 0 <-> n-1."""
    gt = circle_poses(n)
    # measured odometry: true relative + systematic drift
    s_nodes = [jnp.asarray(1.0)]
    R_nodes = [gt[0][0]]
    t_nodes = [gt[0][1]]
    drift = lie.sim3_exp(jnp.asarray(
        [0.002, 0, 0, 0, drift_rot, 0, np.log(drift_scale)], jnp.float32))
    meas = []
    for k in range(1, n):
        R_rel, t_rel = lie.se3_mul(gt[k][0], gt[k][1],
                                   *lie.se3_inv(gt[k - 1][0], gt[k - 1][1]))
        s_m, R_m, t_m = lie.sim3_mul(*drift, jnp.asarray(1.0), R_rel, t_rel)
        meas.append((s_m, R_m, t_m))
        # integrate measured to get drifted absolute nodes
        s_k, R_k, t_k = lie.sim3_mul(s_m, R_m, t_m, s_nodes[-1],
                                     R_nodes[-1], t_nodes[-1])
        s_nodes.append(s_k)
        R_nodes.append(R_k)
        t_nodes.append(t_k)

    edges = []
    for k in range(1, n):
        edges.append((k, k - 1, *meas[k - 1], 1.0))
    # loop edge with TRUE relative transform (what Sim3Solver provides)
    R_loop, t_loop = lie.se3_mul(gt[n - 1][0], gt[n - 1][1],
                                 *lie.se3_inv(gt[0][0], gt[0][1]))
    edges.append((n - 1, 0, jnp.asarray(1.0), R_loop, t_loop, 5.0))

    g = pose_graph.PoseGraph(
        s=jnp.stack(s_nodes), R=jnp.stack(R_nodes), t=jnp.stack(t_nodes),
        edge_i=jnp.asarray([e[0] for e in edges], jnp.int32),
        edge_j=jnp.asarray([e[1] for e in edges], jnp.int32),
        edge_s=jnp.stack([jnp.asarray(e[2]) for e in edges]),
        edge_R=jnp.stack([e[3] for e in edges]),
        edge_t=jnp.stack([e[4] for e in edges]),
        edge_w=jnp.asarray([e[5] for e in edges], jnp.float32),
        fixed=jnp.zeros(n, bool).at[0].set(True),
    )
    return g, gt


def centers(s, R, t):
    Rwc = jnp.swapaxes(R, -1, -2)
    return -lie.matvec(Rwc, t) / s[:, None]


def test_loop_closure_corrects_drift():
    g, gt = build_drifty_graph()
    c_before = np.asarray(centers(g.s, g.R, g.t))
    c_gt = np.asarray(jnp.stack(
        [-lie.matvec(R.T, t) for R, t in gt]))
    err_before = np.linalg.norm(c_before - c_gt, axis=1).mean()
    s, R, t, costs = pose_graph.optimize(g, n_iters=20)
    c_after = np.asarray(centers(s, R, t))
    err_after = np.linalg.norm(c_after - c_gt, axis=1).mean()
    assert float(costs[-1]) < 0.05 * float(costs[0]), costs
    assert err_after < 0.35 * err_before, (err_before, err_after)
    # scale drift removed: node scales return near 1
    assert abs(float(s[-1]) - 1.0) < 0.03


def test_fix_scale_mode_keeps_unit_scale():
    g, gt = build_drifty_graph(drift_scale=1.0)
    s, R, t, costs = pose_graph.optimize(g, n_iters=15, fix_scale=True)
    np.testing.assert_allclose(np.asarray(s), 1.0, atol=1e-5)
    assert float(costs[-1]) < 0.1 * float(costs[0])


def test_fixed_node_stays():
    g, _ = build_drifty_graph()
    s, R, t, _ = pose_graph.optimize(g, n_iters=5)
    np.testing.assert_allclose(np.asarray(R[0]), np.asarray(g.R[0]),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(t[0]), np.asarray(g.t[0]),
                               atol=1e-6)
