"""Edge-sharded distributed pose-graph optimization on the 8-device CPU
mesh: must match the single-device essential-graph optimizer."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.geometry import sim3
from hyslam_tpu.parallel.mesh import make_mesh
from hyslam_tpu.parallel.dist_pose_graph import distributed_pose_graph
from hyslam_tpu.solver.pose_graph import optimize_pose_graph


def _loop_problem(K=12):
    """Drifted odometry chain + one exact loop edge (the classic essential
    graph correction scenario, OptimizeEssentialGraph)."""
    g_true = []
    cur = sim3.identity()
    step = sim3.exp(jnp.asarray([0.0, 0.0, 0.5, 0.0, 0.4, 0.0, 0.0]))
    for _ in range(K):
        g_true.append(cur)
        cur = sim3.compose(step, cur)
    g_true = jnp.stack(g_true)
    drift = sim3.exp(jnp.asarray([0.0, 0.0, 0.015, 0.0, 0.02, 0.0, 0.0]))
    g_est = [g_true[0]]
    for k in range(1, K):
        meas = sim3.compose(g_true[k], sim3.inverse(g_true[k - 1]))
        g_est.append(sim3.compose(drift, sim3.compose(meas, g_est[-1])))
    g_est = jnp.stack(g_est)

    ei, ej, meas = [], [], []
    for k in range(1, K):
        ei.append(k - 1)
        ej.append(k)
        meas.append(sim3.compose(g_true[k], sim3.inverse(g_true[k - 1])))
    ei.append(0)
    ej.append(K - 1)
    meas.append(sim3.compose(g_true[K - 1], sim3.inverse(g_true[0])))
    return g_true, g_est, ei, ej, meas


def _pad_edges(ei, ej, meas, multiple):
    E = len(ei)
    pad = (-E) % multiple
    valid = [True] * E + [False] * pad
    ei = ei + [0] * pad
    ej = ej + [0] * pad
    meas = list(meas) + [sim3.identity()] * pad
    return (jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.stack(meas), jnp.asarray(valid))


class TestDistributedPoseGraph:
    def test_matches_single_device(self):
        K = 12
        g_true, g_est, ei, ej, meas = _loop_problem(K)
        fixed = jnp.asarray(np.arange(K) == 0)
        eis, ejs, meass, valid = _pad_edges(ei, ej, meas, 8)
        mesh = make_mesh(8)
        g_d = distributed_pose_graph(
            g_est, fixed, eis, ejs, meass, valid, mesh)
        g_s = optimize_pose_graph(g_est, fixed, eis, ejs, meass, valid)
        np.testing.assert_allclose(
            np.asarray(g_d), np.asarray(g_s), atol=5e-4)

    def test_corrects_loop_drift(self):
        K = 12
        g_true, g_est, ei, ej, meas = _loop_problem(K)
        fixed = jnp.asarray(np.arange(K) == 0)
        eis, ejs, meass, valid = _pad_edges(ei, ej, meas, 8)
        mesh = make_mesh(8)
        err0 = float(jnp.linalg.norm(g_est[K - 1][5:] - g_true[K - 1][5:]))
        g_d = distributed_pose_graph(
            g_est, fixed, eis, ejs, meass, valid, mesh)
        err1 = float(jnp.linalg.norm(g_d[K - 1][5:] - g_true[K - 1][5:]))
        assert err1 < 0.1 * err0, (err0, err1)

    def test_padded_invalid_edges_are_inert(self):
        K = 12
        _, g_est, ei, ej, meas = _loop_problem(K)
        fixed = jnp.asarray(np.arange(K) == 0)
        mesh = make_mesh(8)
        # pad to 16 vs 24: results must be identical (invalid rows inert)
        a = distributed_pose_graph(
            g_est, fixed, *_pad_edges(ei, ej, meas, 16), mesh)
        b = distributed_pose_graph(
            g_est, fixed, *_pad_edges(ei, ej, meas, 24), mesh)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
