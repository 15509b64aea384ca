"""Distributed BA on the virtual 8-device CPU mesh: the sharded Schur
reduction must match the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyslam_tpu.parallel.mesh import make_mesh
from hyslam_tpu.parallel.dist_ba import distributed_bundle_adjustment
from hyslam_tpu.solver.ba import bundle_adjustment

from helpers import pose_error
from test_solver import build_ba_problem


class TestDistributedBA:
    def test_matches_single_device(self, rng):
        prob, Ts_true, pts_true = build_ba_problem(rng, n_lm=160)
        mesh = make_mesh(8)
        res_d = distributed_bundle_adjustment(prob, mesh, n_iters=6, chunk=20)
        res_s = bundle_adjustment(prob, n_iters=6, chunk=20)
        # same optimum (iteration paths may differ by reduction order)
        for k in range(len(Ts_true)):
            rot, tr = pose_error(np.asarray(res_d.kf_Tcw[k]),
                                 np.asarray(res_s.kf_Tcw[k]))
            assert rot < 0.05 and tr < 0.01, (k, rot, tr)
        assert abs(float(res_d.cost) - float(res_s.cost)) < 0.1 * float(res_s.cost) + 5.0

    def test_converges_to_truth(self, rng):
        prob, Ts_true, _ = build_ba_problem(rng, n_lm=160)
        mesh = make_mesh(8)
        res = distributed_bundle_adjustment(prob, mesh, n_iters=10, chunk=20)
        for k in range(2, len(Ts_true)):
            rot, tr = pose_error(np.asarray(res.kf_Tcw[k]), Ts_true[k])
            assert rot < 0.2 and tr < 0.04, (k, rot, tr)

    def test_runs_on_subset_mesh(self, rng):
        prob, _, _ = build_ba_problem(rng, n_lm=160)
        mesh = make_mesh(4)
        res = distributed_bundle_adjustment(prob, mesh, n_iters=2, chunk=20)
        assert np.isfinite(float(res.cost))
