"""Pallas pose-opt kernel vs the reference jnp solver: same convergence on
the same problems (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.ops.pose_opt_pallas import pose_optimization_pallas
from hyslam_tpu.solver.pose_opt import pose_optimization

from helpers import DEFAULT_CAM, make_world, make_trajectory, observe, perturb_pose, pose_error


def problem(rng, n=256, outlier_frac=0.0, stereo_frac=1.0):
    cam = DEFAULT_CAM
    pts = make_world(rng, n)
    T_true = make_trajectory(3)[2]
    uv, ur, vis, stereo = observe(cam, T_true, pts, noise=0.3, rng=rng,
                                  stereo_frac=stereo_frac)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    uv[out_idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    T0 = perturb_pose(rng, T_true, rot=0.03, trans=0.15)
    return cam, T_true, T0, pts, uv, ur, vis, stereo, out_idx


class TestPallasPoseOpt:
    def test_matches_reference_solver(self, rng):
        cam, T_true, T0, pts, uv, ur, vis, stereo, _ = problem(rng)
        args = (
            jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.ones(len(pts)), jnp.asarray(vis),
            jnp.asarray(stereo),
        )
        ref = pose_optimization(cam, *args)
        Tk, inl, ninl = pose_optimization_pallas(cam, *args)
        rot_err, t_err = pose_error(np.asarray(Tk), T_true)
        assert rot_err < 0.1 and t_err < 0.01, (rot_err, t_err)
        # agreement with the jnp solver
        d_rot, d_t = pose_error(np.asarray(Tk), np.asarray(ref.Tcw))
        assert d_rot < 0.05 and d_t < 0.01
        assert abs(int(ninl) - int(ref.num_inliers)) <= 10

    def test_outlier_rejection(self, rng):
        cam, T_true, T0, pts, uv, ur, vis, stereo, out_idx = problem(
            rng, outlier_frac=0.25)
        Tk, inl, ninl = pose_optimization_pallas(
            cam, jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.ones(len(pts)), jnp.asarray(vis),
            jnp.asarray(stereo),
        )
        rot_err, t_err = pose_error(np.asarray(Tk), T_true)
        assert rot_err < 0.2 and t_err < 0.02
        inl = np.asarray(inl)
        assert (~inl[out_idx] | ~vis[out_idx]).mean() > 0.95

    def test_mono(self, rng):
        cam, T_true, T0, pts, uv, ur, vis, stereo, _ = problem(
            rng, stereo_frac=0.0)
        Tk, inl, ninl = pose_optimization_pallas(
            cam, jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.ones(len(pts)), jnp.asarray(vis),
            jnp.asarray(stereo & vis),
        )
        rot_err, t_err = pose_error(np.asarray(Tk), T_true)
        assert rot_err < 0.2 and t_err < 0.05
