"""Solver tests: pose-only LM (Optimizer::PoseOptimization analog) and
Schur-complement bundle adjustment (Local/Global BA analogs)."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.geometry import se3
from hyslam_tpu.solver.pose_opt import pose_optimization
from hyslam_tpu.solver.ba import (
    BAObservations,
    BAProblem,
    CamArrays,
    bundle_adjustment,
    local_ba_two_phase,
)

from helpers import (
    DEFAULT_CAM,
    make_trajectory,
    make_world,
    observe,
    perturb_pose,
    pose_error,
)


def _pad(a, n, fill=0):
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    out[: len(a)] = a
    return out


class TestPoseOptimization:
    def _problem(self, rng, n=300, noise=0.3, outlier_frac=0.0, stereo_frac=1.0):
        cam = DEFAULT_CAM
        pts = make_world(rng, n)
        T_true = make_trajectory(3)[2]
        uv, ur, vis, stereo = observe(cam, T_true, pts, noise=noise, rng=rng,
                                      stereo_frac=stereo_frac)
        n_out = int(outlier_frac * n)
        out_idx = rng.choice(n, n_out, replace=False)
        uv[out_idx] += rng.uniform(30, 120, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
        T0 = perturb_pose(rng, T_true, rot=0.03, trans=0.15)
        inv_sigma2 = np.ones(n, np.float32)
        return cam, T_true, T0, pts, uv, ur, inv_sigma2, vis, stereo, out_idx

    def test_converges_clean(self, rng):
        cam, T_true, T0, pts, uv, ur, is2, vis, stereo, _ = self._problem(rng)
        res = pose_optimization(
            cam, jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.asarray(is2), jnp.asarray(vis), jnp.asarray(stereo),
        )
        rot_err, t_err = pose_error(np.asarray(res.Tcw), T_true)
        assert rot_err < 0.1, rot_err
        assert t_err < 0.01, t_err
        assert int(res.num_inliers) > 0.9 * vis.sum()

    def test_rejects_outliers(self, rng):
        cam, T_true, T0, pts, uv, ur, is2, vis, stereo, out_idx = self._problem(
            rng, outlier_frac=0.25
        )
        res = pose_optimization(
            cam, jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.asarray(is2), jnp.asarray(vis), jnp.asarray(stereo),
        )
        rot_err, t_err = pose_error(np.asarray(res.Tcw), T_true)
        assert rot_err < 0.2, rot_err
        assert t_err < 0.02, t_err
        inl = np.asarray(res.inliers)
        # injected outliers must be flagged
        flagged = ~inl[out_idx] | ~vis[out_idx]
        assert flagged.mean() > 0.95

    def test_mono_only(self, rng):
        cam, T_true, T0, pts, uv, ur, is2, vis, stereo, _ = self._problem(
            rng, stereo_frac=0.0
        )
        res = pose_optimization(
            cam, jnp.asarray(T0), jnp.asarray(pts), jnp.asarray(uv),
            jnp.asarray(ur), jnp.asarray(is2), jnp.asarray(vis),
            jnp.asarray(stereo & vis),
        )
        rot_err, t_err = pose_error(np.asarray(res.Tcw), T_true)
        assert rot_err < 0.2, rot_err
        assert t_err < 0.05, t_err

    def test_padded_invalid_rows_ignored(self, rng):
        cam, T_true, T0, pts, uv, ur, is2, vis, stereo, _ = self._problem(rng, n=200)
        # pad to 256 with garbage
        N = 256
        res = pose_optimization(
            cam, jnp.asarray(T0),
            jnp.asarray(_pad(pts, N, 1e3)), jnp.asarray(_pad(uv, N, -1e4)),
            jnp.asarray(_pad(ur, N)), jnp.asarray(_pad(is2, N, 1.0)),
            jnp.asarray(_pad(vis.astype(np.bool_), N, False)),
            jnp.asarray(_pad(stereo.astype(np.bool_), N, False)),
        )
        rot_err, t_err = pose_error(np.asarray(res.Tcw), T_true)
        assert rot_err < 0.1 and t_err < 0.01


def build_ba_problem(rng, n_kf=6, n_lm=150, noise=0.3, perturb=True,
                     n_fixed=2, max_obs=8, drop=0.2):
    cam = DEFAULT_CAM
    pts = make_world(rng, n_lm, extent=(10.0, 7.0, 25.0), z_min=4.0)
    Ts = make_trajectory(n_kf, step=0.4)
    obs_kf = np.zeros((n_lm, max_obs), np.int32)
    obs_uv = np.zeros((n_lm, max_obs, 2), np.float32)
    obs_ur = np.zeros((n_lm, max_obs), np.float32)
    obs_st = np.zeros((n_lm, max_obs), np.bool_)
    obs_va = np.zeros((n_lm, max_obs), np.bool_)
    counts = np.zeros(n_lm, np.int32)
    for k in range(n_kf):
        uv, ur, vis, stereo = observe(cam, Ts[k], pts, noise=noise, rng=rng)
        keep = vis & (rng.uniform(size=n_lm) > drop) & (counts < max_obs)
        idx = np.nonzero(keep)[0]
        obs_kf[idx, counts[idx]] = k
        obs_uv[idx, counts[idx]] = uv[idx]
        obs_ur[idx, counts[idx]] = ur[idx]
        obs_st[idx, counts[idx]] = stereo[idx]
        obs_va[idx, counts[idx]] = True
        counts[idx] += 1

    lm_valid = counts >= 2
    kf_T0 = Ts.copy()
    lm0 = pts.copy()
    if perturb:
        for k in range(n_fixed, n_kf):
            kf_T0[k] = perturb_pose(rng, Ts[k], rot=0.01, trans=0.08)
        lm0 = pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)

    cams = CamArrays(
        fx=jnp.full(n_kf, cam.fx), fy=jnp.full(n_kf, cam.fy),
        cx=jnp.full(n_kf, cam.cx), cy=jnp.full(n_kf, cam.cy),
        bf=jnp.full(n_kf, cam.bf),
    )
    prob = BAProblem(
        kf_Tcw=jnp.asarray(kf_T0),
        kf_fixed=jnp.asarray(np.arange(n_kf) < n_fixed),
        cams=cams,
        lm_pos=jnp.asarray(lm0),
        lm_valid=jnp.asarray(lm_valid),
        obs=BAObservations(
            kf=jnp.asarray(obs_kf), uv=jnp.asarray(obs_uv), ur=jnp.asarray(obs_ur),
            inv_sigma2=jnp.ones((n_lm, max_obs), jnp.float32),
            stereo=jnp.asarray(obs_st), valid=jnp.asarray(obs_va),
        ),
    )
    return prob, Ts, pts


class TestBundleAdjustment:
    def test_reduces_to_truth(self, rng):
        prob, Ts_true, pts_true = build_ba_problem(rng)
        res = bundle_adjustment(prob, n_iters=12, chunk=64)
        for k in range(2, len(Ts_true)):
            rot_err, t_err = pose_error(np.asarray(res.kf_Tcw[k]), Ts_true[k])
            assert rot_err < 0.15, (k, rot_err)
            assert t_err < 0.03, (k, t_err)
        # optimality: the solution must fit the (noisy) measurements at least
        # as well as the ground-truth parameters do
        truth = bundle_adjustment(
            prob._replace(kf_Tcw=jnp.asarray(Ts_true), lm_pos=jnp.asarray(pts_true)),
            n_iters=0, chunk=64,
        )
        assert float(res.cost) <= float(truth.cost) * 1.05
        # landmarks: bounded by measurement information, not by init proximity —
        # median error under a few tenths at these depths/noise
        lm_err = np.linalg.norm(np.asarray(res.lm_pos) - pts_true, axis=-1)
        valid = np.asarray(prob.lm_valid)
        assert np.median(lm_err[valid]) < 0.5

    def test_cost_decreases(self, rng):
        prob, _, _ = build_ba_problem(rng)
        r0 = bundle_adjustment(prob, n_iters=1, chunk=64)
        r5 = bundle_adjustment(prob, n_iters=8, chunk=64)
        assert float(r5.cost) < float(r0.cost)

    def test_fixed_kfs_unmoved(self, rng):
        prob, Ts_true, _ = build_ba_problem(rng)
        res = bundle_adjustment(prob, n_iters=8, chunk=64)
        np.testing.assert_allclose(
            np.asarray(res.kf_Tcw[:2]), np.asarray(prob.kf_Tcw[:2]), atol=1e-6
        )

    def test_two_phase_rejects_outlier_obs(self, rng):
        prob, Ts_true, pts_true = build_ba_problem(rng)
        # corrupt 5% of observations
        uv = np.array(prob.obs.uv)
        va = np.asarray(prob.obs.valid)
        flat = np.nonzero(va.reshape(-1))[0]
        bad = rng.choice(flat, max(1, len(flat) // 20), replace=False)
        uv.reshape(-1, 2)[bad] += 60.0
        prob = prob._replace(obs=prob.obs._replace(uv=jnp.asarray(uv)))
        res = local_ba_two_phase(prob, chunk=64)
        inl = np.asarray(res.obs_inlier).reshape(-1)
        assert (~inl[bad]).mean() > 0.9  # corrupted obs detected
        for k in range(2, len(Ts_true)):
            rot_err, t_err = pose_error(np.asarray(res.kf_Tcw[k]), Ts_true[k])
            assert rot_err < 0.25 and t_err < 0.05, (k, rot_err, t_err)

    def test_chunk_invariance(self, rng):
        prob, _, _ = build_ba_problem(rng, n_lm=100)
        ra = bundle_adjustment(prob, n_iters=3, chunk=32)
        rb = bundle_adjustment(prob, n_iters=3, chunk=100)
        np.testing.assert_allclose(
            np.asarray(ra.kf_Tcw), np.asarray(rb.kf_Tcw), atol=5e-4
        )


class TestCGSolver:
    """Matrix-free PCG reduced-camera solve (the K >~ 1k path where the
    dense [6K,6K] assembly is a memory/flops wall — SURVEY §2.10)."""

    def test_cg_matches_dense(self, rng):
        prob, Ts_true, _ = build_ba_problem(rng)
        rd = bundle_adjustment(prob, n_iters=8, chunk=64, solver="dense")
        rc = bundle_adjustment(prob, n_iters=8, chunk=64, solver="cg")
        for k in range(len(Ts_true)):
            rot, tr = pose_error(np.asarray(rd.kf_Tcw[k]),
                                 np.asarray(rc.kf_Tcw[k]))
            assert rot < 0.02 and tr < 0.005, (k, rot, tr)
        assert abs(float(rd.cost) - float(rc.cost)) < \
            0.02 * float(rd.cost) + 1.0

    def test_cg_with_priors_matches_dense(self, rng):
        from hyslam_tpu.solver.priors import empty_pose_priors

        prob, Ts_true, _ = build_ba_problem(rng)
        K = prob.kf_Tcw.shape[0]
        pr = empty_pose_priors(K, E=2)
        # tiepoint edge 0 -> 3 from the (perturbed) current poses
        M = np.asarray(prob.kf_Tcw[3]) @ np.linalg.inv(
            np.asarray(prob.kf_Tcw[0]))
        pr = pr._replace(
            tie_a=pr.tie_a.at[0].set(0), tie_b=pr.tie_b.at[0].set(3),
            tie_T=pr.tie_T.at[0].set(jnp.asarray(M)),
            tie_info=pr.tie_info.at[0].set(1.0),
            tie_valid=pr.tie_valid.at[0].set(True),
        )
        p = prob._replace(priors=pr)
        rd = bundle_adjustment(p, n_iters=6, chunk=64, solver="dense")
        rc = bundle_adjustment(p, n_iters=6, chunk=64, solver="cg")
        for k in range(len(Ts_true)):
            rot, tr = pose_error(np.asarray(rd.kf_Tcw[k]),
                                 np.asarray(rc.kf_Tcw[k]))
            assert rot < 0.05 and tr < 0.01, (k, rot, tr)

    def test_cg_at_scale_smoke(self, rng):
        """K=768 exceeds the dense auto-threshold: 'auto' must route to cg
        and produce finite poses without materializing [6K,6K]."""
        prob, _, _ = build_ba_problem(rng, n_kf=12, n_lm=600)
        K = 768
        reps = K // 12
        # tile the 12-KF problem to K=768 disjoint copies (block-diagonal
        # system: same optimum per block, scale in K only)
        kf_T = jnp.tile(prob.kf_Tcw, (reps, 1, 1))
        fixed = jnp.tile(prob.kf_fixed, (reps,))
        cams = type(prob.cams)(*(jnp.tile(c, (reps,)) for c in prob.cams))
        L = prob.lm_pos.shape[0]
        off = (jnp.arange(reps).repeat(L) * 12).astype(jnp.int32)
        obs = prob.obs._replace(
            kf=jnp.tile(prob.obs.kf, (reps, 1)) + off[:, None],
            uv=jnp.tile(prob.obs.uv, (reps, 1, 1)),
            ur=jnp.tile(prob.obs.ur, (reps, 1)),
            inv_sigma2=jnp.tile(prob.obs.inv_sigma2, (reps, 1)),
            stereo=jnp.tile(prob.obs.stereo, (reps, 1)),
            valid=jnp.tile(prob.obs.valid, (reps, 1)),
        )
        big = BAProblem(
            kf_Tcw=kf_T, kf_fixed=fixed, cams=cams,
            lm_pos=jnp.tile(prob.lm_pos, (reps, 1)),
            lm_valid=jnp.tile(prob.lm_valid, (reps,)),
            obs=obs,
        )
        res = bundle_adjustment(big, n_iters=3, solver="auto")
        assert bool(jnp.isfinite(res.kf_Tcw).all())
        assert float(res.cost) < 1e7
