"""Global bundle adjustment over a full map (GlobalBundleAdjustment.cc
analog): gather ALL valid keyframes + landmarks of the active scope into a
BAProblem (origin KF fixed), run LM, scatter back. The distributed variant
shards landmarks over the mesh (parallel.dist_ba)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hyslam_tpu.core.frame import level_inv_sigma2
from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.solver.ba import (
    BAObservations,
    BAProblem,
    CamArrays,
    bundle_adjustment,
)


@partial(jax.jit, static_argnames=("cam",))
def build_global_problem(ms: MapState, cam: Camera) -> BAProblem:
    """Full-map BAProblem using arena indices directly (K slots = arena
    slots; invalid/bad entries masked via kf_fixed / lm_valid)."""
    K, L, O, F = ms.K, ms.L, ms.O, ms.F
    kf_ok = ms.kf.valid & ~ms.kf.bad
    lm_ok = ms.lm.valid & ~ms.lm.bad

    obs_kf = jnp.clip(ms.lm.obs_kf, 0, K - 1)
    obs_feat = jnp.clip(ms.lm.obs_feat, 0, F - 1)
    obs_ok = ms.lm.obs_valid & lm_ok[:, None] & kf_ok[obs_kf]
    uv = ms.kf.uv[obs_kf, obs_feat]
    ur = ms.kf.ur[obs_kf, obs_feat]
    lvl = ms.kf.level[obs_kf, obs_feat]
    inv_s2 = level_inv_sigma2()[jnp.clip(lvl, 0, 7)]

    cams = CamArrays(
        fx=jnp.full((K,), cam.fx), fy=jnp.full((K,), cam.fy),
        cx=jnp.full((K,), cam.cx), cy=jnp.full((K,), cam.cy),
        bf=jnp.full((K,), cam.bf),
    )
    # fix only the root-map origin (the reference GBA fixes KF0 alone,
    # LoopClosing.cc:681-799 / GlobalBundleAdjustment.cc); submap origins
    # stay free — they are constrained by reprojection + the tiepoint
    # priors (SetSubMapOriginEdges)
    slot = jnp.arange(K)
    first_origin = jnp.min(jnp.where(ms.kf.origin & kf_ok, slot, K))
    return BAProblem(
        kf_Tcw=ms.kf.Tcw,
        kf_fixed=~kf_ok | (slot == first_origin),
        cams=cams,
        lm_pos=ms.lm.pos,
        lm_valid=lm_ok,
        obs=BAObservations(
            kf=obs_kf,
            uv=uv,
            ur=jnp.where(ur > 0, ur, 0.0),
            inv_sigma2=inv_s2,
            stereo=(ur > 0) & obs_ok,
            valid=obs_ok,
        ),
    )


def run_global_ba(ms: MapState, cam: Camera, n_iters: int = 20,
                  chunk: int = 512, mesh=None, sensors=None, opt_info=None):
    """Optimize everything; returns (ms, final cost). With a mesh, runs the
    landmark-sharded distributed solver (psum Schur reduction).

    sensors/opt_info enable the sensor-fusion + submap-tiepoint pose priors
    (BundleAdjustment.cc:60-201) via slam.sensor_fusion.build_pose_priors."""
    prob = build_global_problem(ms, cam)
    from hyslam_tpu.slam.sensor_fusion import build_pose_priors

    priors = build_pose_priors(ms, sensors=sensors, opt=opt_info)
    if priors is not None:
        prob = prob._replace(priors=priors)
    if mesh is None:
        res = bundle_adjustment(prob, n_iters=n_iters, huber=True, chunk=chunk)
    else:
        from hyslam_tpu.parallel.dist_ba import distributed_bundle_adjustment

        res = distributed_bundle_adjustment(
            prob, mesh, n_iters=n_iters, huber=True, chunk=chunk
        )
    kf_move = ~prob.kf_fixed
    Tcw = jnp.where(kf_move[:, None, None], res.kf_Tcw, ms.kf.Tcw)
    pos = jnp.where(prob.lm_valid[:, None], res.lm_pos, ms.lm.pos)
    ms = ms._replace(
        kf=ms.kf._replace(Tcw=Tcw), lm=ms.lm._replace(pos=pos)
    )
    ms = M.update_landmark_stats(ms)
    return ms, float(res.cost)
