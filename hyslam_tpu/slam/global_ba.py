"""Global bundle adjustment over a full map (GlobalBundleAdjustment.cc
analog): gather ALL valid keyframes + landmarks of the active scope into a
BAProblem (origin KF fixed), run LM, scatter back. The distributed variant
shards landmarks over the mesh (parallel.dist_ba)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from hyslam_tpu.core.frame import feature_inv_sigma2
from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.solver.ba import (
    BAObservations,
    BAProblem,
    CamArrays,
    bundle_adjustment,
)


@partial(jax.jit, static_argnames=("cam", "tie_active", "n_levels",
                                   "scale_factor"))
def build_global_problem(ms: MapState, cam: Camera,
                         tie_active: bool = False, n_levels: int = 8,
                         scale_factor: float = 1.2) -> BAProblem:
    """Full-map BAProblem using arena indices directly (K slots = arena
    slots; invalid/bad entries masked via kf_fixed / lm_valid).

    tie_active: whether submap tiepoint pose priors will constrain the
    problem (run_global_ba sets it from the built priors). Origins of maps
    with no active tiepoint stay FIXED — a submap registered without a
    tiepoint (or with tiepoint_info=0) would otherwise be a disconnected
    component with full gauge freedom, making the reduced camera system
    singular (ADVICE r1)."""
    K, L, O, F = ms.K, ms.L, ms.O, ms.F
    kf_ok = ms.kf.valid & ~ms.kf.bad
    lm_ok = ms.lm.valid & ~ms.lm.bad

    obs_kf = jnp.clip(ms.lm.obs_kf, 0, K - 1)
    obs_feat = jnp.clip(ms.lm.obs_feat, 0, F - 1)
    obs_ok = ms.lm.obs_valid & lm_ok[:, None] & kf_ok[obs_kf]
    uv = ms.kf.uv[obs_kf, obs_feat]
    ur = ms.kf.ur[obs_kf, obs_feat]
    lvl = ms.kf.level[obs_kf, obs_feat]
    inv_s2 = feature_inv_sigma2(lvl, n_levels, scale_factor)

    cams = CamArrays(
        fx=jnp.full((K,), cam.fx), fy=jnp.full((K,), cam.fy),
        cx=jnp.full((K,), cam.cx), cy=jnp.full((K,), cam.cy),
        bf=jnp.full((K,), cam.bf),
    )
    # the root-map origin is always fixed (the reference GBA fixes KF0,
    # LoopClosing.cc:681-799 / GlobalBundleAdjustment.cc); a submap origin is
    # free only when an active tiepoint edge (SetSubMapOriginEdges) ties its
    # map into the optimized component — otherwise it stays fixed so the
    # submap keeps the gauge its registration/alignment gave it
    slot = jnp.arange(K)
    first_origin = jnp.min(jnp.where(ms.kf.origin & kf_ok, slot, K))
    mt = ms.maps
    map_tied = mt.registered & (mt.tie_kf >= 0) & (mt.parent >= 0)
    map_tied = map_tied & kf_ok[jnp.clip(mt.tie_kf, 0, K - 1)]
    if not tie_active:
        map_tied = jnp.zeros_like(map_tied)
    kf_map_tied = map_tied[jnp.clip(ms.kf.map_id, 0, M.MAX_MAPS - 1)]
    fixed_origin = ms.kf.origin & kf_ok & ~kf_map_tied
    return BAProblem(
        kf_Tcw=ms.kf.Tcw,
        kf_fixed=~kf_ok | fixed_origin | (slot == first_origin),
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
                  chunk: int = 512, mesh=None, sensors=None, opt_info=None,
                  n_levels: int = 8, scale_factor: float = 1.2):
    """Optimize everything; returns (ms, final cost). With a mesh, runs the
    landmark-sharded distributed solver (psum Schur reduction).

    sensors/opt_info enable the sensor-fusion + submap-tiepoint pose priors
    (BundleAdjustment.cc:60-201) via slam.sensor_fusion.build_pose_priors."""
    import numpy as np
    from hyslam_tpu.slam.sensor_fusion import build_pose_priors

    priors = build_pose_priors(ms, sensors=sensors, opt=opt_info)
    tie_active = (priors is not None
                  and bool(np.asarray(priors.tie_valid).any()))
    prob = build_global_problem(ms, cam, tie_active=tie_active,
                                n_levels=n_levels, scale_factor=scale_factor)
    if priors is not None:
        prob = prob._replace(priors=priors)
    if mesh is None:
        res = bundle_adjustment(prob, n_iters=n_iters, huber=True, chunk=chunk)
    elif "kf" in mesh.shape and prob.kf_Tcw.shape[0] >= 512:
        # keyframe-scale maps on a 2-D ('kf','lm') mesh: partition the
        # reduced camera system's columns over 'kf' as well — compute and
        # memory of the Schur system drop by the kf-axis size while each
        # CG step still psums only a [K,6] (SURVEY §2.10 north star)
        from hyslam_tpu.parallel.dist_ba import (
            distributed_bundle_adjustment_2d,
        )

        res = distributed_bundle_adjustment_2d(
            prob, mesh, n_iters=n_iters, huber=True, chunk=chunk
        )
    else:
        from hyslam_tpu.parallel.dist_ba import distributed_bundle_adjustment

        if "kf" in mesh.shape:
            from jax.sharding import Mesh

            # small-K maps: the 1-D landmark sharding is faster; fold the
            # kf axis into lm so all devices still participate
            devs = mesh.devices.reshape(-1)
            mesh = Mesh(devs, ("lm",))
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
