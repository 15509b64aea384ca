"""Mapping jobs: new-keyframe integration, landmark culling, triangulation,
fusion, local BA, keyframe culling.

Replaces src/slam/mapping (MapJob subclasses, SURVEY.md §2.3) and the
Mapping thread's job sequencing (src/main/Mapping.cpp:165-282). Each job is
a batched pass over the map arenas; the host Mapper.integrate_keyframe()
sequences them exactly like SetupMandatoryJobs -> SetupOptionalJobs. The
parameter defaults mirror config/slam_mapping_config.yaml.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hyslam_tpu.core.frame import feature_inv_sigma2
from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.features.matcher import (
    fundamental_from_poses,
    search_by_projection_landmarks,
    search_for_triangulation,
)
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.geometry.triangulation import projection_matrix, triangulate_dlt
from hyslam_tpu.solver.ba import (
    BAObservations,
    BAProblem,
    CamArrays,
    local_ba_two_phase,
)


class MapperParams(NamedTuple):
    """Defaults = config/slam_mapping_config.yaml values."""

    min_lm_obs_mono: int = 2
    min_lm_obs_stereo: int = 3
    kf_grace_period: int = 3
    orphan_age: int = 0   # >0: cull landmarks that lost ALL observations
                          # once older than this many keyframes (long-run
                          # arena policy for the 600-frame soaks; 0 keeps
                          # zombie points alive for frame-to-frame chains —
                          # the behavior the dual-camera flagship relies on)
    triang_nn_stereo: int = 10
    triang_nn_mono: int = 15
    triang_ratio_factor: float = 1.8
    triang_min_baseline_depth_ratio: float = 0.010
    triang_err_mono: float = 5.5
    triang_err_stereo: float = 7.8
    fuse_nn: int = 10
    fuse_second_nn: int = 5
    kfcull_obs_thresh: int = 3
    kfcull_frac_redundant: float = 0.85


# ---------------------------------------------------------------------------
# LandMarkCuller (mandatory job)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("is_mono",))
def cull_landmarks(ms: MapState, cur_kf_id, params: MapperParams,
                   is_mono: bool = False) -> MapState:
    """LandMarkCuller::run: recent landmarks lose one protection tick per new
    keyframe; once unprotected, those still under-observed after the grace
    period are erased."""
    thresh = params.min_lm_obs_mono if is_mono else params.min_lm_obs_stereo
    lm = ms.lm
    recent = lm.valid & ~lm.bad & (lm.first_kf >= 0)
    age = cur_kf_id - lm.first_kf
    in_review = recent & (age <= params.kf_grace_period + 1)
    prot = jnp.where(in_review & (lm.protection > 0), lm.protection - 1, lm.protection)
    # freed (bad) rows tick toward reallocation eligibility: their
    # RECYCLE_DELAY countdown gates the add_landmarks free-list so a slot
    # is never reused in the pass that freed it (mapstate.RECYCLE_DELAY)
    prot = jnp.where(lm.bad & (lm.protection > 0), lm.protection - 1, prot)
    cull = (
        recent
        & (prot == 0)
        & (age >= params.kf_grace_period)
        & (age <= params.kf_grace_period + 1)
        & (lm.n_obs <= thresh)
    )
    # orphans: rows that lost ALL observations (their observers were
    # culled / associations erased) are invisible to local-map matching and
    # BA — dead weight that pins arena slots on long sequences. They can
    # still ride frame-to-frame motion-model chains (and are re-bound with
    # an observation whenever a keyframe is made from a frame that matches
    # them), so the age threshold is a policy knob: 0 disables (flagship
    # behavior), soak drivers set ~6 for the long-run arena budget.
    orphan = (lm.valid & ~lm.bad & (lm.n_obs == 0)
              & (age > params.orphan_age)
              & (jnp.asarray(params.orphan_age, jnp.int32) > 0))
    ms = ms._replace(lm=lm._replace(protection=prot))
    return M.set_landmarks_bad(ms, cull | orphan)


# ---------------------------------------------------------------------------
# LandMarkTriangulator (optional job)
# ---------------------------------------------------------------------------

def _scene_median_depth(ms: MapState, k, cam: Camera):
    lm_id = ms.kf.lm_id[k]
    has = lm_id >= 0
    pos = ms.lm.pos[jnp.clip(lm_id, 0, ms.L - 1)]
    z = se3.apply(ms.kf.Tcw[k], pos)[..., 2]
    z = jnp.where(has, z, jnp.nan)
    return jnp.nanmedian(z)


def _triangulate_pair(
    ms: MapState, k1, k2, cam: Camera, cam2: Camera, params: MapperParams,
    enabled=True, scale_factor: float = 1.2,
):
    """Triangulate new landmarks between keyframes k1 (new) and k2
    (covisible neighbor): epipolar match of unmatched features, parallax
    arbitration DLT vs stereo unprojection, depth/reproj/scale gates
    (LandMarkTriangulator.cpp:17-201). Returns (ms, n_new).

    `enabled` masks the whole pair (traced as a no-op when False) so the
    neighbor loop can run as one lax.scan on device (VERDICT r3 weak #3:
    the per-neighbor host loop with int() syncs was the mapper's
    dispatch-bound bottleneck)."""
    F = ms.F
    f1 = M.kf_features(ms, k1)
    f2 = M.kf_features(ms, k2)
    T1 = ms.kf.Tcw[k1]
    T2 = ms.kf.Tcw[k2]
    F12 = fundamental_from_poses(cam, T1, cam2, T2)
    un1 = ms.kf.lm_id[k1] < 0
    un2 = ms.kf.lm_id[k2] < 0
    idx2, _ = search_for_triangulation(cam, f1, f2, un1, un2, F12,
                                       scale_factor=scale_factor)
    ok = (idx2 >= 0) & enabled
    i2 = jnp.clip(idx2, 0, F - 1)

    # rays in world frame
    C1 = -jnp.einsum("ji,j->i", T1[:3, :3], T1[:3, 3])
    C2 = -jnp.einsum("ji,j->i", T2[:3, :3], T2[:3, 3])
    bl = jnp.linalg.norm(C2 - C1)

    def backproject_ray(T, camx, uv):
        d = jnp.stack(
            [(uv[:, 0] - camx.cx) / camx.fx, (uv[:, 1] - camx.cy) / camx.fy,
             jnp.ones(uv.shape[0])], axis=-1,
        )
        return jnp.einsum("ji,nj->ni", T[:3, :3], d)

    ray1 = backproject_ray(T1, cam, f1.uv)
    ray2 = backproject_ray(T2, cam2, f2.uv[i2])
    cos_par = jnp.sum(ray1 * ray2, -1) / jnp.maximum(
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1), 1e-9
    )
    st1 = f1.ur > 0
    st2 = f2.ur[i2] > 0
    cos_st1 = jnp.where(
        st1, jnp.cos(2.0 * jnp.arctan2(cam.baseline / 2.0, jnp.maximum(f1.depth, 1e-6))),
        cos_par + 1.0,
    )
    cos_st2 = jnp.where(
        st2,
        jnp.cos(2.0 * jnp.arctan2(cam2.baseline / 2.0,
                                  jnp.maximum(f2.depth[i2], 1e-6))),
        cos_par + 1.0,
    )
    cos_stereo = jnp.minimum(cos_st1, cos_st2)

    P1 = projection_matrix(cam.K(), T1)
    P2 = projection_matrix(cam2.K(), T2)
    X_dlt = triangulate_dlt(
        jnp.broadcast_to(P1, (F, 3, 4)), jnp.broadcast_to(P2, (F, 3, 4)),
        f1.uv, f2.uv[i2],
    )
    X_st1 = se3.apply(se3.inverse(T1), jnp.stack(
        [(f1.uv[:, 0] - cam.cx) / cam.fx * f1.depth,
         (f1.uv[:, 1] - cam.cy) / cam.fy * f1.depth, f1.depth], -1))
    X_st2 = se3.apply(se3.inverse(T2), jnp.stack(
        [(f2.uv[i2, 0] - cam2.cx) / cam2.fx * f2.depth[i2],
         (f2.uv[i2, 1] - cam2.cy) / cam2.fy * f2.depth[i2], f2.depth[i2]], -1))

    use_dlt = (cos_par < cos_stereo) & (cos_par > 0) & (
        st1 | st2 | (cos_par < 0.9998)
    )
    use_st1 = ~use_dlt & st1 & (cos_st1 < cos_st2)
    use_st2 = ~use_dlt & st2 & ~use_st1
    X = jnp.where(use_dlt[:, None], X_dlt,
                  jnp.where(use_st1[:, None], X_st1, X_st2))
    ok = ok & (use_dlt | use_st1 | use_st2)

    # gates: positive depth in both, reprojection chi2, scale consistency
    pc1 = se3.apply(T1, X)
    pc2 = se3.apply(T2, X)
    ok = ok & (pc1[:, 2] > 0) & (pc2[:, 2] > 0)

    def reproj_err2(camx, pc, uv):
        zs = jnp.maximum(pc[:, 2], 1e-9)
        u = camx.fx * pc[:, 0] / zs + camx.cx
        v = camx.fy * pc[:, 1] / zs + camx.cy
        return (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2

    sig1 = scale_factor ** (2.0 * f1.level.astype(jnp.float32))
    sig2 = scale_factor ** (2.0 * f2.level[i2].astype(jnp.float32))
    th1 = jnp.where(st1, params.triang_err_stereo, params.triang_err_mono) * sig1
    th2 = jnp.where(st2, params.triang_err_stereo, params.triang_err_mono) * sig2
    ok = ok & (reproj_err2(cam, pc1, f1.uv) <= th1)
    ok = ok & (reproj_err2(cam2, pc2, f2.uv[i2]) <= th2)

    d1 = jnp.linalg.norm(X - C1, axis=-1)
    d2 = jnp.linalg.norm(X - C2, axis=-1)
    ratio_dist = d2 / jnp.maximum(d1, 1e-9)
    ratio_size = scale_factor ** (f1.level - f2.level[i2]).astype(jnp.float32)
    rf = params.triang_ratio_factor
    ok = ok & (ratio_dist * rf >= ratio_size) & (ratio_dist <= ratio_size * rf)
    ok = ok & (d1 > 1e-6) & (d2 > 1e-6) & (bl > 1e-9)

    ms, new_idx = M.add_landmarks(
        ms, X, f1.desc, k1, jnp.arange(F, dtype=jnp.int32), ok, protection=3
    )
    ms = M.add_associations(ms, k2, i2, new_idx, ok)
    return ms, jnp.sum(ok.astype(jnp.int32))


def triangulate_new_landmarks(ms: MapState, kf_id, cam: Camera,
                              params: MapperParams, is_mono: bool = False,
                              scale_factor: float = 1.2):
    """Best covisible neighbors with sufficient baseline, triangulated in
    one lax.scan over neighbor slots — one device program for the whole job
    instead of a host loop of per-pair dispatches + int() syncs."""
    nn = params.triang_nn_mono if is_mono else params.triang_nn_stereo
    ids, _ = M.covis_neighbors(ms, kf_id, nn, min_weight=1)
    centers = M.camera_centers(ms)
    c1 = centers[jnp.clip(kf_id, 0, ms.K - 1)]
    idc = jnp.clip(ids, 0, ms.K - 1)
    baseline = jnp.linalg.norm(centers[idc] - c1, axis=-1)
    if is_mono:
        meds = jax.vmap(lambda k2: _scene_median_depth(ms, k2, cam))(idc)
        gate = jnp.isfinite(meds) & (
            baseline / jnp.maximum(meds, 1e-9)
            >= params.triang_min_baseline_depth_ratio)
    else:
        gate = baseline >= cam.baseline
    enabled = (ids >= 0) & gate

    def body(carry, inp):
        msc, n_acc = carry
        k2, en = inp
        msc, n = _triangulate_pair(msc, kf_id, k2, cam, cam, params,
                                   enabled=en, scale_factor=scale_factor)
        return (msc, n_acc + n), None

    (ms, n_total), _ = jax.lax.scan(
        body, (ms, jnp.asarray(0, jnp.int32)), (idc, enabled))
    return ms, n_total


# ---------------------------------------------------------------------------
# LandMarkFuser (optional job)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam", "n_levels", "scale_factor"))
def _fuse_into_kf(ms: MapState, k, lm_rows: jnp.ndarray, cam: Camera,
                  th: float = 3.0, enabled=True, n_levels: int = 8,
                  scale_factor: float = 1.2):
    """Project candidate landmarks [N] into keyframe k; matched features
    either gain an association or trigger landmark replacement keeping the
    better-observed one (FeatureMatcher::Fuse + Map::replaceMapPoint).
    `enabled` masks the whole call (for lax.scan over target slots)."""
    f = M.kf_features(ms, k)
    N = lm_rows.shape[0]
    lmc = jnp.clip(lm_rows, 0, ms.L - 1)
    valid = (lm_rows >= 0) & ms.lm.valid[lmc] & ~ms.lm.bad[lmc] & enabled
    res = search_by_projection_landmarks(
        cam, f, ms.kf.Tcw[k],
        ms.lm.pos[lmc], ms.lm.normal[lmc], ms.lm.desc[lmc],
        ms.lm.max_dist[lmc], ms.lm.min_dist[lmc], valid,
        already_matched=jnp.zeros((ms.F,), bool),  # fuse also checks matched
        th=th, ratio=1.0, n_levels=n_levels, scale_factor=scale_factor,
    )
    feat_rows = res.lm_for_feature                      # [F] -> row in lm_rows
    cand = jnp.where(feat_rows >= 0, lm_rows[jnp.clip(feat_rows, 0, N - 1)], -1)
    existing = ms.kf.lm_id[jnp.clip(k, 0, ms.K - 1)]
    both = (cand >= 0) & (existing >= 0) & (cand != existing)
    add_new = (cand >= 0) & (existing < 0)
    # keep the landmark with more observations (MapPointDB::replace rule)
    n_cand = ms.lm.n_obs[jnp.clip(cand, 0, ms.L - 1)]
    n_exist = ms.lm.n_obs[jnp.clip(existing, 0, ms.L - 1)]
    src = jnp.where(n_cand > n_exist, existing, cand)
    dst = jnp.where(n_cand > n_exist, cand, existing)
    ms = M.replace_landmarks(ms, src, dst, both)
    ms = M.add_associations(ms, k, jnp.arange(ms.F, dtype=jnp.int32), cand, add_new)
    return ms, jnp.sum(both.astype(jnp.int32)), jnp.sum(add_new.astype(jnp.int32))


MAX_FUSE_TARGETS = 16   # cap on the deduped 1st+2nd-degree target set,
                        # kept by covisibility weight (the reference's
                        # 10+5x dedup typically lands well under 16; each
                        # target is a full projection-search scan step, so
                        # the cap is half the per-KF fuse time)


def fuse_landmarks(ms: MapState, kf_id, cam: Camera, params: MapperParams,
                   n_levels: int = 8, scale_factor: float = 1.2):
    """LandMarkFuser::run: fuse this KF's landmarks into its 1st+2nd degree
    covisibility neighborhood and vice versa — as lax.scans over a
    fixed-size target set (one device program; the per-target host loop it
    replaces cost ~60 dispatches + int() syncs per keyframe,
    VERDICT r3 weak #3)."""
    K = ms.K
    ids, _ = M.covis_neighbors(ms, kf_id, params.fuse_nn, min_weight=1)
    ok1 = ids >= 0
    idc = jnp.clip(ids, 0, K - 1)
    # 2nd-degree: top fuse_second_nn covis neighbors of each 1st-degree KF
    kf_ok = ms.kf.valid & ~ms.kf.bad
    w2 = jnp.where(kf_ok[None, :], ms.covis[idc], 0)
    w2 = w2 * ok1[:, None]
    top_w2, sec = jax.lax.top_k(w2, params.fuse_second_nn)   # [n1, n2]
    sec_ok = (top_w2 > 0) & (sec != kf_id)
    # deduped target mask (exclude self)
    tmask = jnp.zeros((K + 1,), bool)
    tmask = tmask.at[jnp.where(ok1, idc, K)].set(True)
    tmask = tmask.at[jnp.where(sec_ok, sec, K)].set(True)
    tmask = tmask[:K].at[jnp.clip(kf_id, 0, K - 1)].set(False)
    # fixed-size target list ordered by covis weight with the new KF
    # (reference order is 1st-degree-first; weight order is equivalent for
    # the near-commutative fuse updates)
    prio = jnp.where(tmask, ms.covis[kf_id] + 1, 0)
    prio_w, targets = jax.lax.top_k(prio, min(MAX_FUSE_TARGETS, K))
    t_ok = prio_w > 0
    first_deg = jnp.zeros((K + 1,), bool).at[
        jnp.where(ok1, idc, K)].set(True)[:K]

    own = ms.kf.lm_id[jnp.clip(kf_id, 0, K - 1)]
    own_rows = jnp.where(own >= 0, own, -1)

    def fwd(carry, inp):
        msc, nr, na = carry
        t, en = inp
        msc, r, a = _fuse_into_kf(msc, t, own_rows, cam, enabled=en,
                                  n_levels=n_levels,
                                  scale_factor=scale_factor)
        return (msc, nr + r, na + a), None

    z = jnp.asarray(0, jnp.int32)
    (ms, n_rep, n_add), _ = jax.lax.scan(
        fwd, (ms, z, z), (targets, t_ok))

    def rev(carry, inp):
        msc, nr, na = carry
        t, en = inp
        rows = msc.kf.lm_id[t]
        msc, r, a = _fuse_into_kf(
            msc, kf_id, jnp.where(rows >= 0, rows, -1), cam, enabled=en,
            n_levels=n_levels, scale_factor=scale_factor)
        return (msc, nr + r, na + a), None

    # reverse: 1st-degree neighbors' landmarks into this KF
    (ms, n_rep, n_add), _ = jax.lax.scan(
        rev, (ms, n_rep, n_add), (targets, t_ok & first_deg[targets]))
    ms = M.update_landmark_stats(ms)
    ms = M.refresh_covisibility(ms)
    return ms, n_rep, n_add


# ---------------------------------------------------------------------------
# LocalBundleAdjustmentJob (optional)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam", "max_local_kf", "max_lm",
                                   "n_levels", "scale_factor"))
def _gather_local_ba(ms: MapState, kf_id, cam: Camera,
                     max_local_kf: int = 32, max_lm: int = 4096,
                     n_levels: int = 8, scale_factor: float = 1.2,
                     cam_table: CamArrays | None = None):
    """Assemble a BAProblem for the covisibility neighborhood of kf_id:
    local KFs (1-hop covis + self), their landmarks, and fixed observer KFs
    (LocalBundleAdjustment::FindLocalKFs/FindLocalMapPoints/FindFixedKFs).

    Returns (problem, local_kf_ids [Kl], lm_rows [max_lm], obs_slots)."""
    K, L, O, F = ms.K, ms.L, ms.O, ms.F
    w = ms.covis[kf_id] * (ms.kf.valid & ~ms.kf.bad).astype(jnp.int32)
    w = w.at[kf_id].set(1 << 20)  # self first
    top_w, local_ids = jax.lax.top_k(w, max_local_kf)
    local_ok = top_w > 0
    is_local = jnp.zeros((K,), bool).at[jnp.where(local_ok, local_ids, K)].set(
        True, mode="drop"
    )

    # landmarks of local KFs
    src = jnp.where(
        is_local[:, None] & (ms.kf.lm_id >= 0), jnp.clip(ms.kf.lm_id, 0, L - 1), L
    )
    lm_hit = jnp.zeros((L + 1,), bool).at[src.reshape(-1)].set(True, mode="drop")[:L]
    lm_hit = lm_hit & ms.lm.valid & ~ms.lm.bad
    _, lm_rows = jax.lax.top_k(lm_hit.astype(jnp.int32), max_lm)
    lm_ok = lm_hit[lm_rows]
    lmc = jnp.clip(lm_rows, 0, L - 1)

    # observers of these landmarks that are not local -> fixed
    obs_kf = ms.lm.obs_kf[lmc]                       # [max_lm, O]
    obs_ok = ms.lm.obs_valid[lmc] & lm_ok[:, None]
    obs_kfc = jnp.clip(obs_kf, 0, K - 1)
    observer = jnp.zeros((K + 1,), bool).at[
        jnp.where(obs_ok, obs_kfc, K).reshape(-1)
    ].set(True, mode="drop")[:K]
    fixed_global = observer & ~is_local & ms.kf.valid & ~ms.kf.bad

    # slot table: local KFs take slots [0, max_local_kf), fixed observers get
    # appended slots
    slot_of = jnp.full((K,), -1, jnp.int32)
    slot_of = slot_of.at[jnp.where(local_ok, local_ids, K)].set(
        jnp.arange(max_local_kf, dtype=jnp.int32), mode="drop"
    )
    n_fix_cap = max_local_kf  # same cap for fixed slots
    fix_rank = jnp.cumsum(fixed_global.astype(jnp.int32)) - 1
    fix_slot = jnp.where(
        fixed_global & (fix_rank < n_fix_cap), max_local_kf + fix_rank, -1
    )
    slot_of = jnp.where(fix_slot >= 0, fix_slot, slot_of)

    KL = max_local_kf + n_fix_cap
    # per-slot pose/camera arrays
    kf_of_slot = jnp.full((KL,), 0, jnp.int32)
    kf_of_slot = kf_of_slot.at[jnp.arange(max_local_kf)].set(
        jnp.clip(local_ids, 0, K - 1)
    )
    kf_of_slot = kf_of_slot.at[
        jnp.where(fix_slot >= 0, fix_slot, KL)
    ].set(jnp.arange(K, dtype=jnp.int32), mode="drop")
    slot_used = jnp.zeros((KL,), bool).at[
        jnp.where(local_ok, jnp.arange(max_local_kf), KL)
    ].set(True, mode="drop")
    slot_used = slot_used.at[jnp.where(fix_slot >= 0, fix_slot, KL)].set(
        True, mode="drop"
    )
    slot_fixed = jnp.arange(KL) >= max_local_kf
    # the oldest local KF is held fixed too when it is the map origin
    slot_fixed = slot_fixed | ms.kf.origin[kf_of_slot]

    obs_slot_kf = jnp.where(obs_ok, slot_of[obs_kfc], -1)
    obs_feat = jnp.clip(ms.lm.obs_feat[lmc], 0, F - 1)
    obs_valid = obs_ok & (obs_slot_kf >= 0)
    kf_rows = jnp.clip(obs_kfc, 0, K - 1)
    uv = ms.kf.uv[kf_rows, obs_feat]
    ur = ms.kf.ur[kf_rows, obs_feat]
    lvl = ms.kf.level[kf_rows, obs_feat]
    inv_s2 = feature_inv_sigma2(lvl, n_levels, scale_factor)

    if cam_table is None:
        cams = CamArrays(
            fx=jnp.full((KL,), cam.fx), fy=jnp.full((KL,), cam.fy),
            cx=jnp.full((KL,), cam.cx), cy=jnp.full((KL,), cam.cy),
            bf=jnp.full((KL,), cam.bf),
        )
    else:
        # mixed-intrinsics problem: per-slot camera parameters resolved
        # through the keyframe's cam_id (multi-camera keyframes in ONE
        # local BA, the surface the reference's imaging BA mixes —
        # BundleAdjustment.cc:203-334 projects each observation through
        # its own camera)
        cid = jnp.clip(ms.kf.cam_id[kf_of_slot], 0,
                       cam_table.fx.shape[0] - 1)
        cams = CamArrays(
            fx=cam_table.fx[cid], fy=cam_table.fy[cid],
            cx=cam_table.cx[cid], cy=cam_table.cy[cid],
            bf=cam_table.bf[cid],
        )
    prob = BAProblem(
        kf_Tcw=ms.kf.Tcw[kf_of_slot],
        kf_fixed=slot_fixed | ~slot_used,
        cams=cams,
        lm_pos=ms.lm.pos[lmc],
        lm_valid=lm_ok,
        obs=BAObservations(
            kf=jnp.clip(obs_slot_kf, 0, KL - 1),
            uv=uv, ur=jnp.where(ur > 0, ur, 0.0),
            inv_sigma2=inv_s2,
            stereo=(ur > 0) & obs_valid,
            valid=obs_valid,
        ),
    )
    return prob, kf_of_slot, slot_used, slot_used & ~slot_fixed, lm_rows, lm_ok


@partial(jax.jit, static_argnames=())
def _scatter_ba_results(ms: MapState, kf_of_slot, slot_movable, lm_rows, lm_ok,
                        kf_Tcw_new, lm_pos_new):
    K, L = ms.K, ms.L
    tgt_k = jnp.where(slot_movable, jnp.clip(kf_of_slot, 0, K - 1), K)
    Tcw = ms.kf.Tcw.at[tgt_k].set(kf_Tcw_new, mode="drop")
    tgt_l = jnp.where(lm_ok, jnp.clip(lm_rows, 0, L - 1), L)
    pos = ms.lm.pos.at[tgt_l].set(lm_pos_new, mode="drop")
    return ms._replace(kf=ms.kf._replace(Tcw=Tcw), lm=ms.lm._replace(pos=pos))


def _slot_priors(ms: MapState, sensors, opt_info, kf_of_slot, slot_used):
    """Remap full-arena PosePriors onto local-BA slots (the reference's
    LocalBundleAdjustment also calls SetIMUEdges/SetDepthEdges/SetGPSEdges/
    SetSubMapOriginEdges, LocalBundleAdjustment.cc:47-110)."""
    import numpy as np

    from hyslam_tpu.slam.sensor_fusion import build_pose_priors
    from hyslam_tpu.solver.priors import empty_pose_priors

    pr = build_pose_priors(ms, sensors, opt_info)
    if pr is None:
        return None
    idx = np.asarray(kf_of_slot)
    used = np.asarray(slot_used)
    KL = len(idx)

    out = empty_pose_priors(KL, E=pr.tie_a.shape[0])._replace(
        gps_pos=pr.gps_pos[idx], gps_info=pr.gps_info[idx],
        gps_valid=pr.gps_valid[idx] & jnp.asarray(used),
        imu_quat=pr.imu_quat[idx], imu_info=pr.imu_info[idx],
        imu_valid=pr.imu_valid[idx] & jnp.asarray(used),
        depth=pr.depth[idx], depth_info=pr.depth_info[idx],
        depth_valid=pr.depth_valid[idx] & jnp.asarray(used),
    )
    # tiepoint edges survive only when both endpoints hold a slot
    slot_of = np.full((ms.K,), -1, np.int32)
    slot_of[idx[used]] = np.nonzero(used)[0]
    ta = slot_of[np.clip(np.asarray(pr.tie_a), 0, ms.K - 1)]
    tb = slot_of[np.clip(np.asarray(pr.tie_b), 0, ms.K - 1)]
    tie_ok = np.asarray(pr.tie_valid) & (ta >= 0) & (tb >= 0)
    out = out._replace(
        tie_a=jnp.asarray(np.maximum(ta, 0)),
        tie_b=jnp.asarray(np.maximum(tb, 0)),
        tie_T=pr.tie_T, tie_info=pr.tie_info,
        tie_valid=jnp.asarray(tie_ok),
    )
    any_active = bool(
        np.asarray(out.gps_valid).any() or np.asarray(out.imu_valid).any()
        or np.asarray(out.depth_valid).any() or tie_ok.any()
    )
    return out if any_active else None


def _local_ba_body(ms: MapState, kf_id, cam: Camera, max_local_kf, max_lm,
                   n_levels, scale_factor, priors=None, cam_table=None):
    prob, kf_of_slot, slot_used, slot_movable, lm_rows, lm_ok = \
        _gather_local_ba(ms, kf_id, cam, max_local_kf, max_lm,
                         n_levels, scale_factor, cam_table=cam_table)
    if priors is not None:
        prob = prob._replace(priors=priors)
    res = local_ba_two_phase(prob, chunk=256)
    ms = _scatter_ba_results(
        ms, kf_of_slot, slot_movable, lm_rows, lm_ok, res.kf_Tcw, res.lm_pos
    )
    # erase outlier observations
    out = prob.obs.valid & ~res.obs_inlier               # [max_lm, O]
    slots = jnp.broadcast_to(jnp.arange(ms.O)[None, :], out.shape)
    lm_rep = jnp.broadcast_to(lm_rows[:, None], out.shape)
    ms = M.erase_observations(
        ms, lm_rep.reshape(-1), slots.reshape(-1), out.reshape(-1)
    )
    ms = M.update_landmark_stats(ms)
    return ms, res.cost


@partial(jax.jit, static_argnames=("cam", "max_local_kf", "max_lm",
                                   "n_levels", "scale_factor"))
def _local_ba_noprior(ms: MapState, kf_id, cam: Camera, max_local_kf,
                      max_lm, n_levels, scale_factor):
    """Whole local-BA job (gather + two-phase BA + scatter + outlier
    erasure + stats) as ONE device program — the common no-sensor,
    no-registered-submap case."""
    return _local_ba_body(ms, kf_id, cam, max_local_kf, max_lm,
                          n_levels, scale_factor)


def local_bundle_adjustment(ms: MapState, kf_id: int, cam: Camera,
                            max_local_kf: int = 32, max_lm: int = 4096,
                            sensors=None, opt_info=None,
                            n_levels: int = 8, scale_factor: float = 1.2,
                            cam_table: CamArrays | None = None):
    """LocalBundleAdjustment::Run: two-phase robust BA over the covisibility
    neighborhood; outlier observations are erased from the map afterwards.
    With sensors/opt_info, sensor + submap-tiepoint pose priors join the
    problem exactly as in the global path. cam_table ([n_cams] CamArrays)
    resolves per-keyframe intrinsics through kf.cam_id for mixed-camera
    problems (imaging + SLAM keyframes in one neighborhood)."""
    prob_slots = _gather_local_ba(ms, kf_id, cam, max_local_kf, max_lm,
                                  n_levels, scale_factor,
                                  cam_table=cam_table)
    priors = _slot_priors(ms, sensors, opt_info, prob_slots[1], prob_slots[2])
    ms, cost = _local_ba_body(ms, kf_id, cam, max_local_kf, max_lm,
                              n_levels, scale_factor, priors=priors,
                              cam_table=cam_table)
    return ms, cost   # device scalar: callers float() it only when they
                      # actually report it (a blocking fetch costs a ~23 ms
                      # round trip on the proxied runtime)


# ---------------------------------------------------------------------------
# KeyFrameCuller (optional job)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam",))
def _kf_redundancy(ms: MapState, cam: Camera, params: MapperParams,
                   kf_rows=None):
    """Fraction of each KF's close landmarks that are redundantly observed
    (>= 3 other KFs at same-or-finer scale, KeyFrameCuller.cpp).

    With kf_rows [N] (padded with out-of-range ids) only those keyframes'
    [N,F,O] observation blocks are gathered — the KF culler only ever
    evaluates the new keyframe's ~10 covisible neighbors, and the full
    [K,F,O] gather was the dominant per-keyframe cost at soak scale
    (110 ms at K=512, PROFILE_r05.md)."""
    K, L, F, O = ms.K, ms.L, ms.F, ms.O
    if kf_rows is None:
        kf_rows = jnp.arange(K)
    rows = jnp.clip(kf_rows, 0, K - 1)
    lm_id = ms.kf.lm_id[rows]                            # [N, F]
    has = lm_id >= 0
    lmc = jnp.clip(lm_id, 0, L - 1)
    depth = ms.kf.depth[rows]
    close = has & (depth > 0) & (depth < cam.close_depth)
    # observation levels of each landmark's observers
    obs_kf = ms.lm.obs_kf[lmc]                           # [N, F, O]
    obs_feat = jnp.clip(ms.lm.obs_feat[lmc], 0, F - 1)
    obs_ok = ms.lm.obs_valid[lmc]
    obs_lvl = ms.kf.level[jnp.clip(obs_kf, 0, K - 1), obs_feat]
    own_lvl = ms.kf.level[rows][:, :, None]
    k_idx = rows[:, None, None]
    other = obs_ok & (obs_kf != k_idx) & (obs_lvl <= own_lvl + 1)
    n_other = jnp.sum(other.astype(jnp.int32), axis=-1)  # [N, F]
    redundant = close & (n_other >= params.kfcull_obs_thresh)
    n_close = jnp.sum(close.astype(jnp.int32), axis=-1)
    n_red = jnp.sum(redundant.astype(jnp.int32), axis=-1)
    frac = n_red / jnp.maximum(n_close, 1)
    return jnp.where(n_close > 0, frac, 0.0)


def cull_keyframes(ms: MapState, kf_id, cam: Camera, params: MapperParams):
    """KeyFrameCuller::run: mark covisible neighbors of the new KF bad when
    >= 85% of their close landmarks are redundant. SLAM camera only.
    Fully on-device (no host pulls of the arenas, VERDICT r3 weak #3)."""
    ids, _ = M.covis_neighbors(ms, kf_id, 10, min_weight=1)
    idc = jnp.where(ids >= 0, jnp.clip(ids, 0, ms.K - 1), 0)
    frac_n = _kf_redundancy(ms, cam, params, kf_rows=idc)   # [10]
    cand_ok = ids >= 0
    cull = jnp.zeros((ms.K + 1,), bool).at[
        jnp.where(cand_ok & (frac_n > params.kfcull_frac_redundant),
                  idc, ms.K)
    ].set(True, mode="drop")[: ms.K]
    cull = cull & ~ms.kf.origin
    n_cull = jnp.sum(cull.astype(jnp.int32))
    ms = M.set_keyframes_bad(ms, cull)
    ms = M.refresh_covisibility(ms)
    ms = M.compute_spanning_parents(ms)
    return ms, n_cull


# ---------------------------------------------------------------------------
# Mapper: the job sequencer (Mapping thread analog)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("cam", "params", "is_mono", "do_optional",
                                   "n_levels", "scale_factor"))
def _integrate_core(ms: MapState, kf_id, params: MapperParams, cam: Camera,
                    is_mono: bool, do_optional: bool, n_levels: int = 8,
                    scale_factor: float = 1.2):
    """Mandatory jobs (covis/spanning/stats refresh + landmark culling) and
    the optional triangulate + fuse jobs as ONE device program per keyframe
    (the reference's SetupMandatoryJobs -> SetupOptionalJobs sequencing,
    Mapping.cpp:165-282). Returns (ms, stats [3] int32)."""
    ms = M.refresh_covisibility(ms)
    ms = M.compute_spanning_parents(ms)
    ms = M.update_landmark_stats(ms)
    ms = cull_landmarks(ms, kf_id, params, is_mono)
    z = jnp.asarray(0, jnp.int32)
    n_tri, n_rep, n_add = z, z, z
    if do_optional:
        ms, n_tri = triangulate_new_landmarks(ms, kf_id, cam, params, is_mono,
                                              scale_factor)
        ms, n_rep, n_add = fuse_landmarks(ms, kf_id, cam, params,
                                          n_levels, scale_factor)
    return ms, jnp.stack([n_tri, n_rep, n_add])


@partial(jax.jit, static_argnames=("cam", "params"))
def _cull_keyframes_jit(ms: MapState, kf_id, cam: Camera,
                        params: MapperParams):
    return cull_keyframes(ms, kf_id, cam, params)


class Mapper:
    """Sequences mandatory + optional jobs per keyframe
    (Mapping::SetupMandatoryJobs/SetupOptionalJobs). `budget_level` mimics
    the interrupt/suppression protocol: 0 = mandatory only (queue backed
    up), 1 = +triangulation/fusion, 2 = full incl. local BA + KF culling.

    Per keyframe the whole sequence costs 2-3 device programs and ONE host
    sync of the packed counters (round 3 ran ~60 dispatches with a sync
    each — the reason the full System path could not keep frame rate on
    the proxied TPU runtime, VERDICT r3 weak #3)."""

    def __init__(self, cam: Camera, params: MapperParams | None = None,
                 is_mono: bool = False, n_levels: int = 8,
                 scale_factor: float = 1.2):
        self.cam = cam
        self.params = params or MapperParams()
        self.is_mono = is_mono
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.kf_count = 0

    def integrate_keyframe(self, ms: MapState, kf_id: int,
                           budget_level: int = 2, cull_kfs: bool = True,
                           sensors=None, opt_info=None,
                           fetch_stats: bool = True,
                           has_priors: bool | None = None):
        """With fetch_stats=False the whole job sequence is dispatch-only
        (ZERO host syncs): the packed counters ride back as a device handle
        under stats["counters"] for async consumers; kf_id may be a traced
        device scalar. `has_priors` lets the caller supply the host-known
        sensor/tiepoint flag instead of the device check (the async tracking
        loop maintains it exactly — every set_sensor/register_submap is a
        host-side event)."""
        stats = {}
        p = self.params
        ms, counters = _integrate_core(ms, kf_id, p, self.cam, self.is_mono,
                                       budget_level >= 1, self.n_levels,
                                       self.scale_factor)
        if budget_level >= 2 and self.kf_count > 2:
            # sensor/tiepoint priors only exist once a sensor reading was
            # attached or a submap registered; the fast path keeps the whole
            # local-BA job in one program (ONE cheap flag sync per KF)
            if has_priors is None:
                has_priors = bool(np.asarray(
                    jnp.any(ms.maps.registered)
                    | (jnp.any(sensors.gps_valid) | jnp.any(sensors.quat_valid)
                       | jnp.any(sensors.depth_valid)
                       if sensors is not None else False)))
            # neighborhood caps: 16 local KFs / 2048 landmarks cover the
            # 1-hop covisibility set at the reference's operating points
            # (LocalBundleAdjustment::FindLocalKFs is 1-hop too) at half
            # the per-KF device time of the old 32/4096 caps (68 ms vs
            # 151 ms measured, PROFILE_r05.md)
            if has_priors:
                ms, cost = local_bundle_adjustment(
                    ms, kf_id, self.cam, max_local_kf=16, max_lm=2048,
                    sensors=sensors, opt_info=opt_info,
                    n_levels=self.n_levels, scale_factor=self.scale_factor)
            else:
                ms, cost = _local_ba_noprior(
                    ms, kf_id, self.cam, 16, 2048,
                    self.n_levels, self.scale_factor)
            if cull_kfs and not self.is_mono:
                ms, n_cull = _cull_keyframes_jit(ms, kf_id, self.cam, p)
                counters = jnp.concatenate([counters, n_cull[None]])
            if fetch_stats:
                stats["ba_cost"] = float(cost)
        self.kf_count += 1
        if not fetch_stats:
            stats["counters"] = counters   # device handle, no sync
            return ms, stats
        c = np.asarray(counters)   # ONE host sync for all job counters
        if budget_level >= 1:
            stats["triangulated"] = int(c[0])
            stats["fused"] = int(c[1])
            stats["fuse_added"] = int(c[2])
        if len(c) > 3:
            stats["kf_culled"] = int(c[3])
        return ms, stats
