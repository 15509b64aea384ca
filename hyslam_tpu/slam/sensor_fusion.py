"""Assemble PosePriors for bundle adjustment from per-keyframe sensor data
and the submap tiepoint table.

Replaces the edge-setup stage of the reference BA
(src/optimizers/BundleAdjustment.cc):

- SetGPSEdges (:109-180): fit a GPS->SLAM Horn Sim3 from all keyframes
  carrying valid GPS (needs > 4 fixes), transform each GPS measurement into
  the SLAM frame, rotate the per-axis GPS error into the SLAM frame and use
  its reciprocal as diagonal information (OptHelpers.cc Rotate_GpsError),
  scaled by optParams.Info_GPS.
- SetIMUEdges (:60-83) / SetDepthEdges (:85-107): per-KF unary priors
  weighted by Info_IMU / Info_Depth.
- SetSubMapOriginEdges (:182-201): one SE3 edge per registered submap
  between its origin keyframe and the parent tiepoint keyframe, weighted by
  Info_submap_tiepoint.

Runs host-side once per BA invocation (the reference also computes the Horn
alignment once at graph-build time, not per LM iteration).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MAX_MAPS, MapState
from hyslam_tpu.core.sensordata import SensorArena
from hyslam_tpu.geometry import sim3
from hyslam_tpu.geometry.horn import horn_sim3
from hyslam_tpu.io.config import OptimizerInfo
from hyslam_tpu.solver.priors import PosePriors, empty_pose_priors

MIN_GPS_FIXES = 5  # reference requires nGPSdata > 4 (BundleAdjustment.cc:137)


def gps_alignment(centers: np.ndarray, gps: np.ndarray):
    """Horn Sim3 mapping GPS coordinates -> SLAM camera centers.

    Returns (g_sim3 packed [8], R [3,3]) or (None, None) when degenerate."""
    g = np.asarray(horn_sim3(jnp.asarray(gps), jnp.asarray(centers),
                             fix_scale=False))
    if not np.all(np.isfinite(g)):
        return None, None
    _, R, _ = sim3.unpack(jnp.asarray(g))
    return g, np.asarray(R)


def rotate_gps_info(gps_err: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Per-axis information of GPS errors rotated into the SLAM frame
    (OptHelpers.cc:179-191): rotate the per-axis error columns, take row
    norms as the new per-axis error, information = 1/err."""
    merr_r = R @ (np.eye(3) * gps_err[:, None, :])        # [K, 3, 3]
    err_rot = np.linalg.norm(merr_r, axis=-1)             # row norms [K, 3]
    return 1.0 / np.maximum(err_rot, 1e-9)


def build_tiepoint_edges(ms: MapState):
    """Extract (tie_a, tie_b, tie_T, tie_valid) arrays [MAX_MAPS] from the
    map table: one edge per registered submap with a tiepoint, between the
    parent tiepoint KF (a) and the submap's origin KF (b), measurement
    M = Tse3_parent (convention pose_b = M pose_a, Map.h:75)."""
    kf_map = np.asarray(ms.kf.map_id)
    kf_origin = np.asarray(ms.kf.origin & ms.kf.valid & ~ms.kf.bad)
    tie_kf = np.asarray(ms.maps.tie_kf)
    registered = np.asarray(ms.maps.registered)
    parent = np.asarray(ms.maps.parent)

    tie_a = np.zeros(MAX_MAPS, np.int32)
    tie_b = np.zeros(MAX_MAPS, np.int32)
    tie_T = np.tile(np.eye(4, dtype=np.float32), (MAX_MAPS, 1, 1))
    tie_valid = np.zeros(MAX_MAPS, bool)
    # n_maps is a monotonic cursor; clamp to the table capacity so a run
    # that hit the MAX_MAPS bound cannot index past the table
    for mid in range(min(int(np.asarray(ms.maps.n_maps)), MAX_MAPS)):
        if parent[mid] < 0 or not registered[mid] or tie_kf[mid] < 0:
            continue
        origins = np.nonzero(kf_origin & (kf_map == mid))[0]
        if origins.size == 0:
            continue
        tie_a[mid] = tie_kf[mid]
        tie_b[mid] = origins[0]
        tie_T[mid] = np.asarray(ms.maps.Tse3_parent[mid])
        tie_valid[mid] = True
    return tie_a, tie_b, tie_T, tie_valid


def build_pose_priors(
    ms: MapState,
    sensors: SensorArena | None = None,
    opt: OptimizerInfo | None = None,
    include_tiepoints: bool = True,
) -> PosePriors | None:
    """PosePriors slot-aligned with the keyframe arena, or None when no
    prior would be active (so BA skips the prior path entirely)."""
    opt = opt or OptimizerInfo()
    K = ms.K
    pr = empty_pose_priors(K, E=MAX_MAPS if include_tiepoints else 0)
    any_active = False

    if include_tiepoints and opt.tiepoint_info > 0:
        tie_a, tie_b, tie_T, tie_valid = build_tiepoint_edges(ms)
        if tie_valid.any():
            any_active = True
        pr = pr._replace(
            tie_a=jnp.asarray(tie_a), tie_b=jnp.asarray(tie_b),
            tie_T=jnp.asarray(tie_T),
            tie_info=jnp.full((MAX_MAPS,), float(opt.tiepoint_info),
                              jnp.float32),
            tie_valid=jnp.asarray(tie_valid),
        )

    if sensors is not None:
        kf_ok = np.asarray(ms.kf.valid & ~ms.kf.bad)
        if opt.imu_info > 0:
            imu_valid = np.asarray(sensors.quat_valid) & kf_ok
            if imu_valid.any():
                any_active = True
                pr = pr._replace(
                    imu_quat=sensors.quat,
                    imu_info=jnp.full((K,), float(opt.imu_info), jnp.float32),
                    imu_valid=jnp.asarray(imu_valid),
                )
        if opt.depth_info > 0:
            depth_valid = np.asarray(sensors.depth_valid) & kf_ok
            if depth_valid.any():
                any_active = True
                pr = pr._replace(
                    depth=sensors.depth,
                    depth_info=jnp.full((K,), float(opt.depth_info),
                                        jnp.float32),
                    depth_valid=jnp.asarray(depth_valid),
                )
        if opt.gps_info > 0:
            gps_valid = np.asarray(sensors.gps_valid) & kf_ok
            if gps_valid.sum() >= MIN_GPS_FIXES:
                centers = np.asarray(M.camera_centers(ms))[gps_valid]
                gps = np.asarray(sensors.gps)[gps_valid]
                g, R = gps_alignment(centers, gps)
                if g is not None:
                    any_active = True
                    gps_slam = np.asarray(
                        sim3.apply(jnp.asarray(g), sensors.gps)
                    )
                    info = rotate_gps_info(
                        np.asarray(sensors.gps_err), R
                    ) * float(opt.gps_info)
                    pr = pr._replace(
                        gps_pos=jnp.asarray(gps_slam),
                        gps_info=jnp.asarray(info.astype(np.float32)),
                        gps_valid=jnp.asarray(gps_valid),
                    )
    return pr if any_active else None
