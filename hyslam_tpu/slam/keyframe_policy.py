"""Keyframe insertion policy + new-keyframe landmark seeding.

Replaces TrackingStateNormal::needNewKeyFrame (TrackingStateNormal.cpp:
87-170) and TrackingState::createNewKeyFrame (TrackingState.cpp:20-93).
Decision constants default to config/slam_tracking_config.yaml's SLAM-camera
NORMAL block. The decision itself runs on host scalars (it gates host-side
control flow); the close-point seeding is a jitted pass.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera


class KeyFramePolicyParams(NamedTuple):
    """Defaults: slam_tracking_config.yaml SLAM/NORMAL block."""

    n_tracked_target: int = 150
    n_tracked_variance: int = 25
    min_kf_interval: int = 0
    max_kf_interval: int = 60
    min_n_tracked_close: int = 100
    thresh_n_nontracked_close: int = 70
    min_frac_ref_kf_mono: float = 0.9
    min_frac_ref_kf_stereo: float = 0.5


class KFDecisionInputs(NamedTuple):
    n_inliers: int
    frame_id: int
    last_kf_frame_id: int
    n_kfs_in_map: int
    n_tracked_close: int
    n_nontracked_close: int
    mapping_idle: bool
    mapping_queue_len: int
    is_mono: bool
    force: bool = False
    mapping_stopped: bool = False


def need_new_keyframe(inp: KFDecisionInputs, p: KeyFramePolicyParams) -> bool:
    """Faithful port of the decision tree in TrackingStateNormal.cpp:87-170
    (the ref-matches ratio branch is expressed through the tracked-target
    thresholds as the reference's config does)."""
    if not inp.force and inp.mapping_stopped:
        return False
    need_close = (
        not inp.is_mono
        and inp.n_tracked_close < p.min_n_tracked_close
        and inp.n_nontracked_close > p.thresh_n_nontracked_close
    )
    max_interval = inp.frame_id >= inp.last_kf_frame_id + p.max_kf_interval
    min_interval = inp.frame_id >= inp.last_kf_frame_id + p.min_kf_interval
    weak = inp.n_inliers < p.n_tracked_target - p.n_tracked_variance
    dire = inp.n_inliers < p.n_tracked_target - 2 * p.n_tracked_variance

    definite = inp.force or max_interval or dire
    optional = min_interval and (weak or need_close)
    if not (definite or (optional and inp.mapping_idle)):
        return False
    if inp.mapping_idle or inp.force:
        return True
    return inp.mapping_queue_len < 3


@partial(jax.jit, static_argnames=("cam",))
def seed_close_landmarks(
    ms: MapState,
    kf_id,
    cam: Camera,
    n_close_target: int = 100,
):
    """Create landmarks from the new keyframe's close stereo depths: sorted
    by depth, every unassociated feature gets a landmark while depth <
    thDepth*baseline OR fewer than n_close_target points are covered
    (TrackingState.cpp:39-86). Returns (ms, n_created)."""
    F = ms.F
    k = jnp.clip(jnp.asarray(kf_id), 0, ms.K - 1)
    depth = ms.kf.depth[k]
    uv = ms.kf.uv[k]
    has_assoc = ms.kf.lm_id[k] >= 0
    valid_pt = ms.kf.kp_valid[k] & (depth > 0)

    order = jnp.argsort(jnp.where(valid_pt, depth, jnp.inf))
    d_sorted = depth[order]
    v_sorted = valid_pt[order]
    a_sorted = has_assoc[order]
    counted = v_sorted  # both existing and new count toward nPoints
    cum = jnp.cumsum(counted.astype(jnp.int32))
    stop = (d_sorted > cam.close_depth) & (cum > n_close_target)
    stopped = jnp.cumsum(stop.astype(jnp.int32)) > 0
    create_sorted = v_sorted & ~a_sorted & ~stopped
    create = jnp.zeros((F,), bool).at[order].set(create_sorted)

    X = se3.apply(
        se3.inverse(ms.kf.Tcw[k]),
        jnp.stack(
            [
                (uv[:, 0] - cam.cx) / cam.fx * depth,
                (uv[:, 1] - cam.cy) / cam.fy * depth,
                depth,
            ],
            axis=-1,
        ),
    )
    ms, idx = M.add_landmarks(
        ms, X, ms.kf.desc[k], k, jnp.arange(F, dtype=jnp.int32), create,
        protection=3,
    )
    return ms, jnp.sum((idx >= 0).astype(jnp.int32))
