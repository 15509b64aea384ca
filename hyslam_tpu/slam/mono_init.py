"""Monocular two-frame initializer (MonoInitializer + MonoEstimator analog).

Replaces src/initializers/MonoInitializer.cpp + MonoEstimator.{h,cc}
(parallel homography-vs-fundamental RANSAC scoring, model selection, motion
recovery, two-view triangulation — the ORB-SLAM2 scheme) as batched
hypothesis evaluation. Implemented in hyslam_tpu.estimators.two_view;
this module adapts it to the MapState protocol."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.features.matcher import match_descriptors
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera

MIN_MATCHES = 100  # reference requires 100 matches to attempt init


class MonoInitializer:
    """Two-frame protocol: hold a reference frame, try each new frame; on
    success create two keyframes + triangulated landmarks with median-depth
    scale normalization (TrackingStateInitialize.cpp:86-135)."""

    def __init__(self, cam: Camera):
        self.cam = cam
        self.ref: FrameFeatures | None = None
        self.ref_ts = 0.0
        self.ref_frame_id = -1

    def feed(self, ms, feats, timestamp, frame_id, cam_id):
        from hyslam_tpu.estimators.two_view import two_view_reconstruct

        if self.ref is None:
            self.ref = feats
            self.ref_ts = timestamp
            self.ref_frame_id = frame_id
            return False, ms, []

        idx, n = match_descriptors(
            self.ref.desc, self.ref.valid, self.ref.angle,
            feats.desc, feats.valid, feats.angle,
            max_dist=50, ratio=0.9,
        )
        if int(n) < MIN_MATCHES:
            self.ref = feats  # slide the reference forward like the reference
            self.ref_ts = timestamp
            self.ref_frame_id = frame_id
            return False, ms, []

        ok, T21, X, inliers = two_view_reconstruct(
            self.cam, self.ref.uv, feats.uv, idx
        )
        if not ok:
            return False, ms, []

        # median-depth normalization (mono scale gauge)
        z = np.asarray(X)[np.asarray(inliers)][:, 2]
        med = float(np.median(z[z > 0])) if (z > 0).any() else 1.0
        scale = 1.0 / max(med, 1e-6)
        X = X * scale
        T21 = np.asarray(T21).copy()
        T21[:3, 3] *= scale

        F = feats.capacity
        ms, kf0 = M.add_keyframe(
            ms, self.ref, se3.identity(), self.ref_ts, self.ref_frame_id,
            cam_id, jnp.full((F,), -1, jnp.int32), origin=True,
        )
        ms, lm_idx = M.add_landmarks(
            ms, jnp.asarray(X), self.ref.desc, kf0,
            jnp.arange(F, dtype=jnp.int32), jnp.asarray(inliers), protection=5,
        )
        assoc2 = jnp.where(
            jnp.asarray(inliers), lm_idx, -1
        )
        # map ref-frame slots to current-frame slots through idx
        assoc_cur = jnp.full((F,), -1, jnp.int32)
        src_ok = np.asarray(inliers) & (np.asarray(idx) >= 0)
        assoc_cur = assoc_cur.at[
            jnp.where(jnp.asarray(src_ok), jnp.clip(idx, 0, F - 1), F)
        ].set(lm_idx, mode="drop")
        ms, kf1 = M.add_keyframe(
            ms, feats, jnp.asarray(T21), timestamp, frame_id, cam_id, assoc_cur,
        )
        ms = M.refresh_covisibility(ms)
        ms = M.update_landmark_stats(ms)
        self.ref = None
        return True, ms, [int(kf0), int(kf1)]
