"""Map initializers.

Replaces src/initializers: StereoInitializer (single-frame init from stereo
depth, StereoInitializer.cpp:10-117) here; the monocular H/F-model
initializer lives in slam/mono_init.py. Both follow the reference's
initialize -> createMap -> transformMap(SE3) -> addToMap protocol
(Initializer.h:41) as pure MapState transformations.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera

MIN_STEREO_POINTS = 50  # minimum valid-depth features to initialize


def stereo_initialize(
    ms: MapState,
    feats: FrameFeatures,
    cam: Camera,
    timestamp: float,
    frame_id: int,
    cam_id: int = 0,
    Tcw0: jnp.ndarray | None = None,
):
    """Initialize (or re-initialize) a map from one stereo frame: keyframe at
    Tcw0 (default origin), landmarks for every valid-depth feature, all
    protected from culling (StereoInitializer::initialize + createMap).

    Returns (ms, kf_id, n_landmarks) or (ms, -1, 0) if not enough depth."""
    n_depth = int(np.asarray(jnp.sum((feats.depth > 0) & feats.valid)))
    if n_depth < MIN_STEREO_POINTS:
        return ms, -1, 0
    if Tcw0 is None:
        Tcw0 = se3.identity()
    F = feats.capacity
    ms, kf_id = M.add_keyframe(
        ms, feats, Tcw0, timestamp, frame_id, cam_id,
        jnp.full((F,), -1, jnp.int32), origin=True,
    )
    create = feats.valid & (feats.depth > 0)
    X = se3.apply(
        se3.inverse(Tcw0),
        jnp.stack(
            [
                (feats.uv[:, 0] - cam.cx) / cam.fx * feats.depth,
                (feats.uv[:, 1] - cam.cy) / cam.fy * feats.depth,
                feats.depth,
            ],
            axis=-1,
        ),
    )
    ms, idx = M.add_landmarks(
        ms, X, feats.desc, kf_id, jnp.arange(F, dtype=jnp.int32), create,
        protection=5,
    )
    ms = M.refresh_covisibility(ms)
    ms = M.update_landmark_stats(ms)
    n = int(np.asarray(jnp.sum((idx >= 0).astype(jnp.int32))))
    return ms, int(np.asarray(kf_id)), n
