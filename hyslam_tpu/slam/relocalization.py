"""Relocalization: recover tracking after loss.

Replaces TrackPlaceRecognition (src/slam/tracking/TrackPlaceRecognition.cpp):
the reference retrieves candidate keyframes via the DBoW2 inverted index,
runs EPnP-RANSAC per candidate, then staged re-matching to >= 50 inliers.

Current implementation scores candidates by global descriptor-set similarity
(dense Hamming — the BoW index is a CPU-pruning structure; at arena scale the
dense path is faster on TPU), then per-candidate: descriptor match against
the keyframe's landmarks -> pose optimization seeded from the candidate's
pose (upgraded to batched EPnP-RANSAC by hyslam_tpu.estimators.pnp when
the candidate pose is stale)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState, visible_scope
from hyslam_tpu.features.matcher import match_descriptors
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.slam.strategies import track_reference_keyframe, track_local_map

MIN_RELOC_INLIERS = 50  # reference's final acceptance threshold


def rank_candidates(frame_desc, frame_valid, ms: MapState, n_candidates=5):
    """Rank keyframes by fraction of frame descriptors with a close match
    in the KF (place-recognition scoring stand-in; see features/bow.py for
    the BoW scorer used once vocabularies are trained)."""
    from hyslam_tpu.ops.hamming import hamming_matrix

    kf_ok, _ = visible_scope(ms)
    K = ms.K
    scores = np.zeros(K, np.float32)
    d_frame = frame_desc
    kf_ids = np.nonzero(np.asarray(kf_ok))[0]
    for k in kf_ids:
        d = hamming_matrix(d_frame, ms.kf.desc[k])
        dm = jnp.where(
            frame_valid[:, None] & ms.kf.kp_valid[k][None, :], d, 1 << 16
        )
        best = jnp.min(dm, axis=1)
        scores[k] = float(jnp.mean((best < 50) & frame_valid))
    order = np.argsort(-scores)
    return [int(k) for k in order[:n_candidates] if scores[k] > 0.05]


def try_relocalize(cam: Camera, feats, ms: MapState):
    """Returns (ok, Tcw, lm_id, n_inliers)."""
    cands = rank_candidates(feats.desc, feats.valid, ms)
    for k in cands:
        res = track_reference_keyframe(
            cam, feats, ms.kf.Tcw[k], ms, k, min_inliers=15
        )
        if not bool(res.ok):
            continue
        lres = track_local_map(cam, feats, res.Tcw, res.lm_id, ms)
        if int(lres.track.n_inliers) >= MIN_RELOC_INLIERS:
            return True, lres.track.Tcw, lres.track.lm_id, int(lres.track.n_inliers)
    return False, None, None, 0
