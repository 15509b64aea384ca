"""Relocalization: recover tracking after loss.

Replaces TrackPlaceRecognition (src/slam/tracking/TrackPlaceRecognition.cpp):
candidate keyframes from place-recognition scoring, per-candidate descriptor
matching against the keyframe's landmarks (>= 15), PnP-RANSAC + pose-only
LM refinement, then local-map re-matching to >= 50 inliers."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.frame import feature_inv_sigma2
from hyslam_tpu.core.mapstate import MapState, visible_scope
from hyslam_tpu.estimators.pnp import pnp_ransac_refined
from hyslam_tpu.features.matcher import match_descriptors
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.slam.strategies import track_local_map
from hyslam_tpu.slam.tracking_params import PlaceRecognitionParams

# back-compat aliases; live values come from PlaceRecognitionParams
MIN_RELOC_INLIERS = 50   # final acceptance (TrackPlaceRecognition)
MIN_BOW_MATCHES = 15
MIN_PNP_INLIERS = 10


def rank_candidates(frame_desc, frame_valid, ms: MapState, n_candidates=5,
                    recognizer=None):
    """Candidate keyframes: via the BoW PlaceRecognizer when available,
    else dense descriptor-set similarity (equivalent criteria)."""
    if recognizer is not None:
        covis = np.asarray(ms.covis)
        return recognizer.detect_relocalization_candidates(
            frame_desc, frame_valid, covis, n_max=n_candidates)
    from hyslam_tpu.ops.hamming import hamming_matrix

    kf_ok, _ = visible_scope(ms)
    scores = np.zeros(ms.K, np.float32)
    for k in np.nonzero(np.asarray(kf_ok))[0]:
        d = hamming_matrix(frame_desc, ms.kf.desc[k])
        dm = jnp.where(
            frame_valid[:, None] & ms.kf.kp_valid[k][None, :], d, 1 << 16
        )
        best = jnp.min(dm, axis=1)
        scores[k] = float(jnp.mean((best < 50) & frame_valid))
    order = np.argsort(-scores)
    return [int(k) for k in order[:n_candidates] if scores[k] > 0.05]


def try_relocalize(cam: Camera, feats, ms: MapState, recognizer=None,
                   n_levels: int = 8, scale_factor: float = 1.2,
                   p: PlaceRecognitionParams = PlaceRecognitionParams()):
    """Returns (ok, Tcw, lm_id, n_inliers). Staged thresholds come from the
    per-camera PlaceRecognition parameter set
    (slam_tracking_config.yaml Strategies/PlaceRecognition_*)."""
    cands = rank_candidates(feats.desc, feats.valid, ms,
                            n_candidates=p.n_candidates,
                            recognizer=recognizer)
    F = ms.F
    for k in cands:
        kf_lm = M.resolve_landmarks(ms, ms.kf.lm_id[k])
        idx, n = match_descriptors(
            feats.desc, feats.valid, feats.angle,
            ms.kf.desc[k], ms.kf.kp_valid[k] & (kf_lm >= 0), ms.kf.angle[k],
            max_dist=p.max_descriptor_dist, ratio=p.match_nnratio_1,
        )
        if int(n) < p.n_min_matches_bow:
            continue
        lm = jnp.where(idx >= 0, kf_lm[jnp.clip(idx, 0, F - 1)], -1)
        pair_ok = lm >= 0
        X = ms.lm.pos[jnp.clip(lm, 0, ms.L - 1)]
        inv_s2 = feature_inv_sigma2(feats.level, n_levels, scale_factor)
        T, inl, n_pnp = pnp_ransac_refined(
            cam, X, feats.uv, inv_s2, pair_ok, jax.random.PRNGKey(k),
        )
        if int(n_pnp) < p.n_min_matches_pnp:
            continue
        lm_init = jnp.where(inl, lm, -1)
        lres = track_local_map(cam, feats, T, lm_init, ms)
        if int(lres.track.n_inliers) >= p.n_min_matches_success:
            return (True, lres.track.Tcw, lres.track.lm_id,
                    int(lres.track.n_inliers))
    return False, None, None, 0
