"""Relocalization: after building a map by tracking, a frame with no pose
prior is recovered via candidate ranking + PnP-RANSAC + local-map
refinement."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.slam.relocalization import try_relocalize

from helpers import DEFAULT_CAM, pose_error, synth_frame_features
from test_tracking import run_sequence


class TestRelocalization:
    def test_recovers_midmap_pose(self, rng):
        tracker, Ts = run_sequence(rng, n_frames=25)
        ms = tracker.ms
        # a "lost" frame at a mid-sequence pose (new noise / new shuffle)
        pts = None
        # regenerate observations of the same world the sequence used
        rng2 = np.random.default_rng(123)
        # reuse the exact world from run_sequence by re-deriving it
        # (run_sequence consumed rng; easiest is to query the map itself:
        # relocalize against an existing keyframe's own pose)
        k = int(np.asarray(ms.next_kf)) // 2
        T_query = np.asarray(ms.kf.Tcw[k])
        # build query features from the map's landmarks as seen from T_query
        lm_ok = np.asarray(ms.lm.valid & ~ms.lm.bad)
        X = np.asarray(ms.lm.pos)[lm_ok]
        desc = np.asarray(ms.lm.desc)[lm_ok]
        feats, _ = synth_frame_features(
            DEFAULT_CAM, T_query, X.astype(np.float32), desc, rng2, F=512,
        )
        ok, Tcw, lm_id, n = try_relocalize(DEFAULT_CAM, feats, ms)
        assert ok, "relocalization failed"
        rot, tr = pose_error(np.asarray(Tcw), T_query)
        assert rot < 0.5 and tr < 0.05, (rot, tr)
        assert n >= 50
