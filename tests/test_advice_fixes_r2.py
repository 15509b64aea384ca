"""Regressions for the round-2 advisor findings (ADVICE.md r2):

1. CameraConfig stores native-resolution calibration; camera() scales
   fx/fy/cx/cy/bf/width/height by `scale` (Camera.cpp:54-90), so reference
   YAML values port verbatim.
2. Per-observation information weights honor the configured pyramid model
   (n_levels / scale_factor), not a hardcoded 8-level x1.2 table.
3. A lost NORMAL frame (initial pose estimation failed) reports zeroed
   local-map counters in telemetry instead of the failed-pose refine counts.
"""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core.frame import feature_inv_sigma2, level_inv_sigma2
from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.io.config import CameraConfig
from hyslam_tpu.slam.tracker import State, Tracker

from helpers import DEFAULT_CAM, make_world, synth_frame_features


class TestCameraScale:
    def test_calibration_scaled_to_working_resolution(self):
        # the reference Imaging camera: native 2704x2028, scale 0.5
        cc = CameraConfig(name="Imaging", fx=1829.0, fy=1829.0,
                          cx=1352.0, cy=1014.0, width=2704, height=2028,
                          bf=0.0, scale=0.5, mono=True)
        cam = cc.camera()
        assert cam.fx == 914.5 and cam.fy == 914.5
        assert cam.cx == 676.0 and cam.cy == 507.0
        assert cam.width == 1352 and cam.height == 1014
        # sanity: principal point lands near the working-image center
        assert abs(cam.cx - cam.width / 2) < cam.width * 0.1

    def test_bf_scales_with_fx(self):
        cc = CameraConfig(fx=900.0, cx=640.0, cy=360.0, width=1280,
                          height=720, bf=108.0, scale=0.5)
        cam = cc.camera()
        assert cam.bf == 54.0
        # baseline (bf/fx) is scale-invariant
        assert abs(cam.baseline - 108.0 / 900.0) < 1e-9

    def test_scale_one_is_identity(self):
        cc = CameraConfig(fx=450.0, cx=320.0, cy=240.0, width=640,
                          height=480, bf=45.0)
        cam = cc.camera()
        assert (cam.fx, cam.cx, cam.width, cam.bf) == (450.0, 320.0, 640, 45.0)


class TestSigma2Model:
    def test_feature_inv_sigma2_uses_configured_pyramid(self):
        lvl = jnp.asarray([0, 5, 9, 11], jnp.int32)
        w = np.asarray(feature_inv_sigma2(lvl, n_levels=10, scale=1.4))
        expect = 1.0 / (1.4 ** (2 * np.asarray([0, 5, 9, 9])))
        np.testing.assert_allclose(w, expect, rtol=1e-5)
        # and differs from the 8-level x1.2 default table
        w8 = np.asarray(level_inv_sigma2())
        assert abs(w[1] - w8[5]) > 1e-6

    def test_strategies_accept_pyramid_params(self, rng):
        pts = make_world(rng, 800, extent=(10.0, 7.0, 60.0))
        descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
        tr = Tracker(cam=DEFAULT_CAM, caps=MapCaps(K=32, L=4096, F=256, O=8),
                     n_levels=10, scale_factor=1.4)
        T = np.eye(4, dtype=np.float32)
        feats, _ = synth_frame_features(DEFAULT_CAM, T, pts, descs, rng, F=256)
        tr.track(feats, 0.0, 0)
        T2 = np.eye(4, dtype=np.float32)
        T2[2, 3] = -0.1
        feats2, _ = synth_frame_features(DEFAULT_CAM, T2, pts, descs, rng,
                                         F=256)
        tel = tr.track(feats2, 0.1, 1)
        assert tr.state in (State.POSTINIT, State.NORMAL)
        assert tel.n_inliers > 30


class TestLostFrameTelemetry:
    def test_counters_zeroed_on_failed_init(self, rng):
        pts = make_world(rng, 800, extent=(10.0, 7.0, 60.0))
        descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
        tr = Tracker(cam=DEFAULT_CAM, caps=MapCaps(K=32, L=4096, F=256, O=8))
        T = np.eye(4, dtype=np.float32)
        feats, _ = synth_frame_features(DEFAULT_CAM, T, pts, descs, rng, F=256)
        tr.track(feats, 0.0, 0)
        assert tr.state == State.POSTINIT

        # a frame of unrelated geometry + descriptors: both the motion model
        # and the reference-KF fallback must fail
        pts_bad = make_world(rng, 800, extent=(10.0, 7.0, 60.0)) + 500.0
        descs_bad = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
        feats_bad, _ = synth_frame_features(
            DEFAULT_CAM, T, pts_bad, descs_bad, rng, F=256)
        tel = tr.track(feats_bad, 0.1, 1)
        assert tr.state in (State.REINITIALIZE, State.RELOCALIZE)
        # the staged code never ran TrackLocalMap on this path
        assert tel.n_inliers == 0
        assert tel.n_local == 0
