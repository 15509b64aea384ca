"""Telemetry subsystem: TSV logs with the reference's schemas
(Tracking.cpp:51-55, Mapping.cpp:46-48), stage timers, System wiring."""

import os

import numpy as np
import pytest

from hyslam_tpu.utils.telemetry import (
    MAPPING_COLUMNS, TRACKING_COLUMNS, MappingLog, StageTimer, TrackingLog,
)


class TestLogs:
    def test_tracking_log_rows(self, tmp_path):
        from hyslam_tpu.slam.tracker import TrackerTelemetry

        p = str(tmp_path / "tracking_data.txt")
        log = TrackingLog(p)
        log.log("SLAM", TrackerTelemetry(frame_id=3, state="NORMAL",
                                         n_motion=80, n_inliers=120,
                                         n_local=300, kf_inserted=2),
                timestamp=0.3, n_kfs=3, n_landmarks=500)
        log.close()
        lines = open(p).read().strip().split("\n")
        assert lines[0].split("\t") == TRACKING_COLUMNS
        row = dict(zip(TRACKING_COLUMNS, lines[1].split("\t")))
        assert row["camera"] == "SLAM" and row["n_inliers"] == "120"
        assert row["kf_inserted"] == "2" and row["n_kfs"] == "3"

    def test_mapping_log_rows(self, tmp_path):
        p = str(tmp_path / "localmapping_data.txt")
        log = MappingLog(p)
        log.log("SLAM", 4, {"triangulated": 55, "fused": 7,
                            "ba_cost": 12.5, "kf_culled": 1})
        log.close()
        lines = open(p).read().strip().split("\n")
        assert lines[0].split("\t") == MAPPING_COLUMNS
        row = dict(zip(MAPPING_COLUMNS, lines[1].split("\t")))
        assert row["triangulated"] == "55" and row["kf_culled"] == "1"
        assert row["culled"] == ""  # absent counters stay empty

    def test_stage_timer(self):
        t = StageTimer()
        with t.span("extract"):
            pass
        with t.span("extract"):
            pass
        with t.span("track"):
            pass
        assert t.counts["extract"] == 2
        assert "extract" in t.report() and "track" in t.report()
        assert t.mean_ms("extract") >= 0.0


class TestSystemWiring:
    def test_system_writes_logs(self, tmp_path):
        import sys
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import DEFAULT_CAM, make_world, synth_frame_features

        from hyslam_tpu.core.mapstate import MapCaps
        from hyslam_tpu.io.config import CameraConfig, SystemConfig
        from hyslam_tpu.slam.system import System

        rng = np.random.default_rng(0)
        pts = make_world(rng, 600, extent=(10.0, 7.0, 40.0))
        descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)

        d = str(tmp_path / "run_data")
        cfg = SystemConfig(caps=MapCaps(K=32, L=4096, F=256, O=8),
                           enable_loop_closing=False, run_data_dir=d)
        cfg.cameras["SLAM"] = CameraConfig(bf=45.0)  # stereo baseline
        sysm = System(cfg)
        cam = sysm.cameras["SLAM"]

        T = np.eye(4, dtype=np.float32)
        for i in range(6):
            T2 = T.copy()
            T2[2, 3] = -0.1 * i
            feats, _ = synth_frame_features(cam, T2, pts, descs, rng, F=256)
            sysm.track_features(feats, timestamp=0.1 * i)
        sysm.shutdown()

        tlog = open(os.path.join(d, "tracking_data.txt")).read().strip()
        assert len(tlog.split("\n")) == 7  # header + 6 frames
        mlog = open(os.path.join(d, "localmapping_data.txt")).read().strip()
        assert len(mlog.split("\n")) >= 2  # header + at least one KF row
