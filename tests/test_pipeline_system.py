"""SystemPipeline: the reference's thread topology as the production driver
(System(config.pipelined=True)) — caller thread does extraction, a tracking
thread runs the state machine, a mapping thread runs keyframe jobs + loop
closing on map snapshots (SURVEY.md §1, System.cc:124-159).

Validates pipelined-vs-synchronous equivalence on the same sequence and the
keyframe-chain synchronization (mapper drain before insertion)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.io.config import CameraConfig, SystemConfig
from hyslam_tpu.io.evaluate import ate_rmse
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.geometry import se3
from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams
from hyslam_tpu.slam.system import System
from hyslam_tpu.slam.tracker import State

from helpers import DEFAULT_CAM, make_world, synth_frame_features


def make_system(pipelined: bool) -> System:
    cc = CameraConfig(
        fx=DEFAULT_CAM.fx, fy=DEFAULT_CAM.fy, cx=DEFAULT_CAM.cx,
        cy=DEFAULT_CAM.cy, width=DEFAULT_CAM.width,
        height=DEFAULT_CAM.height, bf=DEFAULT_CAM.bf,
        extractor=ExtractorConfig(n_features=300, n_levels=4),
        policy=KeyFramePolicyParams(max_kf_interval=8),
    )
    return System(SystemConfig(
        cameras={"SLAM": cc}, caps=MapCaps(K=64, L=8192, F=512, O=8),
        enable_loop_closing=False, pipelined=pipelined,
    ))


def drive(sys, rng, n_frames=22, step=0.12):
    cam = DEFAULT_CAM
    pts = make_world(rng, 1500, extent=(10.0, 7.0, 60.0), z_min=2.0)
    descs = rng.integers(0, 2**32, (len(pts), 8), dtype=np.uint32)
    T = np.eye(4, dtype=np.float32)
    Ts = []
    for i in range(n_frames):
        Ts.append(T.copy())
        feats, _ = synth_frame_features(cam, T, pts, descs, rng, F=512)
        sys.track_features(feats, timestamp=0.1 * i, frame_id=i)
        delta = np.asarray(se3.exp(jnp.asarray(
            [0, 0.004, 0, 0, 0, -step], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)
    sys.flush()
    return np.stack(Ts)


class TestSystemPipeline:
    def test_pipelined_tracks_sequence(self):
        rng = np.random.default_rng(3)
        sysm = make_system(pipelined=True)
        Ts = drive(sysm, rng)
        tracker = sysm.trackers["SLAM"]
        assert tracker.state in (State.NORMAL, State.POSTINIT)
        n = int(tracker.traj.size)
        assert n >= len(Ts) - 1
        tels = sysm._pipe.telemetry
        assert len(tels) == len(Ts)
        # every post-init keyframe was integrated by the mapping thread
        # (the init KF is seeded directly, no mapper pass)
        kf_tels = [t for t in tels if t.kf_inserted >= 0 and t.mapper_stats]
        assert len(kf_tels) >= 2
        assert all(t.mapper_stats.get("deferred") for t in kf_tels)
        sysm.shutdown()

    def test_matches_synchronous(self):
        """Same sequence, pipelined vs synchronous: same keyframe count and
        equivalent trajectory (the mapper adoption boundary may shift local
        BA by one frame, so equality is geometric, not bitwise)."""
        rng_a = np.random.default_rng(7)
        rng_b = np.random.default_rng(7)
        sys_s = make_system(pipelined=False)
        sys_p = make_system(pipelined=True)
        Ts = drive(sys_s, rng_a)
        drive(sys_p, rng_b)
        tr_s, tr_p = sys_s.trackers["SLAM"], sys_p.trackers["SLAM"]
        n_s = int(np.asarray(tr_s.ms.next_kf))
        n_p = int(np.asarray(tr_p.ms.next_kf))
        assert abs(n_s - n_p) <= 1, (n_s, n_p)
        ns, npp = int(tr_s.traj.size), int(tr_p.traj.size)
        n = min(ns, npp)
        est_s = np.asarray(tr_s.traj.Tcw[:n])
        est_p = np.asarray(tr_p.traj.Tcw[:n])
        assert ate_rmse(est_p, est_s) < 0.02
        gt = Ts[:n]
        assert ate_rmse(est_p, gt) < 0.05
        sys_p.shutdown()

    def test_shutdown_joins_and_refuses_input(self):
        rng = np.random.default_rng(5)
        sysm = make_system(pipelined=True)
        drive(sysm, rng, n_frames=10)
        sysm.shutdown()
        with pytest.raises(RuntimeError):
            sysm.track_features(None, 0.0)
        # reset restores a working pipeline
        sysm.reset()
        assert sysm._pipe is not None
        drive(sysm, np.random.default_rng(6), n_frames=10)
        assert sysm.trackers["SLAM"].state in (State.NORMAL, State.POSTINIT)
        sysm.shutdown()
