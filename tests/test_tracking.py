"""End-to-end tracking tests at the feature level (no images): a synthetic
stereo world drives the full Tracker state machine — init, motion-model +
local-map tracking, keyframe policy, mapper jobs, trajectory — with ground
truth ATE evaluation (SURVEY.md §4 golden-trajectory strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.core import trajectory as TJ
from hyslam_tpu.geometry import se3
from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams
from hyslam_tpu.slam.tracker import State, Tracker

from helpers import DEFAULT_CAM, make_world, synth_frame_features, pose_error


def run_sequence(rng, n_frames=40, step=0.12, yaw_rate=0.004, reset_interval=0,
                 n_pts=1500):
    cam = DEFAULT_CAM
    # long corridor of points so new ones appear as the camera advances
    pts = np.concatenate(
        [
            make_world(rng, n_pts, extent=(10.0, 7.0, 60.0), z_min=2.0),
        ]
    )
    descs = rng.integers(0, 2**32, (len(pts), 8), dtype=np.uint32)

    Ts = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        Ts.append(T.copy())
        delta = np.asarray(
            se3.exp(jnp.asarray([0, yaw_rate, 0, 0, 0, -step], dtype=jnp.float32))
        )
        T = (delta @ T).astype(np.float32)

    tracker = Tracker(
        cam=cam, caps=MapCaps(K=64, L=8192, F=512, O=8),
        reset_interval=reset_interval,
        # reference's max_KF_interval=60 is frames at its 60 fps camera (1 s);
        # this synthetic sequence runs at 10 fps
        policy=KeyFramePolicyParams(max_kf_interval=10),
    )
    for i in range(n_frames):
        feats, _ = synth_frame_features(cam, Ts[i], pts, descs, rng, F=512)
        tracker.track(feats, timestamp=0.1 * i, frame_id=i)
    return tracker, np.stack(Ts)


class TestStereoTracking:
    def test_full_sequence(self, rng):
        tracker, Ts = run_sequence(rng)
        assert tracker.state == State.NORMAL
        # evaluate ATE over the trajectory
        traj = tracker.traj
        n = int(traj.size)
        assert n == len(Ts)
        est = np.asarray(traj.Tcw[:n])
        errs = [pose_error(est[i], Ts[i])[1] for i in range(n)]
        ate = np.sqrt(np.mean(np.square(errs)))
        assert ate < 0.05, f"ATE {ate}"
        # keyframes inserted and map grown
        n_kf = int(np.asarray(tracker.ms.next_kf))
        assert n_kf >= 3
        n_lm = int(np.asarray(tracker.ms.next_lm))
        assert n_lm > 200

    def test_triangulation_extends_map(self, rng):
        tracker, _ = run_sequence(rng, n_frames=30)
        tel = tracker.telemetry
        kf_frames = [t for t in tel if t.kf_inserted >= 0]
        assert len(kf_frames) >= 2
        # inliers should stay healthy
        normal = [t.n_inliers for t in tel if t.state == "NORMAL" and t.n_inliers]
        assert np.mean(normal) > 100

    def test_forced_loss_reinitializes_submap(self, rng):
        # losses fire at frames 15 and 30; 35 frames leaves room to recover
        tracker, Ts = run_sequence(rng, n_frames=35, reset_interval=15)
        # fault injection forced a loss -> REINITIALIZE created a submap
        n_maps = int(np.asarray(tracker.ms.maps.n_maps))
        assert n_maps >= 2
        reg = np.asarray(tracker.ms.maps.registered)
        assert reg[1:n_maps].all()  # reinit submaps register with parent
        assert tracker.state in (State.NORMAL, State.POSTINIT)
        # trajectory still covers the whole run
        assert int(tracker.traj.size) >= 28

    def test_trajectory_reanchoring(self, rng):
        tracker, Ts = run_sequence(rng, n_frames=25)
        traj = TJ.refresh(
            tracker.traj, tracker.ms.kf.Tcw, tracker.ms.kf.bad,
            tracker.ms.kf.span_parent,
        )
        n = int(traj.size)
        est = np.asarray(traj.Tcw[:n])
        errs = [pose_error(est[i], Ts[i])[1] for i in range(n)]
        assert np.sqrt(np.mean(np.square(errs))) < 0.05
