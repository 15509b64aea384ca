"""System-level tests: the public API end to end — feature-level sequences
through System, config loading, exports, checkpoint round-trip, and a small
IMAGE-level smoke run through the full extraction pipeline."""

import os

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.io.config import CameraConfig, SystemConfig, load_config
from hyslam_tpu.io.export import load_map_state, save_map_state
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.geometry import se3
from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams
from hyslam_tpu.slam.system import System
from hyslam_tpu.slam.tracker import State

from helpers import DEFAULT_CAM, make_world, render_world, synth_frame_features, pose_error


def small_system(loop=False, caps=None):
    cc = CameraConfig(
        fx=DEFAULT_CAM.fx, fy=DEFAULT_CAM.fy, cx=DEFAULT_CAM.cx,
        cy=DEFAULT_CAM.cy, width=DEFAULT_CAM.width, height=DEFAULT_CAM.height,
        bf=DEFAULT_CAM.bf,
        extractor=ExtractorConfig(n_features=300, n_levels=4),
        policy=KeyFramePolicyParams(max_kf_interval=10),
    )
    cfg = SystemConfig(
        cameras={"SLAM": cc},
        caps=caps or MapCaps(K=64, L=8192, F=512, O=8),
        enable_loop_closing=loop,
    )
    return System(cfg)


def run_feature_sequence(sys, rng, n_frames=25, step=0.12):
    cam = DEFAULT_CAM
    pts = make_world(rng, 1500, extent=(10.0, 7.0, 60.0), z_min=2.0)
    descs = rng.integers(0, 2**32, (len(pts), 8), dtype=np.uint32)
    T = np.eye(4, dtype=np.float32)
    Ts = []
    tels = []
    for i in range(n_frames):
        Ts.append(T.copy())
        feats, _ = synth_frame_features(cam, T, pts, descs, rng, F=512)
        tels.append(sys.track_features(feats, timestamp=0.1 * i, frame_id=i))
        delta = np.asarray(se3.exp(jnp.asarray(
            [0, 0.004, 0, 0, 0, -step], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)
    return np.stack(Ts), tels


class TestSystemAPI:
    def test_feature_sequence_tracks(self, rng, tmp_path):
        sys = small_system()
        Ts, tels = run_feature_sequence(sys, rng)
        tracker = sys.trackers["SLAM"]
        assert tracker.state == State.NORMAL
        n = int(tracker.traj.size)
        errs = [pose_error(np.asarray(tracker.traj.Tcw[i]), Ts[i])[1]
                for i in range(n)]
        assert np.sqrt(np.mean(np.square(errs))) < 0.06

        # exports
        p = tmp_path / "traj.tsv"
        sys.save_trajectory(str(p))
        lines = p.read_text().strip().split("\n")
        assert len(lines) == n
        assert len(lines[0].split("\t")) == 14  # name, t, 12 matrix entries

        sys.save_trajectory_tum(str(tmp_path / "traj_tum.txt"))
        tum = (tmp_path / "traj_tum.txt").read_text().strip().split("\n")
        assert len(tum[0].split()) == 8

        sys.export_colmap(str(tmp_path / "colmap") + "/")
        base = tmp_path / "colmap" / "SLAM"
        for fn in ("cameras.txt", "images.txt", "points3D.txt"):
            assert (base / fn).exists()

        sys.save_keyframes_agisoft(str(tmp_path / "agi.xml"))
        assert "<camera " in (tmp_path / "agi.xml").read_text()

        sys.save_map_points(str(tmp_path / "pts.tsv"))
        assert len((tmp_path / "pts.tsv").read_text().splitlines()) > 100

    def test_checkpoint_roundtrip(self, rng, tmp_path):
        sys = small_system()
        run_feature_sequence(sys, rng, n_frames=12)
        ms = sys.trackers["SLAM"].ms
        path = str(tmp_path / "map.npz")
        save_map_state(path, ms)
        ms2 = load_map_state(path)
        np.testing.assert_array_equal(np.asarray(ms.kf.Tcw), np.asarray(ms2.kf.Tcw))
        np.testing.assert_array_equal(np.asarray(ms.lm.pos), np.asarray(ms2.lm.pos))
        np.testing.assert_array_equal(
            np.asarray(ms.lm.obs_kf), np.asarray(ms2.lm.obs_kf))
        assert int(ms.next_kf) == int(ms2.next_kf)
        # a fresh system can resume from the checkpoint
        sys2 = small_system()
        sys2.load_map(path)
        assert int(sys2.trackers["SLAM"].ms.next_kf) == int(ms.next_kf)

    def test_trajectory_reanchored_on_export(self, rng, tmp_path):
        """Trajectory::updatePoses behavior: per-frame poses re-derive from
        their (re-optimized) reference keyframes when the trajectory is
        consumed (export / imaging placement / after GBA)."""
        import jax.numpy as jnp

        sys = small_system()
        run_feature_sequence(sys, rng, n_frames=12)
        tr = sys.trackers["SLAM"]
        n = int(tr.traj.size)
        before = np.asarray(tr.traj.Tcw[:n]).copy()
        # simulate an optimizer moving every keyframe by a fixed offset
        delta = np.eye(4, dtype=np.float32)
        delta[0, 3] = 0.5
        tr.ms = tr.ms._replace(kf=tr.ms.kf._replace(
            Tcw=jnp.einsum("ij,kjl->kil", jnp.asarray(delta), tr.ms.kf.Tcw)))
        sys.save_trajectory(str(tmp_path / "traj.tsv"))
        after = np.asarray(tr.traj.Tcw[:n])
        # every frame pose re-derives as Tcr @ (moved ref-KF pose)
        ref = np.asarray(tr.traj.ref_kf[:n])
        expected = np.einsum(
            "kij,kjl->kil", np.asarray(tr.traj.Tcr[:n]),
            np.asarray(tr.ms.kf.Tcw)[ref])
        np.testing.assert_allclose(after, expected, atol=1e-5)
        assert not np.allclose(after, before, atol=1e-3)

    def test_config_yaml_roundtrip(self, tmp_path):
        cfg = load_config("config/sample_config.yaml")
        assert "SLAM" in cfg.cameras
        assert cfg.cameras["SLAM"].extractor.n_features == 1000
        assert cfg.caps.K == 256
        assert cfg.mapper.kf_grace_period == 3

    def test_shutdown_and_reset(self, rng):
        sys = small_system()
        run_feature_sequence(sys, rng, n_frames=8)
        sys.shutdown()
        import pytest
        with pytest.raises(RuntimeError):
            sys.track_features(None, 0.0)
        sys.reset()
        assert sys.trackers["SLAM"].state == State.INITIALIZE


class TestSystemImages:
    def test_image_pipeline_smoke(self, rng):
        """Small real-image run: render stereo pairs, full extract+stereo
        +track through System.track_stereo."""
        cam = DEFAULT_CAM
        cc = CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, bf=cam.bf,
            extractor=ExtractorConfig(n_features=400, n_levels=4),
            policy=KeyFramePolicyParams(max_kf_interval=5,
                                        n_tracked_target=80,
                                        n_tracked_variance=20),
        )
        sys = System(SystemConfig(
            cameras={"SLAM": cc}, caps=MapCaps(K=32, L=8192, F=512, O=8),
            enable_loop_closing=False,
        ))
        pts = make_world(rng, 900, extent=(12.0, 8.0, 40.0), z_min=2.5)
        T = np.eye(4, dtype=np.float32)
        T_r_off = np.asarray(se3.from_Rt(
            jnp.eye(3), jnp.asarray([-cam.baseline, 0.0, 0.0])))
        Ts = []
        for i in range(8):
            Ts.append(T.copy())
            img_l, _, _ = render_world(cam, T, pts)
            img_r, _, _ = render_world(cam, (T_r_off @ T).astype(np.float32), pts)
            sys.track_stereo(img_l, img_r, timestamp=0.2 * i, frame_id=i)
            delta = np.asarray(se3.exp(jnp.asarray(
                [0, 0, 0, 0, 0, -0.1], dtype=jnp.float32)))
            T = (delta @ T).astype(np.float32)
        tracker = sys.trackers["SLAM"]
        assert tracker.state in (State.NORMAL, State.POSTINIT)
        n = int(tracker.traj.size)
        assert n >= 7
        errs = [pose_error(np.asarray(tracker.traj.Tcw[i]), Ts[i])[1]
                for i in range(n)]
        assert np.median(errs) < 0.08, errs


class TestImagingPlacerHook:
    def test_place_imaging_frame(self):
        """System::placeImagingFrame analog: keep decision rides the SLAM
        trajectory; before any SLAM tracking there is nothing to place."""
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import DEFAULT_CAM, make_world, synth_frame_features

        from hyslam_tpu.core.mapstate import MapCaps
        from hyslam_tpu.io.config import CameraConfig, SystemConfig
        from hyslam_tpu.slam.system import System

        rng = np.random.default_rng(0)
        pts = make_world(rng, 600, extent=(10.0, 7.0, 40.0))
        descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)
        cfg = SystemConfig(caps=MapCaps(K=32, L=4096, F=256, O=8),
                           enable_loop_closing=False)
        cfg.cameras["SLAM"] = CameraConfig(bf=45.0)
        cfg.cameras["Imaging"] = CameraConfig(mono=True)
        sysm = System(cfg)
        cam = sysm.cameras["SLAM"]

        keep0, _ = sysm.place_imaging_frame(0.0)
        assert keep0 is False  # no trajectory yet

        T = np.eye(4, dtype=np.float32)
        for i in range(6):
            T2 = T.copy()
            T2[2, 3] = -0.1 * i
            feats, _ = synth_frame_features(cam, T2, pts, descs, rng, F=256)
            sysm.track_features(feats, timestamp=0.1 * i)

        keep, Tcw = sysm.place_imaging_frame(0.25)
        assert keep in (True, False)
        assert np.asarray(Tcw).shape == (4, 4)
        # first retainable frame with map landmarks visible is kept
        assert keep is True

        sysm.set_imaging_frame_placer_params(0.5, 10**6)
        keep2, _ = sysm.place_imaging_frame(0.3)
        assert keep2 is False  # min-visible made impossible


class TestStateCoupling:
    def test_imaging_forced_null_while_slam_lost(self):
        """TrackingStateTransitionReinit.cpp:101-119: accessory cameras are
        NULL while SLAM is lost and re-initialize when it recovers."""
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import make_world, synth_frame_features

        from hyslam_tpu.core.mapstate import MapCaps
        from hyslam_tpu.io.config import CameraConfig, SystemConfig
        from hyslam_tpu.slam.system import System
        from hyslam_tpu.slam.tracker import State

        rng = np.random.default_rng(0)
        pts = make_world(rng, 800, extent=(10.0, 7.0, 60.0))
        descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
        cfg = SystemConfig(caps=MapCaps(K=32, L=4096, F=256, O=8),
                           enable_loop_closing=False)
        cfg.cameras["SLAM"] = CameraConfig(bf=45.0)
        cfg.cameras["Imaging"] = CameraConfig(mono=True)
        sysm = System(cfg)
        sysm.trackers["SLAM"].reset_interval = 6   # force a loss
        cam = sysm.cameras["SLAM"]

        T = np.eye(4, dtype=np.float32)
        states = []
        for i in range(10):
            T2 = T.copy()
            T2[2, 3] = -0.1 * i
            feats, _ = synth_frame_features(cam, T2, pts, descs, rng, F=256)
            sysm.track_features(feats, timestamp=0.1 * i)
            states.append((sysm.trackers["SLAM"].state,
                           sysm.trackers["Imaging"].state))

        # while SLAM was lost (forced at frame index 5), Imaging was NULL
        lost_idx = [i for i, (s, _) in enumerate(states)
                    if s == State.REINITIALIZE]
        assert lost_idx, f"no forced loss observed: {states}"
        assert states[lost_idx[0]][1] == State.NULL
        # after recovery the imaging camera returns to INITIALIZE
        s_final, i_final = states[-1]
        assert s_final in (State.NORMAL, State.POSTINIT)
        assert i_final == State.INITIALIZE


class TestCheckpointResume:
    def test_save_load_resume_tracking(self, tmp_path):
        """Full checkpoint: a restored System continues tracking seamlessly
        (resume support the reference never implemented)."""
        import numpy as np
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import make_world, synth_frame_features

        from hyslam_tpu.core.mapstate import MapCaps
        from hyslam_tpu.io.config import CameraConfig, SystemConfig
        from hyslam_tpu.slam.system import System

        rng = np.random.default_rng(0)
        pts = make_world(rng, 800, extent=(10.0, 7.0, 60.0))
        descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)

        def mk():
            cfg = SystemConfig(caps=MapCaps(K=32, L=4096, F=256, O=8),
                               enable_loop_closing=False)
            cfg.cameras["SLAM"] = CameraConfig(bf=45.0)
            return System(cfg)

        s1 = mk()
        cam = s1.cameras["SLAM"]
        T = np.eye(4, dtype=np.float32)
        frames = []
        for i in range(10):
            T2 = T.copy()
            T2[2, 3] = -0.1 * i
            feats, _ = synth_frame_features(cam, T2, pts, descs, rng, F=256)
            frames.append((feats, 0.1 * i))
        for feats, t in frames[:6]:
            s1.track_features(feats, timestamp=t)
        p = str(tmp_path / "ckpt.npz")
        s1.save_checkpoint(p)

        # restore into a FRESH system and keep tracking the same stream
        s2 = mk()
        s2.load_checkpoint(p)
        s2._frame_counter = 6
        tr1, tr2 = s1.trackers["SLAM"], s2.trackers["SLAM"]
        assert tr2.state == tr1.state
        assert int(np.asarray(tr2.ms.next_kf)) == int(np.asarray(tr1.ms.next_kf))
        for feats, t in frames[6:]:
            tel = s2.track_features(feats, timestamp=t)
        assert tel.state in ("NORMAL", "POSTINIT")
        assert tel.n_inliers > 100
