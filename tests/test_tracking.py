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
                 n_pts=1500, **tracker_kwargs):
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
        **tracker_kwargs,
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

    def test_track_normal_frame_matches_staged(self, rng):
        """The fused NORMAL-state program (strategies.track_normal_frame)
        must reproduce the staged motion-model -> ref-KF fallback ->
        local-map composition it replaced in Tracker._do_normal."""
        from hyslam_tpu.slam.strategies import (
            track_local_map,
            track_motion_model,
            track_normal_frame,
            track_reference_keyframe,
        )

        tracker, Ts = run_sequence(rng, n_frames=8)
        assert tracker.state in (State.NORMAL, State.POSTINIT)
        # one more frame continuing the same motion
        delta = np.asarray(se3.exp(
            jnp.asarray([0, 0.004, 0, 0, 0, -0.12], dtype=jnp.float32)))
        T_next = (delta @ Ts[-1]).astype(np.float32)
        pts = make_world(np.random.default_rng(0), 1500,
                         extent=(10.0, 7.0, 60.0), z_min=2.0)
        descs = np.random.default_rng(1).integers(
            0, 2**32, (1500, 8), dtype=np.uint32)
        feats, _ = synth_frame_features(DEFAULT_CAM, T_next, pts, descs, rng,
                                        F=512)
        ts = 0.8

        nf = track_normal_frame(
            DEFAULT_CAM, feats, ts, tracker.traj,
            jnp.asarray(tracker.last_Tcw), tracker.last_feats,
            tracker.last_lm_id, tracker.ref_kf, tracker.ms,
            jnp.asarray(30, jnp.int32),
        )

        Tcw_pred = TJ.predict_pose(tracker.traj, jnp.asarray(ts))
        mm = track_motion_model(DEFAULT_CAM, feats, Tcw_pred,
                                tracker.last_feats, tracker.last_lm_id,
                                tracker.ms)
        init = mm if bool(mm.ok) else track_reference_keyframe(
            DEFAULT_CAM, feats, jnp.asarray(tracker.last_Tcw), tracker.ms,
            tracker.ref_kf)
        lres = track_local_map(DEFAULT_CAM, feats, init.Tcw, init.lm_id,
                               tracker.ms)

        np.testing.assert_allclose(np.asarray(nf.Tcw),
                                   np.asarray(lres.track.Tcw), atol=1e-6)
        assert np.array_equal(np.asarray(nf.lm_id),
                              np.asarray(lres.track.lm_id))
        s = [int(x) for x in np.asarray(nf.scalars)]
        assert s[0] == int(mm.n_inliers)
        assert s[1] == int(init.ok)
        assert s[2] == int(lres.track.n_inliers)
        assert s[3] == int(lres.n_local_matches)
        assert s[6] == int(init.ok and
                           int(lres.track.n_inliers) >= 30)
        assert s[7] == int(np.asarray(tracker.ms.next_kf))
        assert int(nf.local_ref_kf) == int(lres.local.ref_kf)

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


class TestMonoPlanarInit:
    """The homography branch of the mono initializer (ReconstructH,
    MonoEstimator.cpp:585-744): a planar scene makes the fundamental model
    degenerate, so initialization must go through the Faugeras homography
    decomposition (VERDICT r2 Missing #1 — the flagship planar-seafloor
    start)."""

    @staticmethod
    def _planar_world(rng, n=1200, z0=6.0, tilt=0.25):
        xy = rng.uniform(-6, 6, (n, 2)).astype(np.float32)
        z = z0 + tilt * xy[:, 0]
        return np.concatenate([xy, z[:, None]], -1).astype(np.float32)

    def test_model_selection_prefers_h_on_plane(self, rng):
        import jax
        from hyslam_tpu.estimators.two_view import (
            ransac_fundamental, ransac_homography)
        from hyslam_tpu.geometry.camera import project

        pts = self._planar_world(rng)
        T2 = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.03, 0.0, -0.6, 0.05, 0.0], jnp.float32)))
        uv1, z1 = project(DEFAULT_CAM, se3.apply(jnp.eye(4), jnp.asarray(pts)))
        uv2, z2 = project(DEFAULT_CAM, se3.apply(jnp.asarray(T2), jnp.asarray(pts)))
        uv1, uv2 = np.asarray(uv1), np.asarray(uv2)
        vis = ((np.asarray(z1) > 0.2) & (np.asarray(z2) > 0.2)
               & (uv1 >= 0).all(-1) & (uv2 >= 0).all(-1)
               & (uv1[:, 0] < 640) & (uv1[:, 1] < 480)
               & (uv2[:, 0] < 640) & (uv2[:, 1] < 480))
        m = int(vis.sum())
        assert m > 100
        F = 512
        p1 = np.zeros((F, 2), np.float32)
        p2 = np.zeros((F, 2), np.float32)
        p1[:m] = uv1[vis][:F] + rng.normal(0, 0.3, (min(m, F), 2))
        p2[:m] = uv2[vis][:F] + rng.normal(0, 0.3, (min(m, F), 2))
        valid = jnp.asarray(np.arange(F) < m)
        key = jax.random.PRNGKey(0)
        _, inlH, sH = ransac_homography(
            jnp.asarray(p1), jnp.asarray(p2), valid, key)
        _, inlF, sF = ransac_fundamental(
            jnp.asarray(p1), jnp.asarray(p2), valid, key)
        rh = float(sH) / (float(sH) + float(sF))
        assert rh > 0.40            # homography selected (planar scene)
        assert int(inlH.sum()) > 0.9 * m

    def test_reconstruct_h_recovers_motion(self, rng):
        from hyslam_tpu.estimators.two_view import two_view_reconstruct
        from hyslam_tpu.geometry.camera import project

        pts = self._planar_world(rng)
        T2 = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.03, 0.0, -0.6, 0.05, 0.0], jnp.float32)))
        uv1, z1 = project(DEFAULT_CAM, se3.apply(jnp.eye(4), jnp.asarray(pts)))
        uv2, z2 = project(DEFAULT_CAM, se3.apply(jnp.asarray(T2), jnp.asarray(pts)))
        uv1, uv2 = np.asarray(uv1), np.asarray(uv2)
        vis = ((np.asarray(z1) > 0.2) & (np.asarray(z2) > 0.2)
               & (uv1 >= 0).all(-1) & (uv2 >= 0).all(-1)
               & (uv1[:, 0] < 640) & (uv1[:, 1] < 480)
               & (uv2[:, 0] < 640) & (uv2[:, 1] < 480))
        m = int(vis.sum())
        F = 512
        p1 = np.zeros((F, 2), np.float32)
        p2 = np.zeros((F, 2), np.float32)
        k = min(m, F)
        p1[:k] = uv1[vis][:k] + rng.normal(0, 0.3, (k, 2))
        p2[:k] = uv2[vis][:k] + rng.normal(0, 0.3, (k, 2))
        idx = np.full(F, -1, np.int32)
        idx[:k] = np.arange(k)
        ok, T21, X, good = two_view_reconstruct(
            DEFAULT_CAM, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(idx))
        assert ok
        T21 = np.asarray(T21)
        Re = T21[:3, :3] @ T2[:3, :3].T
        ang = np.degrees(np.arccos(np.clip((np.trace(Re) - 1) / 2, -1, 1)))
        assert ang < 0.5            # rotation within half a degree
        tdir = T21[:3, 3] / np.linalg.norm(T21[:3, 3])
        tgt = T2[:3, 3] / np.linalg.norm(T2[:3, 3])
        assert float(tdir @ tgt) > 0.999  # translation direction (scale-free)
        assert int(np.asarray(good).sum()) > 0.9 * k

    def test_mono_tracker_initializes_on_plane(self, rng):
        pts = self._planar_world(rng)
        descs = rng.integers(0, 2**32, (len(pts), 8), dtype=np.uint32)
        tr = Tracker(cam=DEFAULT_CAM, caps=MapCaps(K=32, L=8192, F=512, O=8),
                     is_mono=True)
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.0, 0.0, -0.8, 0.0, 0.0], jnp.float32)))
        f0, _ = synth_frame_features(DEFAULT_CAM, T0, pts, descs, rng, F=512)
        f0 = f0._replace(ur=jnp.full_like(f0.ur, -1.0),
                         depth=jnp.full_like(f0.depth, -1.0))
        f1, _ = synth_frame_features(DEFAULT_CAM, T1, pts, descs, rng, F=512)
        f1 = f1._replace(ur=jnp.full_like(f1.ur, -1.0),
                         depth=jnp.full_like(f1.depth, -1.0))
        tr.track(f0, 0.0, 0)
        assert tr.state == State.INITIALIZE
        tr.track(f1, 0.1, 1)
        assert tr.state == State.POSTINIT   # planar init succeeded (H-branch)
        assert int(np.asarray(tr.ms.next_lm)) > 100
