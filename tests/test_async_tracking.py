"""Async tracking loop: the zero-host-sync production driver
(Tracker.track_async + strategies.track_normal_step) must track like the
synchronous state machine — same world, comparable trajectory — and must
handle deferred loss detection (the host learns about a failed frame
commit_lag frames later; the device state freezes at the last good frame).

The decision latency is the same the reference's bounded tracking queue
imposes (System.cc:194 blocks the caller at depth 2)."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import DEFAULT_CAM, render_world
from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.geometry import se3
from hyslam_tpu.io.config import CameraConfig, SystemConfig
from hyslam_tpu.slam.system import System
from hyslam_tpu.slam.tracker import State

N = 30


def _world(rng):
    pts = np.stack([rng.uniform(-10, 10, 2000), rng.uniform(-6, 6, 2000),
                    rng.uniform(3, 30, 2000)], -1).astype(np.float32)
    Ts, T = [], np.eye(4, dtype=np.float32)
    for _ in range(N):
        Ts.append(T.copy())
        d = np.asarray(se3.exp(jnp.asarray(
            [0, 0.003, 0, 0, 0, -0.1], dtype=jnp.float32)))
        T = (d @ T).astype(np.float32)
    return pts, Ts


def _system(async_mode, **kw):
    cam = DEFAULT_CAM
    cc = CameraConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height, bf=cam.bf,
        extractor=ExtractorConfig(n_features=300, n_levels=4))
    return System(SystemConfig(
        cameras={"SLAM": cc}, caps=MapCaps(K=32, L=4096, F=512, O=8),
        enable_loop_closing=False, async_tracking=async_mode, **kw))


def _run(sysm, pts, Ts, blackout=()):
    cam = DEFAULT_CAM
    T_r = np.asarray(se3.from_Rt(
        jnp.eye(3), jnp.asarray([-cam.baseline, 0.0, 0.0])))
    flat = np.full((cam.height, cam.width), 20.0, np.float32)
    for i in range(N):
        if blackout and blackout[0] <= i < blackout[1]:
            il = ir = flat
        else:
            il, _, _ = render_world(cam, Ts[i], pts)
            ir, _, _ = render_world(cam, (T_r @ Ts[i]).astype(np.float32),
                                    pts)
        sysm.track_stereo(il, ir, timestamp=0.1 * i, frame_id=i)
    sysm.flush()
    tr = sysm.trackers["SLAM"]
    n = int(np.asarray(tr.traj.size))
    est_c = np.asarray(se3.translation(se3.inverse(tr.traj.Tcw[:n])))
    ts = np.asarray(tr.traj.t[:n])
    idx = np.clip(np.round(ts / 0.1).astype(int), 0, N - 1)
    gt_c = np.stack([-(Ts[i][:3, :3].T @ Ts[i][:3, 3]) for i in idx])
    ate = float(np.sqrt(np.mean(np.sum((est_c - gt_c) ** 2, -1))))
    return tr, n, ate


@pytest.mark.slow
class TestAsyncTracking:
    def test_matches_sync_quality(self):
        rng = np.random.default_rng(0)
        pts, Ts = _world(rng)
        tr_s, n_s, ate_s = _run(_system(False), pts, Ts)
        tr_a, n_a, ate_a = _run(_system(True), pts, Ts)
        assert tr_s.state == State.NORMAL and tr_a.state == State.NORMAL
        assert n_a == N, f"async dropped frames: {n_a}/{N}"
        assert ate_a < max(3.0 * ate_s, 0.15), (ate_a, ate_s)
        # telemetry rows arrive for every frame, in order
        ids = [t.frame_id for t in tr_a.telemetry]
        assert ids == sorted(ids) and len(ids) == N

    def test_async_loop_closing_worker(self):
        """The async driver's loop-closing WORKER (the reference's
        LoopClosing thread, System.cc:145-152): detection + Sim3
        verification run off-thread on map snapshots; the verified
        closure is applied to the authoritative map between frames and
        reduces trajectory error. Same circuit as test_longrun, shorter."""
        from hyslam_tpu.core import mapstate as M
        from hyslam_tpu.io.evaluate import ate_rmse

        cam = DEFAULT_CAM
        n_frames, circle, blackout = 150, 120, (40, 46)
        yaw = 2 * np.pi / circle
        Ts, T = [], np.eye(4, dtype=np.float32)
        for _ in range(n_frames):
            Ts.append(T.copy())
            d = np.asarray(se3.exp(jnp.asarray(
                [0.0, yaw, 0.0, 0.0, 0.0, -0.4], dtype=jnp.float32)))
            T = (d @ T).astype(np.float32)
        Ts = np.stack(Ts)
        rng = np.random.default_rng(0)
        centers = np.stack([-(Ts[i, :3, :3].T @ Ts[i, :3, 3])
                            for i in range(n_frames)])
        pts = np.concatenate([
            centers[i] + rng.uniform([-6, -4, -6], [6, 4, 6], size=(14, 3))
            for i in range(0, circle, 2)
        ]).astype(np.float32)

        cc = CameraConfig(
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            width=cam.width, height=cam.height, bf=cam.bf,
            extractor=ExtractorConfig(n_features=400, n_levels=4))
        from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams

        cc.policy = KeyFramePolicyParams(max_kf_interval=5,
                                         n_tracked_target=80,
                                         n_tracked_variance=20)
        sysm = System(SystemConfig(
            cameras={"SLAM": cc}, caps=MapCaps(K=96, L=8192, F=512, O=8),
            enable_loop_closing=True, async_tracking=True))
        T_r = np.asarray(se3.from_Rt(
            jnp.eye(3), jnp.asarray([-cam.baseline, 0.0, 0.0])))
        flat = np.full((cam.height, cam.width), 20.0, np.float32)
        tr = sysm.trackers["SLAM"]
        nudged = False
        for i in range(n_frames):
            if blackout[0] <= i < blackout[1]:
                il = ir = flat
            else:
                il, _, _ = render_world(cam, Ts[i], pts)
                ir, _, _ = render_world(
                    cam, (T_r @ Ts[i]).astype(np.float32), pts)
            sysm.track_stereo(il, ir, timestamp=0.1 * i, frame_id=i)
            if (not nudged and i >= blackout[1]
                    and tr.state == State.POSTINIT
                    and int(np.asarray(tr.ms.maps.n_maps)) >= 2):
                tr.drain_pending()
                active = int(np.asarray(tr.ms.maps.active))
                T_pert = jnp.asarray(np.asarray(se3.exp(jnp.asarray(
                    [0.0, 0.05, 0.0, 0.35, 0.0, 0.35], dtype=jnp.float32))))
                tr.ms = M.apply_transform_to_map(tr.ms, active, T_pert)
                tr.ms = M.refresh_tiepoints(tr.ms)
                tr._sync_dev_to_host()   # device state is pre-perturbation
                nudged = True
        sysm.flush()
        assert nudged, "reinit never happened"
        closer = sysm.loop_closers.get("SLAM")
        assert closer is not None and closer.n_closed >= 1, \
            "async worker closed no loop on the revisit"
        n = int(np.asarray(tr.traj.size))
        est = np.asarray(tr.traj.Tcw[:n])
        tss = np.asarray(tr.traj.t[:n])
        gt = Ts[np.clip(np.round(tss / 0.1).astype(int), 0, n_frames - 1)]
        ate = ate_rmse(est, gt)
        assert ate < 0.40, f"ATE {ate:.3f} m after async loop closure"

    def test_deferred_loss_and_recovery(self):
        """A blackout mid-sequence: the loss is discovered commit_lag
        frames late, the device state freezes at the last good frame, the
        stereo camera re-initializes a registered submap, and tracking
        resumes (TrackingStateReInitialize semantics under lag)."""
        rng = np.random.default_rng(1)
        pts, Ts = _world(rng)
        sysm = _system(True)
        tr, n, _ = _run(sysm, pts, Ts, blackout=(12, 16))
        assert tr.state in (State.NORMAL, State.POSTINIT), tr.state
        assert int(np.asarray(tr.ms.maps.n_maps)) >= 2  # reinit submap
        # no trajectory entries for the blacked-out frames
        ts = np.asarray(tr.traj.t[:n])
        lost = [t for t in ts if 1.2 <= t < 1.6]
        assert len(lost) <= 1, f"lost frames entered the trajectory: {lost}"
