"""Dual-camera end-to-end: the reference's flagship use case on rendered
images (README.md:18-24) — a stereo SLAM camera localizes while a monocular
Imaging camera documents the scene through its own per-camera map; the
imaging map is finalized by the trajectory-tied Imaging Bundle Adjustment
(ImagingBundleAdjustment.cc:37-158) and exported.

Covers, through the public System API only:
  (a) two cameras tracked concurrently (per-camera Tracker/Map,
      System.cc:91-117);
  (b) ImagingFramePlacer keep decisions riding the SLAM trajectory
      (System.cc:267-281);
  (c) the SLAM-blackout -> Imaging NULL_STATE coupling and the post-recovery
      re-initialization into a fresh submap
      (TrackingStateTransitionReinit.cpp:101-119);
  (d) RunImagingBundleAdjustment: per-submap Horn Sim3 alignment against
      trajectory-predicted centers, submap registration, trajectory-tied BA,
      sparsification (System.cc:224-265) — asserted by imaging keyframe ATE
      against ground truth;
  (e) COLMAP / Agisoft exports of the finalized imaging map.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import DEFAULT_CAM, render_world
from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.geometry import se3
from hyslam_tpu.io.config import CameraConfig, SystemConfig
from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams
from hyslam_tpu.slam.system import System
from hyslam_tpu.slam.tracker import State

N_FRAMES = 90
BLACKOUT = (40, 46)      # SLAM blackout -> Imaging NULL coupling
DT = 0.1


def arc_ground_truth(n):
    """Gentle forward arc (world -> SLAM-cam)."""
    yaw = 0.004
    step = 0.18
    Ts, T = [], np.eye(4, dtype=np.float32)
    for _ in range(n):
        Ts.append(T.copy())
        delta = np.asarray(se3.exp(jnp.asarray(
            [0.0, yaw, 0.0, 0.0, 0.0, -step], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)
    return np.stack(Ts)


@pytest.mark.slow
def test_dual_camera_end_to_end(tmp_path):
    cam = DEFAULT_CAM
    Ts = arc_ground_truth(N_FRAMES)
    rng = np.random.default_rng(3)
    # landmark cloud along the whole path so both cameras keep texture
    centers = np.stack([-(Ts[i, :3, :3].T @ Ts[i, :3, 3])
                        for i in range(N_FRAMES)])
    pts = np.concatenate([
        c + rng.uniform([-6, -4, 2], [6, 4, 18], size=(16, 3))
        for c in centers[::2]
    ]).astype(np.float32)

    # rig: imaging camera slightly rotated + offset from the SLAM body
    Tcam = np.asarray(se3.exp(jnp.asarray(
        [0.0, 0.06, 0.02, 0.15, -0.1, 0.0], dtype=jnp.float32)))

    cc_slam = CameraConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height, bf=cam.bf,
        extractor=ExtractorConfig(n_features=400, n_levels=4),
        policy=KeyFramePolicyParams(max_kf_interval=5, n_tracked_target=80,
                                    n_tracked_variance=20),
    )
    cc_img = CameraConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height, mono=True,
        Tcam=Tcam.tolist(),
        extractor=ExtractorConfig(n_features=400, n_levels=4),
        policy=KeyFramePolicyParams(max_kf_interval=4, n_tracked_target=70,
                                    n_tracked_variance=20),
    )
    sysm = System(SystemConfig(
        cameras={"SLAM": cc_slam, "Imaging": cc_img},
        caps=MapCaps(K=64, L=8192, F=512, O=8),
        enable_loop_closing=False,
    ))
    T_r_off = np.asarray(se3.from_Rt(
        jnp.eye(3), jnp.asarray([-cam.baseline, 0.0, 0.0])))
    flat = np.full((cam.height, cam.width), 20.0, np.float32)

    img_states, keeps = [], []
    for i in range(N_FRAMES):
        black = BLACKOUT[0] <= i < BLACKOUT[1]
        if black:
            il = ir = flat
        else:
            il, _, _ = render_world(cam, Ts[i], pts)
            ir, _, _ = render_world(
                cam, (T_r_off @ Ts[i]).astype(np.float32), pts)
        sysm.track_stereo(il, ir, timestamp=DT * i, frame_id=i)
        T_img = (Tcam @ Ts[i]).astype(np.float32)
        im = flat if black else render_world(cam, T_img, pts)[0]
        sysm.track_monocular(im, timestamp=DT * i, camera="Imaging")
        img_states.append(sysm.trackers["Imaging"].state)
        # (b) placer decision rides the SLAM trajectory + rig transform
        if sysm.trackers["SLAM"].state in (State.NORMAL, State.POSTINIT):
            keep, _ = sysm.place_imaging_frame(DT * i)
            keeps.append(bool(keep))

    slam_tr = sysm.trackers["SLAM"]
    img_tr = sysm.trackers["Imaging"]

    # (a) both cameras built maps
    assert slam_tr.state == State.NORMAL
    n_img_kf = int(np.asarray(img_tr.ms.next_kf))
    assert n_img_kf >= 6, f"imaging made only {n_img_kf} keyframes"
    # (c) NULL coupling during the blackout, recovery afterwards
    assert State.NULL in img_states, f"states: {[s.name for s in img_states]}"
    assert img_states[-1] in (State.NORMAL, State.POSTINIT)
    n_submaps = int(np.asarray(img_tr.ms.maps.n_maps))
    assert n_submaps >= 2   # post-NULL re-init opened a fresh submap
    # (b) the placer retained some frames and skipped redundant ones
    assert any(keeps) and not all(keeps)

    # (d) finalize: align + register submaps, trajectory-tied BA, sparsify
    sysm.run_imaging_bundle_adjustment()
    reg = np.asarray(img_tr.ms.maps.registered)[1:n_submaps]
    assert reg.all(), f"unregistered submaps after imaging BA: {reg}"

    # imaging keyframe ATE vs ground truth (mono scale was free until the
    # Horn alignment — finalization must have recovered metric placement)
    kf_ok = np.asarray(img_tr.ms.kf.valid & ~img_tr.ms.kf.bad)
    sel = np.nonzero(kf_ok)[0]
    est_c = np.asarray(
        se3.translation(se3.inverse(img_tr.ms.kf.Tcw[jnp.asarray(sel)])))
    ts = np.asarray(img_tr.ms.kf.timestamp)[sel]
    idx = np.clip(np.round(ts / DT).astype(int), 0, N_FRAMES - 1)
    gt_T = np.stack([(Tcam @ Ts[i]).astype(np.float32) for i in idx])
    gt_c = np.asarray(se3.translation(se3.inverse(jnp.asarray(gt_T))))
    err = np.linalg.norm(est_c - gt_c, axis=-1)
    ate = float(np.sqrt(np.mean(err**2)))
    assert ate < 0.35, f"imaging KF ATE {ate:.3f} m after finalization"

    # (e) exports of the finalized dual-camera run
    out = str(tmp_path)
    sysm.export_colmap(out)
    sysm.save_keyframes_agisoft(os.path.join(out, "imaging.xml"),
                                camera="Imaging")
    sysm.save_trajectory(os.path.join(out, "slam_traj.tsv"))
    assert os.path.exists(os.path.join(out, "Imaging", "images.txt"))
    assert os.path.getsize(os.path.join(out, "imaging.xml")) > 0
