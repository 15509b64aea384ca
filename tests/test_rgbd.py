"""RGB-D input path: System.track_rgbd synthesizes the stereo channel
(ur = u - bf/z, depth) from a registered depth image, so the full stereo
pipeline (close-point seeding, stereo BA residuals, culling thresholds)
runs unchanged — BASELINE config #3's RGB-D mode. The reference retains
only the RGBD sensor enum (src/main/System.h:81); behavior follows
ORB-SLAM2's TrackRGBD depth->virtual-right synthesis, which the enum
points at."""

import numpy as np
import jax.numpy as jnp
import pytest

from helpers import DEFAULT_CAM, render_world
from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import project
from hyslam_tpu.io.config import CameraConfig, SystemConfig
from hyslam_tpu.io.evaluate import ate_rmse
from hyslam_tpu.slam.keyframe_policy import KeyFramePolicyParams
from hyslam_tpu.slam.system import System
from hyslam_tpu.slam.tracker import State

N_FRAMES = 40
DT = 0.1


def render_depth(cam, Tcw, pts, radius=6):
    """Depth image: splat each visible point's z in a small patch around its
    projection (features land on the rendered blobs at those pixels)."""
    uv, z = project(cam, se3.apply(jnp.asarray(Tcw), jnp.asarray(pts)))
    uv = np.asarray(uv)
    z = np.asarray(z)
    vis = (z > 0.2) & (uv[:, 0] > 8) & (uv[:, 0] < cam.width - 8) \
        & (uv[:, 1] > 8) & (uv[:, 1] < cam.height - 8)
    depth = np.zeros((cam.height, cam.width), np.float32)
    order = np.argsort(-z)                      # near points splat last
    for j in order:
        if not vis[j]:
            continue
        x, y = int(round(uv[j, 0])), int(round(uv[j, 1]))
        depth[max(0, y - radius):y + radius + 1,
              max(0, x - radius):x + radius + 1] = z[j]
    return depth


@pytest.mark.slow
def test_rgbd_sequence_tracks_metric():
    cam = DEFAULT_CAM
    rng = np.random.default_rng(5)
    Ts, T = [], np.eye(4, dtype=np.float32)
    for _ in range(N_FRAMES):
        Ts.append(T.copy())
        delta = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.004, 0.0, 0.0, 0.0, -0.15], dtype=jnp.float32)))
        T = (delta @ T).astype(np.float32)
    Ts = np.stack(Ts)
    centers = np.stack([-(Ts[i, :3, :3].T @ Ts[i, :3, 3])
                        for i in range(N_FRAMES)])
    pts = np.concatenate([
        c + rng.uniform([-6, -4, 2], [6, 4, 16], size=(20, 3))
        for c in centers[::2]
    ]).astype(np.float32)

    cc = CameraConfig(
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        width=cam.width, height=cam.height, bf=cam.bf,  # virtual baseline
        extractor=ExtractorConfig(n_features=400, n_levels=4),
        policy=KeyFramePolicyParams(max_kf_interval=5, n_tracked_target=80,
                                    n_tracked_variance=20),
    )
    sysm = System(SystemConfig(
        cameras={"SLAM": cc}, caps=MapCaps(K=32, L=8192, F=512, O=8),
        enable_loop_closing=False,
    ))

    seeded = 0
    for i in range(N_FRAMES):
        img, _, _ = render_world(cam, Ts[i], pts)
        depth = render_depth(cam, Ts[i], pts)
        tel = sysm.track_rgbd(img, depth, timestamp=DT * i, frame_id=i)
        seeded += tel.n_seeded

    tr = sysm.trackers["SLAM"]
    assert tr.state == State.NORMAL
    # depth-seeded close landmarks prove the synthesized stereo channel ran
    # (StereoInitializer + seed_close_landmarks depend on ur/depth > 0)
    assert seeded > 100, f"only {seeded} depth-seeded landmarks"
    n = int(tr.traj.size)
    assert n >= N_FRAMES - 2
    est = np.asarray(tr.traj.Tcw[:n])
    gt = Ts[np.clip(np.round(np.asarray(tr.traj.t[:n]) / DT).astype(int),
                    0, N_FRAMES - 1)]
    # metric (se3, NOT sim3) alignment: depth fixes the scale
    ate = ate_rmse(est, gt, align="se3")
    assert ate < 0.12, f"RGB-D ATE {ate:.3f} m"
