"""Synthetic SLAM problem generators shared across solver / tracking / system
tests. Since the reference cannot be run here (SURVEY.md §7.4: needs OpenCV
3.4 + Pangolin + custom g2o), golden values come from constructed worlds with
known ground truth."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.geometry import se3, so3
from hyslam_tpu.geometry.camera import Camera, project_stereo

DEFAULT_CAM = Camera(
    fx=450.0, fy=450.0, cx=320.0, cy=240.0, width=640, height=480,
    bf=45.0, th_depth=35.0,
)


def make_world(rng, n_points=500, extent=(8.0, 6.0, 14.0), z_min=2.0):
    """Random 3D landmark cloud in front of the origin camera."""
    pts = np.stack(
        [
            rng.uniform(-extent[0], extent[0], n_points),
            rng.uniform(-extent[1], extent[1], n_points),
            rng.uniform(z_min, extent[2], n_points),
        ],
        axis=-1,
    ).astype(np.float32)
    return pts


def make_trajectory(n_frames=20, step=0.25, yaw_rate=0.01):
    """Forward-motion trajectory with slight yaw; returns Tcw [F,4,4]."""
    Ts = []
    T = np.eye(4, dtype=np.float32)
    for i in range(n_frames):
        Ts.append(T.copy())
        delta = np.asarray(
            se3.exp(jnp.asarray([0.0, yaw_rate, 0.0, 0.0, 0.0, -step], dtype=jnp.float32))
        )
        T = (delta @ T).astype(np.float32)
    return np.stack(Ts)


def observe(cam: Camera, Tcw, pts, noise=0.3, rng=None, stereo_frac=1.0):
    """Project world points under a pose; returns (uv [N,2], ur [N], visible
    [N] bool, stereo [N] bool). Adds pixel noise."""
    if rng is None:
        rng = np.random.default_rng(0)
    uv, ur, z = project_stereo(cam, se3.apply(jnp.asarray(Tcw), jnp.asarray(pts)))
    uv = np.asarray(uv)
    ur = np.asarray(ur)
    z = np.asarray(z)
    vis = (
        (z > 0.2)
        & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
    )
    uv = uv + rng.normal(0, noise, uv.shape)
    ur = ur + rng.normal(0, noise, ur.shape)
    stereo = vis & (rng.uniform(size=len(z)) < stereo_frac)
    return uv.astype(np.float32), ur.astype(np.float32), vis, stereo


def perturb_pose(rng, T, rot=0.02, trans=0.1):
    xi = np.concatenate(
        [rng.normal(0, rot, 3), rng.normal(0, trans, 3)]
    ).astype(np.float32)
    return np.asarray(se3.exp(jnp.asarray(xi)) @ jnp.asarray(T))


def pose_error(Ta, Tb):
    """(rotation deg, translation) error between two poses."""
    d = np.asarray(se3.log(jnp.asarray(Ta) @ se3.inverse(jnp.asarray(Tb))))
    return np.degrees(np.linalg.norm(d[:3])), np.linalg.norm(d[3:])


# ---------------------------------------------------------------------------
# synthetic image rendering (feature/extraction tests)
# ---------------------------------------------------------------------------

def render_world(cam, Tcw, pts, point_seed=0, bg=20.0, amp=180.0):
    """Render a sparse textured image: each world point splats a small
    point-unique constellation of sub-blobs (so descriptors are distinctive
    and approximately viewpoint-stable for small motions). Returns [H,W] f32.
    """
    import jax.numpy as jnp
    from hyslam_tpu.geometry import se3 as _se3
    from hyslam_tpu.geometry.camera import project as _project
    from hyslam_tpu.ops.pyramid import gaussian_blur

    rng_p = np.random.default_rng(point_seed)
    n = len(pts)
    # 5 sub-blobs per point, fixed per point id, radius ~4 px, varied sign
    offs = rng_p.uniform(-4, 4, size=(n, 5, 2)).astype(np.float32)
    amps = rng_p.uniform(0.4, 1.0, size=(n, 5)).astype(np.float32) * amp

    uv, z = _project(cam, _se3.apply(jnp.asarray(Tcw), jnp.asarray(pts)))
    uv = np.asarray(uv)
    z = np.asarray(z)
    vis = (z > 0.2) & (uv[:, 0] > 8) & (uv[:, 0] < cam.width - 8) \
        & (uv[:, 1] > 8) & (uv[:, 1] < cam.height - 8)

    img = np.full((cam.height, cam.width), bg, np.float32)
    pos = (uv[:, None, :] + offs).reshape(-1, 2)
    a = (amps * vis[:, None]).reshape(-1)
    xi = np.round(pos[:, 0]).astype(int)
    yi = np.round(pos[:, 1]).astype(int)
    ok = (xi >= 0) & (xi < cam.width) & (yi >= 0) & (yi < cam.height)
    np.add.at(img, (yi[ok], xi[ok]), a[ok])
    img = np.asarray(gaussian_blur(jnp.asarray(img), ksize=5, sigma=1.0))
    return np.clip(img, 0, 255).astype(np.float32), uv, vis


def synth_frame_features(cam, Tcw, pts, descs, rng, F=512, noise=0.3,
                         corrupt_bits=3, drop_frac=0.05):
    """Build FrameFeatures as an ideal extractor would see them: project the
    world, add pixel noise, fill stereo ur/depth, corrupt descriptors by a
    few bits, and shuffle feature order. Returns (feats, gt_index [F] world
    point index per feature slot or -1)."""
    import jax.numpy as jnp
    from hyslam_tpu.core.frame import empty_features
    from hyslam_tpu.geometry import se3 as _se3
    from hyslam_tpu.geometry.camera import project_stereo as _ps

    uv, ur, z = _ps(cam, _se3.apply(jnp.asarray(Tcw), jnp.asarray(pts)))
    uv = np.asarray(uv); ur = np.asarray(ur); z = np.asarray(z)
    vis = (
        (z > 0.3)
        & (uv[:, 0] >= 2) & (uv[:, 0] < cam.width - 2)
        & (uv[:, 1] >= 2) & (uv[:, 1] < cam.height - 2)
        & (rng.uniform(size=len(z)) > drop_frac)
    )
    idx = np.nonzero(vis)[0]
    rng.shuffle(idx)
    idx = idx[:F]
    n = len(idx)
    uvn = uv[idx] + rng.normal(0, noise, (n, 2)).astype(np.float32)
    urn = ur[idx] + rng.normal(0, noise, n).astype(np.float32)
    disp = np.maximum(uvn[:, 0] - urn, 1e-3)
    depth = cam.bf / disp
    d = descs[idx].copy()
    for _ in range(corrupt_bits):
        w = rng.integers(0, 8, n)
        b = rng.integers(0, 32, n).astype(np.uint32)
        d[np.arange(n), w] ^= (np.uint32(1) << b)
    f = empty_features(F)
    gt = np.full(F, -1, np.int64)
    gt[:n] = idx
    return f._replace(
        uv=f.uv.at[:n].set(jnp.asarray(uvn.astype(np.float32))),
        ur=f.ur.at[:n].set(jnp.asarray(urn.astype(np.float32))),
        depth=f.depth.at[:n].set(jnp.asarray(depth.astype(np.float32))),
        desc=f.desc.at[:n].set(jnp.asarray(d)),
        valid=f.valid.at[:n].set(True),
    ), gt
