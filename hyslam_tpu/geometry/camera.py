"""Pinhole camera model (mono + rectified stereo), batched.

Replaces the reference `src/core/Camera.{h,cc}`: intrinsics K, stereo
baseline-times-fx `mbf`, close/far depth threshold `thDepth`, and the rig
extrinsic `Tcam` (body -> camera) used for multi-camera setups
(Camera.h:4-52). Distortion coefficients exist in the reference but are
unused (images are assumed rectified, Camera.h comment) — same here.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from hyslam_tpu.geometry import se3


class Camera(NamedTuple):
    """Static camera description. All fields are python floats/arrays so a
    Camera can be closed over by jitted functions without retracing on pose
    changes (it is part of the static config, like the reference's per-camera
    YAML block, config/sample_primary_config_file.yaml:27-71)."""

    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int
    bf: float = 0.0          # stereo baseline * fx; 0 => monocular
    th_depth: float = 35.0   # close/far stereo point threshold, in units of baseline
    Tcam: tuple | None = None  # rig extrinsic body->camera, 4x4 nested
                             # tuple (hashable: Camera rides into jits as a
                             # STATIC argument; use Tcam_mat() for the array)
    scale: float = 1.0       # image pre-scaling applied before processing
    fps: float = 30.0

    @property
    def is_stereo(self) -> bool:
        return self.bf > 0.0

    @property
    def baseline(self) -> float:
        return self.bf / self.fx if self.bf > 0 else 0.0

    @property
    def close_depth(self) -> float:
        """Depth below which a stereo point counts as 'close' (reference:
        thDepth * baseline, Camera.cc)."""
        return self.th_depth * self.baseline if self.bf > 0 else jnp.inf

    def Tcam_mat(self, dtype=jnp.float32):
        """Rig extrinsic as an array, or None."""
        return None if self.Tcam is None else jnp.asarray(self.Tcam, dtype)

    def K(self, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]],
            dtype=dtype,
        )


def project(cam: Camera, pts_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Camera-frame points [..., 3] -> pixel coords [..., 2] and depth [...].

    No in-bounds check here; callers combine with `in_image` / positive-depth
    masks (mirrors Camera::Project, src/core/Camera.cc).
    """
    z = pts_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pts_cam[..., 0] / zsafe + cam.cx
    v = cam.fy * pts_cam[..., 1] / zsafe + cam.cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(cam: Camera, pts_cam: jnp.ndarray):
    """Returns (uv [..., 2], u_right [...], depth [...]) for rectified stereo:
    u_right = u - bf / z."""
    uv, z = project(cam, pts_cam)
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    ur = uv[..., 0] - cam.bf / zsafe
    return uv, ur, z


def backproject(cam: Camera, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """Pixel coords [..., 2] + depth [...] -> camera-frame points [..., 3]
    (Camera::Unproject analog)."""
    x = (uv[..., 0] - cam.cx) / cam.fx * depth
    y = (uv[..., 1] - cam.cy) / cam.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def unproject_to_world(cam: Camera, Tcw: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray):
    """Pixels + depths -> world points given camera pose Tcw (world->cam)."""
    pc = backproject(cam, uv, depth)
    return se3.apply(se3.inverse(Tcw), pc)


def in_image(cam: Camera, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
    """Bounds mask [...] for pixel coords [..., 2]."""
    return (
        (uv[..., 0] >= margin)
        & (uv[..., 0] < cam.width - margin)
        & (uv[..., 1] >= margin)
        & (uv[..., 1] < cam.height - margin)
    )


def depth_from_disparity(cam: Camera, u_left: jnp.ndarray, u_right: jnp.ndarray):
    """Rectified stereo depth: z = bf / (uL - uR). Invalid (non-positive)
    disparity maps to depth -1 like the reference's mvDepth convention."""
    disp = u_left - u_right
    ok = disp > 1e-6
    z = jnp.where(ok, cam.bf / jnp.where(ok, disp, 1.0), -1.0)
    return z, ok
