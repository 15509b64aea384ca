"""Closed-form reprojection residuals and Jacobians, batched.

Replaces g2o's EdgeSE3ProjectXYZ / EdgeStereoSE3ProjectXYZ (used by every
reference optimizer, Optimizer.cc:48-280, BundleAdjustment.cc:203-334).

Conventions:
- pose is Tcw (world -> camera), perturbed LEFT-multiplicatively
  T <- exp(delta) @ T with tangent (omega, upsilon) — g2o VertexSE3Expmap.
- residual rows: (u - u_obs, v - v_obs, u_r - ur_obs); the third row is
  zero-weighted for monocular observations so mono and stereo share one
  fixed-shape kernel (mono = 2-dof chi2, stereo = 3-dof, as in the
  reference's separate edge types).
"""

from __future__ import annotations

import jax.numpy as jnp

from hyslam_tpu.geometry import se3, so3
from hyslam_tpu.geometry.camera import Camera


def camera_point(Tcw: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """World points [...,3] into camera frame under pose(s) [...,4,4]."""
    return se3.apply(Tcw, X)


def reproj_residual(
    cam: Camera,
    pc: jnp.ndarray,
    uv_obs: jnp.ndarray,
    ur_obs: jnp.ndarray,
    stereo_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Residual [..., 3] from camera-frame points pc [..., 3].

    ur_obs is the observed right-image u; entries where stereo_mask is False
    contribute a zeroed third row.
    """
    z = pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * pc[..., 0] / zs + cam.cx
    v = cam.fy * pc[..., 1] / zs + cam.cy
    ur = u - cam.bf / zs
    r3 = jnp.where(stereo_mask, ur - ur_obs, 0.0)
    return jnp.stack([u - uv_obs[..., 0], v - uv_obs[..., 1], r3], axis=-1)


def reproj_jacobians(
    cam: Camera,
    Tcw: jnp.ndarray,
    pc: jnp.ndarray,
    stereo_mask: jnp.ndarray,
):
    """Jacobians of the 3-row residual.

    Returns (J_pose [..., 3, 6], J_point [..., 3, 3]) where J_pose is w.r.t.
    the left-multiplicative tangent (omega, upsilon) of Tcw and J_point is
    w.r.t. the world point.

    d pc / d delta = [ -hat(pc) | I ]  (3x6),  d pc / d X = R(Tcw).
    """
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    iz = 1.0 / zs
    iz2 = iz * iz

    fx, fy, bf = cam.fx, cam.fy, cam.bf
    zero = jnp.zeros_like(x)
    # projection Jacobian [..., 3, 3] w.r.t. pc
    Ju = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    Jv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    Jur = jnp.stack([fx * iz, zero, -fx * x * iz2 + bf * iz2], axis=-1)
    Jur = jnp.where(stereo_mask[..., None], Jur, 0.0)
    Jproj = jnp.stack([Ju, Jv, Jur], axis=-2)

    # d pc / d (omega, upsilon) = [-hat(pc) | I]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=pc.dtype), pc.shape[:-1] + (3, 3))
    dpc_ddelta = jnp.concatenate([-so3.hat(pc), eye], axis=-1)  # [..., 3, 6]

    J_pose = Jproj @ dpc_ddelta
    J_point = Jproj @ se3.rotation(Tcw)
    return J_pose, J_point


def chi2(
    r: jnp.ndarray, inv_sigma2: jnp.ndarray, stereo_mask: jnp.ndarray
) -> jnp.ndarray:
    """Information-weighted squared error per observation [...].

    inv_sigma2 is the scalar information from the feature's pyramid level
    (FeatureExtractorSettings::determineSigma2 analog); the reference weights
    each 2x2/3x3 edge with inv_sigma2 * I (Optimizer.cc:117,160)."""
    del stereo_mask  # third row is already zeroed for mono residuals
    return inv_sigma2 * jnp.sum(r * r, axis=-1)
