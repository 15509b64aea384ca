"""Horn 1987 closed-form Sim(3)/SE(3) point-set alignment, batched + weighted.

Replaces `src/optimizers/OptHelpers.{h,cc}::ComputeSim3_Horn` (used for GPS ->
SLAM alignment in BundleAdjustment.cc:109-180 and for submap alignment in
ImagingBundleAdjustment::DetermineSimilarityTransforms) and the minimal-set
Horn inside `src/estimators/Sim3Solver.cc`.

Finds (s, R, t) minimizing sum_i w_i || y_i - (s R x_i + t) ||^2 via the
quaternion eigenvector method.
"""

from __future__ import annotations

import jax.numpy as jnp

from hyslam_tpu.utils.precision import HIGHEST as _P

from hyslam_tpu.geometry import sim3, so3


def horn_sim3(
    x: jnp.ndarray,
    y: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    fix_scale: bool = False,
) -> jnp.ndarray:
    """Weighted Horn alignment mapping x -> y.

    x, y: [..., N, 3] correspondences.  weights: [..., N] (>=0) or None.
    Returns packed Sim3 [..., 8]. With fix_scale=True returns s = 1
    (the Sim3Solver's bFixScale mode for stereo, Sim3Solver.h:37).
    """
    if weights is None:
        weights = jnp.ones(x.shape[:-1], x.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True)
    wsafe = jnp.maximum(wsum, 1e-12)
    wn = (weights / wsafe)[..., None]

    cx = jnp.sum(wn * x, axis=-2)
    cy = jnp.sum(wn * y, axis=-2)
    xc = x - cx[..., None, :]
    yc = y - cy[..., None, :]

    # Cross-covariance with Horn's indexing: S_ab = sum_n w_n * x_a * y_b
    # (left = source x, right = target y; Horn 1987 §4A)
    M = jnp.einsum("...ni,...nj->...ij", wn * xc, yc, precision=_P)

    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]

    # Horn's symmetric 4x4 N matrix; its top eigenvector is the optimal quat
    # rotating x into y.
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    _, vecs = jnp.linalg.eigh(N)
    q = vecs[..., :, -1]  # largest eigenvalue
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    R = so3.mat_from_quat(q)

    # Symmetric scale (Horn sec. 2E): s = sqrt(sum|yc|^2 / sum|xc|^2)
    num = jnp.sum(wn[..., 0] * jnp.sum(yc * yc, axis=-1), axis=-1)
    den = jnp.sum(wn[..., 0] * jnp.sum(xc * xc, axis=-1), axis=-1)
    s = jnp.sqrt(jnp.maximum(num, 1e-24) / jnp.maximum(den, 1e-24))
    if fix_scale:
        s = jnp.ones_like(s)

    t = cy - s[..., None] * jnp.einsum("...ij,...j->...i", R, cx, precision=_P)
    return sim3.pack(s, R, t)


def horn_se3(x: jnp.ndarray, y: jnp.ndarray, weights: jnp.ndarray | None = None):
    """Rigid (fixed-scale) Horn alignment; returns SE(3) [..., 4, 4]."""
    from hyslam_tpu.geometry import se3

    g = horn_sim3(x, y, weights, fix_scale=True)
    _, R, t = sim3.unpack(g)
    return se3.from_Rt(R, t)
