"""Sim(3): similarity transforms (s, R, t) for loop closure / submap alignment.

Replaces g2o's Sim3 type (Thirdparty/g2o/g2o/types/sim3.h) used by the
reference's Sim3Solver, OptimizeSim3 and OptimizeEssentialGraph. A Sim3 acts
on points as  x' = s * R @ x + t.

Packed representation: [..., 8] = (s, qw, qx, qy, qz, tx, ty, tz).
Tangent: [..., 7] = (sigma, omega[3], upsilon[3]) with s = exp(sigma).
"""

from __future__ import annotations

import jax.numpy as jnp

from hyslam_tpu.geometry import so3
from hyslam_tpu.utils.precision import HIGHEST as _P


def pack(s, R, t) -> jnp.ndarray:
    q = so3.quat_from_mat(R)
    return jnp.concatenate([jnp.asarray(s)[..., None], q, t], axis=-1)


def unpack(g: jnp.ndarray):
    s = g[..., 0]
    R = so3.mat_from_quat(g[..., 1:5])
    t = g[..., 5:8]
    return s, R, t


def identity(batch_shape=(), dtype=jnp.float32) -> jnp.ndarray:
    g = jnp.zeros(tuple(batch_shape) + (8,), dtype)
    return g.at[..., 0].set(1.0).at[..., 1].set(1.0)


def apply(g: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    s, R, t = unpack(g)
    return s[..., None] * jnp.einsum("...ij,...j->...i", R, pts, precision=_P) + t


def compose(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(sa, Ra, ta) o (sb, Rb, tb) = (sa*sb, Ra Rb, sa Ra tb + ta)."""
    sa, Ra, ta = unpack(a)
    sb, Rb, tb = unpack(b)
    s = sa * sb
    R = jnp.matmul(Ra, Rb, precision=_P)
    t = sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb, precision=_P) + ta
    return pack(s, R, t)


def inverse(g: jnp.ndarray) -> jnp.ndarray:
    s, R, t = unpack(g)
    si = 1.0 / s
    Ri = jnp.swapaxes(R, -1, -2)
    ti = -si[..., None] * jnp.einsum("...ij,...j->...i", Ri, t, precision=_P)
    return pack(si, Ri, ti)


def from_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Promote an SE(3) matrix [..., 4, 4] to a Sim3 with s = 1."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return pack(jnp.ones(T.shape[:-2], T.dtype), R, t)


def to_se3_scaled(g: jnp.ndarray) -> jnp.ndarray:
    """Collapse a Sim3 onto SE(3) the way the reference's CorrectLoop does
    (LoopClosing.cc:505-511): keep R, divide t by s."""
    from hyslam_tpu.geometry import se3

    s, R, t = unpack(g)
    return se3.from_Rt(R, t / s[..., None])


import numpy as _np

# 10-point Gauss-Legendre nodes/weights on [0, 1] (exact to poly degree 19;
# the W-matrix integrands e^{sigma u} * {1, u sinc(u t), u^2/2 sinc^2(ut/2)}
# are entire, so quadrature error is ~1e-12 for |sigma|, theta in SLAM range).
_GL_X, _GL_W = _np.polynomial.legendre.leggauss(10)
_GL_U = ((_GL_X + 1.0) / 2.0).astype(_np.float32)
_GL_A = (_GL_W / 2.0).astype(_np.float32)


def _sincsq_arg(x2: jnp.ndarray) -> jnp.ndarray:
    """sin(sqrt(x2))/sqrt(x2), stable in f32 incl. gradient at 0."""
    small = x2 < 1e-4
    sx2 = jnp.where(small, 1.0, x2)
    sx = jnp.sqrt(sx2)
    return jnp.where(small, 1.0 - x2 / 6.0 + x2 * x2 / 120.0, jnp.sin(sx) / sx)


def _W_coeffs(sigma: jnp.ndarray, theta2: jnp.ndarray):
    """Coefficients (A, B, C) of W = A*I + B*hat(w) + C*hat(w)^2 in the Sim3
    exponential t = W @ upsilon, from the integral form
        W = int_0^1 e^{sigma u} exp(u hat(w)) du
    evaluated by fixed Gauss-Legendre quadrature — uniformly accurate and
    branch-free (the piecewise closed forms cancel catastrophically in f32
    near sigma=0 / theta=0, this does not).
    """
    u = jnp.asarray(_GL_U, sigma.dtype)          # [10]
    a = jnp.asarray(_GL_A, sigma.dtype)          # [10]
    su = sigma[..., None] * u                    # [..., 10]
    es = jnp.exp(su)
    x2 = (u * u) * theta2[..., None]             # (u theta)^2
    snc = _sincsq_arg(x2)                        # sinc(u theta)
    snc_h = _sincsq_arg(x2 / 4.0)                # sinc(u theta / 2)
    A = jnp.sum(a * es, axis=-1)
    B = jnp.sum(a * es * u * snc, axis=-1)
    C = jnp.sum(a * es * (u * u) * 0.5 * snc_h * snc_h, axis=-1)
    return A, B, C


def exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map [..., 7] (sigma, omega, upsilon) -> packed Sim3 [..., 8]."""
    sigma = xi[..., 0]
    w = xi[..., 1:4]
    v = xi[..., 4:7]
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _W_coeffs(sigma, theta2)
    W = so3.hat(w)
    W2 = jnp.matmul(W, W, precision=_P)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    Wm = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", Wm, v, precision=_P)
    return pack(jnp.exp(sigma), so3.exp(w), t)


def log(g: jnp.ndarray) -> jnp.ndarray:
    """Logarithm map: packed Sim3 [..., 8] -> [..., 7] (sigma, omega, upsilon).

    upsilon is recovered by solving the 3x3 system W upsilon = t.
    """
    s, R, t = unpack(g)
    sigma = jnp.log(s)
    w = so3.log(R)
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, C = _W_coeffs(sigma, theta2)
    W = so3.hat(w)
    W2 = jnp.matmul(W, W, precision=_P)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=g.dtype), W.shape)
    Wm = A[..., None, None] * eye + B[..., None, None] * W + C[..., None, None] * W2
    v = jnp.linalg.solve(Wm, t[..., None])[..., 0]
    return jnp.concatenate([sigma[..., None], w, v], axis=-1)
