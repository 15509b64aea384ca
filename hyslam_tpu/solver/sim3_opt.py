"""Sim3 refinement between two keyframes (Optimizer::OptimizeSim3 analog,
src/optimizers/Optimizer.cc:554-769): optimize the relative Sim3 g12 with
forward (X2 -> image 1) and inverse (X1 -> image 2) reprojection residuals,
Huber robust, with one outlier-removal pass — as a single LM program using
autodiff Jacobians over the 7-dof tangent."""

from __future__ import annotations

from functools import partial

from hyslam_tpu.utils.precision import f32 as _f32

import jax
import jax.numpy as jnp

from hyslam_tpu.geometry import sim3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.solver import robust


@_f32
@partial(jax.jit, static_argnames=("cam1", "cam2", "fix_scale", "n_iters"))
def optimize_sim3(
    cam1: Camera,
    cam2: Camera,
    g12: jnp.ndarray,
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    inv_sigma2_1: jnp.ndarray,
    inv_sigma2_2: jnp.ndarray,
    valid: jnp.ndarray,
    fix_scale: bool = False,
    n_iters: int = 10,
    seed_inliers: jnp.ndarray | None = None,
):
    """Returns (g12 refined, inliers [N], n_inliers).

    seed_inliers: optional [N] mask of the pairs the FIRST robust pass
    trusts (e.g. the Sim3-RANSAC consensus set). The reference optimizes
    over all matches and relies on Huber + chi2 removal (Optimizer.cc:
    554-769), which collapses when the match set is outlier-dominated
    (measured: 187 matches / 24 geometric inliers pulled the solution off
    and left 0 final inliers). Seeding the first pass with the consensus
    set keeps the basin; reclassification below still runs over ALL valid
    pairs, so genuine matches outside the seed are recovered."""
    delta2 = 10.0  # reference deltaHuber = sqrt(10)

    def residuals(g):
        p1c = sim3.apply(g, X2)
        z1 = jnp.maximum(p1c[..., 2], 1e-6)
        r1 = jnp.stack(
            [cam1.fx * p1c[..., 0] / z1 + cam1.cx - uv1[..., 0],
             cam1.fy * p1c[..., 1] / z1 + cam1.cy - uv1[..., 1]], -1,
        )
        p2c = sim3.apply(sim3.inverse(g), X1)
        z2 = jnp.maximum(p2c[..., 2], 1e-6)
        r2 = jnp.stack(
            [cam2.fx * p2c[..., 0] / z2 + cam2.cx - uv2[..., 0],
             cam2.fy * p2c[..., 1] / z2 + cam2.cy - uv2[..., 1]], -1,
        )
        return r1, r2

    def res_tangent(xi, g):
        if fix_scale:
            xi = xi.at[0].set(0.0)
        return residuals(sim3.compose(sim3.exp(xi), g))

    def chi2_of(g):
        r1, r2 = residuals(g)
        c1 = inv_sigma2_1 * jnp.sum(r1 * r1, -1)
        c2 = inv_sigma2_2 * jnp.sum(r2 * r2, -1)
        return c1, c2

    def lm_iter(state, _):
        g, lam, active = state
        J = jax.jacfwd(lambda xi: res_tangent(xi, g))(jnp.zeros(7))
        J1, J2 = J                                          # [N,2,7] each
        r1, r2 = residuals(g)
        c1, c2 = chi2_of(g)
        w1 = inv_sigma2_1 * robust.huber_weight(c1, delta2) * active
        w2 = inv_sigma2_2 * robust.huber_weight(c2, delta2) * active
        H = (jnp.einsum("n,nri,nrj->ij", w1, J1, J1)
             + jnp.einsum("n,nri,nrj->ij", w2, J2, J2))
        b = -(jnp.einsum("n,nri,nr->i", w1, J1, r1)
              + jnp.einsum("n,nri,nr->i", w2, J2, r2))
        D = jnp.diag(jnp.maximum(jnp.diag(H), 1e-6))
        dx = jnp.linalg.solve(H + lam * D, b)
        if fix_scale:
            dx = dx.at[0].set(0.0)
        g_new = sim3.compose(sim3.exp(dx), g)
        c1n, c2n = chi2_of(g_new)
        cost = jnp.sum(w1 * c1 + w2 * c2)
        cost_new = jnp.sum(w1 * c1n + w2 * c2n)
        accept = (cost_new < cost) & jnp.all(jnp.isfinite(dx))
        g_out = jnp.where(accept, g_new, g)
        lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e5)
        return (g_out, lam_out, active), None

    seed = valid if seed_inliers is None else (valid & seed_inliers)
    active0 = seed.astype(jnp.float32)
    (g, _, _), _ = jax.lax.scan(
        lm_iter, (g12, jnp.asarray(1e-3), active0), None, length=n_iters
    )
    # outlier removal + second pass (reference removes chi2 > 9.21 then
    # re-optimizes)
    c1, c2 = chi2_of(g)
    inl = valid & (c1 < 9.21) & (c2 < 9.21)
    (g, _, _), _ = jax.lax.scan(
        lm_iter, (g, jnp.asarray(1e-3), inl.astype(jnp.float32)), None,
        length=n_iters,
    )
    c1, c2 = chi2_of(g)
    inl = valid & (c1 < 9.21) & (c2 < 9.21)
    return g, inl, jnp.sum(inl.astype(jnp.int32))
