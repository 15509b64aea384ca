"""Distributed bundle adjustment: landmark-sharded Schur reduction over psum.

The multi-host scale-out of the BA solver (BASELINE.json north star):
keyframe poses are replicated (small), the landmark axis of the observation
blocks is sharded over the mesh 'lm' axis. Each device linearizes its
landmark slice, contributes partial (Hpp, b_pose, S_red, b_red) which are
reduced with psum over ICI, the dense reduced camera system is solved
replicated, and landmark back-substitution stays shard-local. One LM
iteration is therefore: local einsums + one psum of a [6K, 6K] + [K, 6]
pair + replicated Cholesky-class solve — the communication volume is
independent of the number of landmarks/observations.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hyslam_tpu.geometry import se3
from hyslam_tpu.solver import robust
from hyslam_tpu.solver.ba import (
    BAProblem,
    BAResult,
    _backsub,
    _linearize_factors,
    _reduced_rhs,
    _schur_reduce_dense,
    _obs_residuals,
    _robust_cost,
    _solve_poses,
    _solve_poses_cg,
)
from hyslam_tpu.solver.priors import (
    PosePriors,
    linearize_priors_blocks,
    prior_cost,
    tie_offdiag_dense,
)


def ba_problem_spec(p: BAProblem) -> BAProblem:
    """PartitionSpec tree for a BAProblem under the 'lm' mesh axis: poses
    and cameras replicated, landmark/observation blocks sharded. Exposed so
    multi-process drivers can build global arrays with the same layout
    (jax.make_array_from_callback) before calling
    distributed_bundle_adjustment."""
    rep = P()
    lm = P("lm")
    return BAProblem(
        kf_Tcw=rep, kf_fixed=rep,
        cams=type(p.cams)(*([rep] * len(p.cams))),
        lm_pos=lm, lm_valid=lm,
        obs=type(p.obs)(*([lm] * len(p.obs))),
        priors=None if p.priors is None
        else PosePriors(*([rep] * len(p.priors))),
    )


def distributed_bundle_adjustment(
    p: BAProblem,
    mesh: Mesh,
    n_iters: int = 10,
    huber: bool = True,
    chunk: int = 256,
    lam0: float = 1e-4,
    solver: str = "auto",
) -> BAResult:
    """LM bundle adjustment with the landmark axis sharded over mesh('lm').

    Requires p.lm_pos.shape[0] divisible by the 'lm' axis size. Produces the
    same result as solver.ba.bundle_adjustment (up to reduction order).

    solver 'dense' psums a replicated [6K,6K] reduced system per LM
    iteration; 'cg' runs distributed matrix-free PCG where every S-product
    psums only a [K,6] — per-iteration communication drops from O(K^2) to
    O(K) and no device ever holds a [6K,6K] (the keyframe-scale path,
    SURVEY §2.10 north star). 'auto' switches to cg at K >= 512."""
    if solver == "auto":
        solver = "cg" if p.kf_Tcw.shape[0] >= 512 else "dense"
    n_shards = mesh.shape["lm"]
    L = p.lm_pos.shape[0]
    assert L % n_shards == 0, f"L={L} not divisible by lm axis {n_shards}"

    prob_spec = ba_problem_spec(p)
    rep = P()
    lm = P("lm")

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(prob_spec,),
        out_specs=(rep, lm, lm, lm, rep),
        check_vma=False,
    )
    def run(pl: BAProblem):
        obs_active = pl.obs.valid
        # priors are pose-only and replicated: keep them out of the
        # shard-local cost/linearization (they would be multiplied by the
        # shard count under psum) and add them once after the reduction
        pl_noprior = pl._replace(priors=None)

        def cost_of(kf_Tcw, lm_pos):
            local = _robust_cost(pl_noprior, kf_Tcw, lm_pos, huber)
            total = jax.lax.psum(local, "lm")
            if pl.priors is not None:
                total = total + prior_cost(kf_Tcw, pl.priors)
            return total

        def step(state, _):
            kf_Tcw, lm_pos, lam, cost = state
            K = kf_Tcw.shape[0]
            Hpp, b_pose, Y, yv, Vinv, Wlo, b_lm, kf_idx = _linearize_factors(
                pl, kf_Tcw, lm_pos, lam, obs_active, huber
            )
            # reduce the pose blocks over landmark shards
            Hpp = jax.lax.psum(Hpp, "lm")
            b_pose = jax.lax.psum(b_pose, "lm")
            Hab = None
            if pl.priors is not None:
                Hd_pr, b_pr, Hab = linearize_priors_blocks(kf_Tcw, pl.priors)
                Hpp = Hpp + Hd_pr
                b_pose = b_pose + b_pr
            if solver == "cg":
                # matrix-free distributed PCG: Y stays shard-local; each
                # S-product psums a [K,6] over ICI
                b_red = _reduced_rhs(Y, yv, kf_idx, K)
                delta_pose = _solve_poses_cg(
                    Hpp, b_pose, b_red, Y, kf_idx, pl.kf_fixed, lam,
                    priors=pl.priors, Hab=Hab, psum_axis="lm",
                )
            else:
                S_red, b_red = _schur_reduce_dense(Y, yv, kf_idx, K, chunk)
                # the [6K,6K] collective at the heart of dense distributed BA
                S_red = jax.lax.psum(S_red, "lm")
                b_red = jax.lax.psum(b_red, "lm")
                if pl.priors is not None:
                    S_red = S_red - tie_offdiag_dense(
                        pl.priors, Hab, K, Hpp.dtype)
                delta_pose = _solve_poses(Hpp, b_pose, S_red, b_red,
                                          pl.kf_fixed, lam)
            delta_lm = _backsub(Vinv, Wlo, b_lm, kf_idx, delta_pose, pl.lm_valid)

            kf_new = se3.exp(delta_pose) @ kf_Tcw
            kf_new = jnp.where(pl.kf_fixed[:, None, None], kf_Tcw, kf_new)
            lm_new = lm_pos + delta_lm
            new_cost = cost_of(kf_new, lm_new)
            accept = new_cost < cost
            kf_out = jnp.where(accept, kf_new, kf_Tcw)
            lm_out = jnp.where(accept, lm_new, lm_pos)
            lam_out = jnp.clip(jnp.where(accept, lam * 0.5, lam * 4.0), 1e-9, 1e4)
            return (kf_out, lm_out, lam_out, jnp.minimum(new_cost, cost)), None

        cost0 = cost_of(pl.kf_Tcw, pl.lm_pos)
        init = (pl.kf_Tcw, pl.lm_pos, jnp.asarray(lam0, pl.kf_Tcw.dtype), cost0)
        (kf_Tcw, lm_pos, _, cost), _ = jax.lax.scan(step, init, None, length=n_iters)

        r, pc, _, _ = _obs_residuals(pl, kf_Tcw, lm_pos)
        c2 = pl.obs.inv_sigma2 * jnp.sum(r * r, axis=-1)
        th = jnp.where(pl.obs.stereo, robust.CHI2_STEREO, robust.CHI2_MONO)
        inlier = pl.obs.valid & (c2 <= th) & (pc[..., 2] > 0.0)
        return kf_Tcw, lm_pos, inlier, c2, cost

    kf_Tcw, lm_pos, inlier, c2, cost = jax.jit(run)(p)
    return BAResult(
        kf_Tcw=kf_Tcw, lm_pos=lm_pos, obs_chi2=c2, obs_inlier=inlier, cost=cost
    )
