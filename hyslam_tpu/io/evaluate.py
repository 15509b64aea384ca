"""Trajectory evaluation: ATE / RPE in the TUM-benchmark sense.

ATE: Horn-align (SE3, or Sim3 for mono) estimated camera centers to ground
truth, RMSE of residual translations. RPE: per-delta relative pose error.
Used by the benchmark harness and integration tests (BASELINE.md metrics)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.geometry import se3, sim3
from hyslam_tpu.geometry.horn import horn_se3, horn_sim3


def camera_centers(Tcw: np.ndarray) -> np.ndarray:
    """[N,4,4] world->cam -> [N,3] camera centers."""
    R = Tcw[:, :3, :3]
    t = Tcw[:, :3, 3]
    return -np.einsum("nji,nj->ni", R, t)


def ate_rmse(est_Tcw: np.ndarray, gt_Tcw: np.ndarray,
             align: str = "se3") -> float:
    """Absolute trajectory error after alignment ('none'|'se3'|'sim3')."""
    pe = camera_centers(np.asarray(est_Tcw))
    pg = camera_centers(np.asarray(gt_Tcw))
    if align == "se3":
        T = np.asarray(horn_se3(jnp.asarray(pe), jnp.asarray(pg)))
        pe = pe @ T[:3, :3].T + T[:3, 3]
    elif align == "sim3":
        g = horn_sim3(jnp.asarray(pe), jnp.asarray(pg))
        pe = np.asarray(sim3.apply(g, jnp.asarray(pe)))
    d = pe - pg
    return float(np.sqrt(np.mean(np.sum(d * d, axis=-1))))


def rpe(est_Tcw: np.ndarray, gt_Tcw: np.ndarray, delta: int = 1):
    """Relative pose error over a fixed frame delta: returns
    (trans RMSE, rot RMSE deg)."""
    est = np.asarray(est_Tcw)
    gt = np.asarray(gt_Tcw)
    n = len(est) - delta
    terr, rerr = [], []
    for i in range(n):
        de = est[i + delta] @ np.linalg.inv(est[i])
        dg = gt[i + delta] @ np.linalg.inv(gt[i])
        e = de @ np.linalg.inv(dg)
        terr.append(np.linalg.norm(e[:3, 3]))
        c = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerr.append(np.degrees(np.arccos(c)))
    return float(np.sqrt(np.mean(np.square(terr)))), float(
        np.sqrt(np.mean(np.square(rerr))))
