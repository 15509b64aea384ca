"""PnP-RANSAC tests: recover a known absolute pose from 3D-2D matches with
outliers, then refine."""

import numpy as np
import jax
import jax.numpy as jnp

from hyslam_tpu.estimators.pnp import pnp_ransac, pnp_ransac_refined
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import project

from helpers import DEFAULT_CAM, make_world, pose_error


def scene(rng, n=200, outlier_frac=0.3, noise=0.5):
    cam = DEFAULT_CAM
    pts = make_world(rng, n, extent=(6.0, 4.0, 12.0), z_min=3.0)
    T_true = np.asarray(se3.exp(jnp.asarray(
        [0.1, -0.15, 0.05, 0.4, -0.2, 0.6], jnp.float32)))
    uv, z = project(cam, se3.apply(jnp.asarray(T_true), jnp.asarray(pts)))
    uv = np.array(uv) + rng.normal(0, noise, (n, 2))
    valid = np.asarray(z) > 0.3
    n_out = int(outlier_frac * n)
    bad = rng.choice(n, n_out, replace=False)
    uv[bad] += rng.uniform(40, 200, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    return cam, pts, uv.astype(np.float32), valid, T_true, bad


class TestPnP:
    def test_recovers_pose_with_outliers(self, rng):
        cam, pts, uv, valid, T_true, bad = scene(rng)
        T, inl, n = pnp_ransac(
            cam, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts)),
            jnp.asarray(valid), jax.random.PRNGKey(0),
        )
        assert int(n) > 0.5 * valid.sum()
        rot, tr = pose_error(np.asarray(T), T_true)
        assert rot < 1.0 and tr < 0.1, (rot, tr)
        inl = np.asarray(inl)
        assert (~inl[bad] | ~valid[bad]).mean() > 0.9

    def test_refined_is_tight(self, rng):
        cam, pts, uv, valid, T_true, _ = scene(rng, noise=0.3)
        T, inl, n = pnp_ransac_refined(
            cam, jnp.asarray(pts), jnp.asarray(uv), jnp.ones(len(pts)),
            jnp.asarray(valid), jax.random.PRNGKey(1),
        )
        rot, tr = pose_error(np.asarray(T), T_true)
        assert rot < 0.15 and tr < 0.02, (rot, tr)
