"""Numeric unit tests for the geometry core (SURVEY.md §4: SE3/Sim3 ops,
interpolation, Horn, triangulation verified against first-principles values)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyslam_tpu.geometry import se3, sim3, so3
from hyslam_tpu.geometry.camera import (
    Camera,
    backproject,
    depth_from_disparity,
    in_image,
    project,
    project_stereo,
)
from hyslam_tpu.geometry.horn import horn_se3, horn_sim3
from hyslam_tpu.geometry.triangulation import projection_matrix, triangulate_dlt

ATOL = 2e-4  # float32 end-to-end


def random_rotvecs(rng, n, max_angle=np.pi - 0.1):
    axis = rng.normal(size=(n, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    ang = rng.uniform(-max_angle, max_angle, size=(n, 1))
    return (axis * ang).astype(np.float32)


class TestSO3:
    def test_exp_log_roundtrip(self, rng):
        w = random_rotvecs(rng, 64)
        w2 = so3.log(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(np.asarray(w2), w, atol=1e-2)  # f32, angles to pi
        # tight tolerance away from pi
        w = random_rotvecs(rng, 64, max_angle=2.0)
        w2 = so3.log(so3.exp(jnp.asarray(w)))
        np.testing.assert_allclose(np.asarray(w2), w, atol=ATOL)

    def test_exp_small_angle(self):
        w = jnp.array([[1e-9, -1e-9, 1e-10], [0.0, 0.0, 0.0]])
        R = so3.exp(w)
        np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
        assert np.all(np.isfinite(np.asarray(R)))
        # gradient must be finite at zero
        g = jax.grad(lambda x: jnp.sum(so3.exp(x)))(jnp.zeros(3))
        assert np.all(np.isfinite(np.asarray(g)))

    def test_log_near_pi(self, rng):
        w = random_rotvecs(rng, 16, max_angle=np.pi - 1e-4)
        w = w / np.linalg.norm(w, axis=-1, keepdims=True) * (np.pi - 1e-3)
        R = so3.exp(jnp.asarray(w))
        w2 = np.asarray(so3.log(R))
        np.testing.assert_allclose(w2, w, atol=5e-3)

    def test_quat_mat_consistency(self, rng):
        w = random_rotvecs(rng, 32)
        R = so3.exp(jnp.asarray(w))
        q = so3.quat_from_mat(R)
        R2 = so3.mat_from_quat(q)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=ATOL)
        np.testing.assert_allclose(
            np.asarray(jnp.linalg.norm(q, axis=-1)), 1.0, atol=1e-5
        )

    def test_quat_mul_matches_mat_mul(self, rng):
        wa = jnp.asarray(random_rotvecs(rng, 8))
        wb = jnp.asarray(random_rotvecs(rng, 8))
        Ra, Rb = so3.exp(wa), so3.exp(wb)
        q = so3.quat_mul(so3.quat_from_mat(Ra), so3.quat_from_mat(Rb))
        np.testing.assert_allclose(
            np.asarray(so3.mat_from_quat(q)), np.asarray(Ra @ Rb), atol=ATOL
        )

    def test_rotation_action(self):
        # 90 deg about z maps x->y
        R = so3.exp(jnp.array([0.0, 0.0, np.pi / 2]))
        v = R @ jnp.array([1.0, 0.0, 0.0])
        np.testing.assert_allclose(np.asarray(v), [0.0, 1.0, 0.0], atol=1e-6)

    def test_left_jacobian_inverse(self, rng):
        w = jnp.asarray(random_rotvecs(rng, 16))
        J = so3.left_jacobian(w)
        Ji = so3.left_jacobian_inv(w)
        eye = np.broadcast_to(np.eye(3), (16, 3, 3))
        np.testing.assert_allclose(np.asarray(J @ Ji), eye, atol=1e-4)


class TestSE3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [random_rotvecs(rng, 64), rng.normal(size=(64, 3)).astype(np.float32)],
            axis=-1,
        )
        xi2 = se3.log(se3.exp(jnp.asarray(xi)))
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=1e-2)  # f32, to pi
        xi = xi * 0.5
        xi2 = se3.log(se3.exp(jnp.asarray(xi)))
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=5e-4)

    def test_compose_inverse(self, rng):
        xi = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
        T = se3.exp(xi)
        eye = np.broadcast_to(np.eye(4), (8, 4, 4))
        np.testing.assert_allclose(
            np.asarray(se3.compose(T, se3.inverse(T))), eye, atol=1e-5
        )

    def test_apply(self):
        T = se3.from_Rt(so3.exp(jnp.array([0, 0, np.pi / 2])), jnp.array([1.0, 2.0, 3.0]))
        p = se3.apply(T, jnp.array([1.0, 0.0, 0.0]))
        np.testing.assert_allclose(np.asarray(p), [1.0, 3.0, 3.0], atol=1e-6)

    def test_interpolate_endpoints_and_midpoint(self, rng):
        T0 = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.3))
        T1 = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.3))
        np.testing.assert_allclose(
            np.asarray(se3.interpolate(T0, T1, 0.0)), np.asarray(T0), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(se3.interpolate(T0, T1, 1.0)), np.asarray(T1), atol=1e-4
        )
        # midpoint is geodesic: delta(T_mid, T0) == delta(T1, T_mid)
        Tm = se3.interpolate(T0, T1, 0.5)
        d0 = se3.log(Tm @ se3.inverse(T0))
        d1 = se3.log(T1 @ se3.inverse(Tm))
        np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-4)

    def test_adjoint_identity(self, rng):
        # Ad(T) xi == log(T exp(xi) T^-1) for small xi
        T = se3.exp(jnp.asarray(rng.normal(size=6).astype(np.float32) * 0.5))
        xi = jnp.asarray(rng.normal(size=6).astype(np.float32) * 1e-3)
        lhs = se3.adjoint(T) @ xi
        rhs = se3.log(T @ se3.exp(xi) @ se3.inverse(T))
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-6)


class TestSim3:
    def test_exp_log_roundtrip(self, rng):
        xi = np.concatenate(
            [
                rng.uniform(-0.5, 0.5, size=(32, 1)),
                random_rotvecs(rng, 32, max_angle=2.5),
                rng.normal(size=(32, 3)),
            ],
            axis=-1,
        ).astype(np.float32)
        xi2 = sim3.log(sim3.exp(jnp.asarray(xi)))
        np.testing.assert_allclose(np.asarray(xi2), xi, atol=2e-3)

    def test_exp_zero(self):
        g = sim3.exp(jnp.zeros(7))
        np.testing.assert_allclose(np.asarray(g), np.asarray(sim3.identity()), atol=1e-6)

    def test_compose_inverse_apply(self, rng):
        a = sim3.exp(jnp.asarray(rng.normal(size=7).astype(np.float32) * 0.3))
        b = sim3.exp(jnp.asarray(rng.normal(size=7).astype(np.float32) * 0.3))
        p = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        # (a o b)(p) == a(b(p))
        np.testing.assert_allclose(
            np.asarray(sim3.apply(sim3.compose(a, b), p)),
            np.asarray(sim3.apply(a, sim3.apply(b, p))),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(sim3.apply(sim3.compose(a, sim3.inverse(a)), p)),
            np.asarray(p),
            atol=1e-4,
        )

    def test_matches_explicit_action(self, rng):
        s = 1.7
        R = so3.exp(jnp.array([0.1, -0.2, 0.3]))
        t = jnp.array([1.0, -2.0, 0.5])
        g = sim3.pack(jnp.asarray(s), R, t)
        p = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
        expected = s * (p @ np.asarray(R).T) + np.asarray(t)
        np.testing.assert_allclose(np.asarray(sim3.apply(g, p)), expected, atol=1e-5)


class TestHorn:
    def test_recovers_known_sim3(self, rng):
        s = 2.3
        R = so3.exp(jnp.array([0.3, 0.1, -0.4]))
        t = jnp.array([1.0, 2.0, -0.5])
        x = jnp.asarray(rng.normal(size=(50, 3)).astype(np.float32))
        y = s * x @ R.T + t
        g = horn_sim3(x, y)
        gs, gR, gt = sim3.unpack(g)
        np.testing.assert_allclose(float(gs), s, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gR), np.asarray(R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(t), atol=1e-3)

    def test_fixed_scale(self, rng):
        R = so3.exp(jnp.array([0.3, 0.1, -0.4]))
        t = jnp.array([1.0, 2.0, -0.5])
        x = jnp.asarray(rng.normal(size=(30, 3)).astype(np.float32))
        y = x @ R.T + t
        T = horn_se3(x, y)
        np.testing.assert_allclose(
            np.asarray(se3.apply(T, x)), np.asarray(y), atol=1e-4
        )

    def test_weights_ignore_outliers(self, rng):
        R = so3.exp(jnp.array([0.2, -0.1, 0.05]))
        t = jnp.array([0.5, 0.0, 1.0])
        x = jnp.asarray(rng.normal(size=(40, 3)).astype(np.float32))
        y = np.array(x @ R.T + t)
        y[:5] += 100.0  # gross outliers
        w = np.ones(40, np.float32)
        w[:5] = 0.0
        g = horn_sim3(x, jnp.asarray(y), weights=jnp.asarray(w), fix_scale=True)
        _, gR, gt = sim3.unpack(g)
        np.testing.assert_allclose(np.asarray(gR), np.asarray(R), atol=1e-4)
        np.testing.assert_allclose(np.asarray(gt), np.asarray(t), atol=1e-3)

    def test_minimal_three_points(self, rng):
        # Sim3Solver operates on 3-point minimal sets (Sim3Solver.h:33)
        R = so3.exp(jnp.array([0.5, 0.2, -0.1]))
        t = jnp.array([1.0, -1.0, 2.0])
        s = 0.7
        x = jnp.asarray(rng.normal(size=(3, 3)).astype(np.float32))
        y = s * x @ R.T + t
        g = horn_sim3(x, y)
        np.testing.assert_allclose(
            np.asarray(sim3.apply(g, x)), np.asarray(y), atol=1e-4
        )


class TestCamera:
    CAM = Camera(fx=500.0, fy=500.0, cx=320.0, cy=240.0, width=640, height=480, bf=50.0)

    def test_project_backproject_roundtrip(self, rng):
        pts = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-1, 1, 100),
                    rng.uniform(-1, 1, 100),
                    rng.uniform(1.0, 10.0, 100),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        uv, z = project(self.CAM, pts)
        back = backproject(self.CAM, uv, z)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_stereo_disparity_depth(self):
        pts = jnp.array([[0.0, 0.0, 5.0]])
        uv, ur, z = project_stereo(self.CAM, pts)
        zz, ok = depth_from_disparity(self.CAM, uv[..., 0], ur)
        assert bool(ok[0])
        np.testing.assert_allclose(float(zz[0]), 5.0, rtol=1e-5)

    def test_in_image(self):
        uv = jnp.array([[0.0, 0.0], [-1.0, 10.0], [639.5, 479.5], [640.0, 100.0]])
        m = np.asarray(in_image(self.CAM, uv))
        assert list(m) == [True, False, True, False]

    def test_close_depth(self):
        assert abs(self.CAM.baseline - 0.1) < 1e-9
        assert abs(self.CAM.close_depth - 3.5) < 1e-6


class TestTriangulation:
    def test_dlt_exact(self, rng):
        cam = TestCamera.CAM
        K = cam.K()
        T1 = se3.identity()
        T2 = se3.from_Rt(so3.exp(jnp.array([0.0, 0.05, 0.0])), jnp.array([-0.5, 0.0, 0.0]))
        X = jnp.asarray(
            np.stack(
                [
                    rng.uniform(-2, 2, 64),
                    rng.uniform(-2, 2, 64),
                    rng.uniform(4.0, 20.0, 64),
                ],
                axis=-1,
            ).astype(np.float32)
        )
        uv1, _ = project(cam, se3.apply(T1, X))
        uv2, _ = project(cam, se3.apply(T2, X))
        P1 = projection_matrix(K, T1)
        P2 = projection_matrix(K, T2)
        Xhat = triangulate_dlt(P1, P2, uv1, uv2)
        np.testing.assert_allclose(np.asarray(Xhat), np.asarray(X), atol=2e-2)

    def test_dlt_with_noise_reprojects(self, rng):
        cam = TestCamera.CAM
        K = cam.K()
        T1 = se3.identity()
        T2 = se3.from_Rt(jnp.eye(3), jnp.array([-0.5, 0.0, 0.0]))
        X = jnp.array([[0.3, -0.2, 8.0]])
        uv1, _ = project(cam, se3.apply(T1, X))
        uv2, _ = project(cam, se3.apply(T2, X))
        uv1 = uv1 + 0.5
        uv2 = uv2 - 0.5
        Xhat = triangulate_dlt(projection_matrix(K, T1), projection_matrix(K, T2), uv1, uv2)
        ruv, _ = project(cam, se3.apply(T1, Xhat))
        assert float(jnp.linalg.norm(ruv - uv1)) < 2.0


@pytest.mark.parametrize("fn_batch", [(so3.exp, (7, 3)), (se3.exp, (7, 6)), (sim3.exp, (7, 7))])
def test_jit_and_vmap(fn_batch, rng):
    fn, shape = fn_batch
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 0.3)
    a = jax.jit(fn)(x)
    b = jax.vmap(fn)(x)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
