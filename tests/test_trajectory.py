"""Trajectory tests mirroring the reference's test_trajectory.cpp scenarios
(construction, interpolation at off-grid times, velocity integration) plus
re-anchoring against re-optimized keyframes."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core.trajectory import (
    append,
    empty_trajectory,
    integrate_velocity,
    pose_at_time,
    predict_pose,
    refresh,
    velocity_at_time,
)
from hyslam_tpu.geometry import se3


def straight_motion_traj(n=10, dt=0.5, v=(0.0, 0.0, 0.0, 1.0, 0.0, 0.0)):
    """Constant-velocity motion: frame i at t=i*dt, pose exp(i*dt*v)."""
    traj = empty_trajectory(64)
    v = jnp.asarray(v, jnp.float32)
    for i in range(n):
        t = i * dt
        Tcw = se3.exp(v * t)
        traj = append(traj, t, Tcw, 0, se3.identity(), True)
    return traj, v


class TestAppendAndVelocity:
    def test_velocity_recovered(self):
        traj, v = straight_motion_traj()
        vel = np.asarray(traj.vel[3])
        np.testing.assert_allclose(vel, np.asarray(v), atol=1e-4)

    def test_size(self):
        traj, _ = straight_motion_traj(7)
        assert int(traj.size) == 7


class TestPoseAtTime:
    def test_on_grid(self):
        traj, v = straight_motion_traj()
        T, ok = pose_at_time(traj, jnp.asarray([1.0]))
        assert bool(ok[0])
        np.testing.assert_allclose(
            np.asarray(T[0]), np.asarray(se3.exp(v * 1.0)), atol=1e-4
        )

    def test_off_grid_interpolation(self):
        traj, v = straight_motion_traj()
        T, ok = pose_at_time(traj, jnp.asarray([1.25, 3.75]))
        assert bool(ok.all())
        np.testing.assert_allclose(
            np.asarray(T[0]), np.asarray(se3.exp(v * 1.25)), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(T[1]), np.asarray(se3.exp(v * 3.75)), atol=1e-3
        )

    def test_out_of_range_flagged(self):
        traj, _ = straight_motion_traj()
        _, ok = pose_at_time(traj, jnp.asarray([100.0]))
        assert not bool(ok[0])

    def test_velocity_at_time(self):
        traj, v = straight_motion_traj()
        vel = velocity_at_time(traj, jnp.asarray([2.2]))
        np.testing.assert_allclose(np.asarray(vel[0]), np.asarray(v), atol=1e-4)


class TestIntegrateVelocity:
    def test_full_and_partial_intervals(self):
        traj, v = straight_motion_traj()
        # integrate over [1.0, 3.0]: expect exp(2*v)
        T = integrate_velocity(traj, jnp.asarray(1.0), jnp.asarray(3.0))
        np.testing.assert_allclose(
            np.asarray(T), np.asarray(se3.exp(v * 2.0)), atol=1e-3
        )
        # partial interval [1.25, 1.75]
        T = integrate_velocity(traj, jnp.asarray(1.25), jnp.asarray(1.75))
        np.testing.assert_allclose(
            np.asarray(T), np.asarray(se3.exp(v * 0.5)), atol=1e-3
        )


class TestRefresh:
    def test_reanchoring_follows_optimized_kf(self):
        # frames anchored to KF0; KF0's pose then gets "optimized" (shifted)
        traj = empty_trajectory(16)
        kf_Tcw = jnp.tile(jnp.eye(4, dtype=jnp.float32), (4, 1, 1))
        for i in range(5):
            Tcw = se3.exp(jnp.asarray([0, 0, 0, 0.1 * i, 0, 0], jnp.float32))
            traj = append(traj, float(i), Tcw, 0, kf_Tcw[0], True)
        shift = se3.exp(jnp.asarray([0, 0, 0, 0, 0.7, 0], jnp.float32))
        kf_new = kf_Tcw.at[0].set(shift @ kf_Tcw[0])
        traj2 = refresh(
            traj, kf_new, jnp.zeros(4, bool), jnp.full(4, -1, jnp.int32)
        )
        for i in range(5):
            expect = (
                se3.exp(jnp.asarray([0, 0, 0, 0.1 * i, 0, 0], jnp.float32)) @ shift
            )
            np.testing.assert_allclose(
                np.asarray(traj2.Tcw[i]), np.asarray(expect), atol=1e-5
            )

    def test_bad_ref_walks_to_parent(self):
        traj = empty_trajectory(16)
        kf_Tcw = jnp.tile(jnp.eye(4, dtype=jnp.float32), (4, 1, 1))
        traj = append(traj, 0.0, se3.identity(), 1, kf_Tcw[1], True)
        bad = jnp.asarray([False, True, False, False])
        parent = jnp.asarray([-1, 0, 1, 2], jnp.int32)
        shift = se3.exp(jnp.asarray([0, 0, 0, 0.5, 0, 0], jnp.float32))
        kf_new = kf_Tcw.at[0].set(shift)
        traj2 = refresh(traj, kf_new, bad, parent)
        # ref 1 is bad -> falls back to parent 0 whose pose is `shift`
        np.testing.assert_allclose(
            np.asarray(traj2.Tcw[0]), np.asarray(shift), atol=1e-5
        )


class TestPredict:
    def test_constant_velocity_extrapolation(self):
        traj, v = straight_motion_traj()
        T = predict_pose(traj, jnp.asarray(5.0))  # last frame at t=4.5
        np.testing.assert_allclose(
            np.asarray(T), np.asarray(se3.exp(v * 5.0)), atol=1e-3
        )
