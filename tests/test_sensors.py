"""Sensor-fusion priors: SensorData arena, GPS/IMU/depth/tiepoint residual
blocks, and their effect inside bundle adjustment
(reference behavior: BundleAdjustment.cc:60-201, SE3_sensor_edges.h)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hyslam_tpu.core.sensordata import (
    SensorData, empty_sensor_arena, latlon_to_relative, set_sensor,
)
from hyslam_tpu.geometry import se3, so3
from hyslam_tpu.solver.ba import (
    BAObservations, BAProblem, CamArrays, bundle_adjustment,
)
from hyslam_tpu.solver.priors import (
    PosePriors, empty_pose_priors, linearize_priors, prior_cost,
)


def _rand_pose(rng, scale=0.3):
    w = rng.normal(0, scale, 3)
    v = rng.normal(0, scale, 3)
    return np.asarray(se3.exp(jnp.asarray(np.concatenate([w, v]),
                                          jnp.float32)))


def _toy_problem(K=4, L=64, O=4, seed=0, priors=None):
    rng = np.random.default_rng(seed)
    fx = fy = 400.0
    cx, cy, bf = 320.0, 240.0, 40.0
    pts = np.stack([rng.uniform(-3, 3, L), rng.uniform(-2, 2, L),
                    rng.uniform(4, 10, L)], -1).astype(np.float32)
    kf_T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    for k in range(K):
        kf_T[k, 0, 3] = 0.15 * k
    obs_kf = rng.integers(0, K, (L, O)).astype(np.int32)
    pc = np.einsum("loij,lj->loi", kf_T[obs_kf][..., :3, :3], pts) + \
        kf_T[obs_kf][..., :3, 3]
    z = np.maximum(pc[..., 2], 0.5)
    uv = np.stack([fx * pc[..., 0] / z + cx, fy * pc[..., 1] / z + cy],
                  -1).astype(np.float32)
    ur = (uv[..., 0] - bf / z).astype(np.float32)
    return BAProblem(
        kf_Tcw=jnp.asarray(kf_T),
        kf_fixed=jnp.asarray(np.arange(K) < 1),
        cams=CamArrays(fx=jnp.full(K, fx), fy=jnp.full(K, fy),
                       cx=jnp.full(K, cx), cy=jnp.full(K, cy),
                       bf=jnp.full(K, bf)),
        lm_pos=jnp.asarray(pts),
        lm_valid=jnp.ones(L, bool),
        obs=BAObservations(
            kf=jnp.asarray(obs_kf), uv=jnp.asarray(uv), ur=jnp.asarray(ur),
            inv_sigma2=jnp.ones((L, O), jnp.float32),
            stereo=jnp.ones((L, O), bool),
            valid=jnp.ones((L, O), bool),
        ),
        priors=priors,
    ), kf_T, pts


class TestSensorArena:
    def test_set_and_read(self):
        a = empty_sensor_arena(8)
        sd = SensorData(gps_rel=(1, 2, 3), gps_err=(0.5, 0.5, 1.0),
                        gps_valid=True, quat=(0.0, 1.0, 0.0, 0.0),
                        quat_valid=True, depth=-4.2, depth_valid=True)
        a = set_sensor(a, 3, sd)
        assert bool(a.gps_valid[3]) and not bool(a.gps_valid[2])
        np.testing.assert_allclose(np.asarray(a.gps[3]), [1, 2, 3])
        assert float(a.depth[3]) == pytest.approx(-4.2, abs=1e-6)

    def test_latlon_to_relative(self):
        # 1e-3 deg of latitude ~ 111.13 m of northing near the equator
        rel = latlon_to_relative(0.001, 0.0, 5.0, 0.0, 0.0, 0.0)
        assert rel[1] == pytest.approx(110.57, rel=0.01)
        assert rel[0] == pytest.approx(0.0, abs=1e-6)
        assert rel[2] == pytest.approx(5.0)


class TestPriorResiduals:
    def test_zero_at_measurement(self):
        rng = np.random.default_rng(1)
        K = 3
        T = np.stack([_rand_pose(rng) for _ in range(K)]).astype(np.float32)
        centers = np.einsum("kji,kj->ki", -T[:, :3, :3].transpose(0, 2, 1),
                            np.zeros((K, 3)))  # placeholder
        centers = np.stack([-T[k, :3, :3].T @ T[k, :3, 3] for k in range(K)])
        quats = np.asarray(so3.quat_from_mat(jnp.asarray(T[:, :3, :3])))
        pr = empty_pose_priors(K, E=1)._replace(
            gps_pos=jnp.asarray(centers.astype(np.float32)),
            gps_info=jnp.ones((K, 3), jnp.float32),
            gps_valid=jnp.ones(K, bool),
            imu_quat=jnp.asarray(quats),
            imu_info=jnp.ones(K, jnp.float32),
            imu_valid=jnp.ones(K, bool),
            depth=jnp.asarray(T[:, 2, 3]),
            depth_info=jnp.ones(K, jnp.float32),
            depth_valid=jnp.ones(K, bool),
            tie_a=jnp.asarray([0]), tie_b=jnp.asarray([1]),
            tie_T=jnp.asarray((T[1] @ np.linalg.inv(T[0]))[None]),
            tie_info=jnp.ones(1, jnp.float32),
            tie_valid=jnp.ones(1, bool),
        )
        c = float(prior_cost(jnp.asarray(T), pr))
        assert c == pytest.approx(0.0, abs=1e-8)
        Hd, Hoff, b = linearize_priors(jnp.asarray(T), pr)
        # gradient vanishes at the measurement
        np.testing.assert_allclose(np.asarray(b), 0.0, atol=1e-5)
        # tie edge produces symmetric off-diagonal coupling
        Hoff = np.asarray(Hoff)
        blk01 = Hoff[0:6, 6:12]
        blk10 = Hoff[6:12, 0:6]
        np.testing.assert_allclose(blk01, blk10.T, atol=1e-5)
        assert np.abs(blk01).max() > 0

    def test_cost_positive_away_from_measurement(self):
        K = 2
        T = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        pr = empty_pose_priors(K)._replace(
            depth=jnp.asarray([0.5, 0.0]),
            depth_info=jnp.asarray([2.0, 2.0]),
            depth_valid=jnp.asarray([True, False]),
        )
        # r = t_z - d = -0.5 on KF0 only -> cost = 2 * 0.25
        assert float(prior_cost(jnp.asarray(T), pr)) == pytest.approx(0.5)


class TestPriorsInBA:
    def test_gps_prior_pulls_free_pose(self):
        """A pose with a strong GPS prior and no fixed anchoring moves
        toward the measured center."""
        prob, kf_T, _ = _toy_problem()
        K = kf_T.shape[0]
        target = np.array([0.0, 0.0, -0.3], np.float32)  # true center of KF3
        # perturb KF3, ask GPS to pull its center to a shifted target
        centers = np.stack(
            [-kf_T[k, :3, :3].T @ kf_T[k, :3, 3] for k in range(K)]
        ).astype(np.float32)
        shifted = centers.copy()
        shifted[3] += [0.05, 0.0, 0.0]
        pr = empty_pose_priors(K)._replace(
            gps_pos=jnp.asarray(shifted),
            gps_info=jnp.full((K, 3), 1e6, jnp.float32),
            gps_valid=jnp.asarray([False, False, False, True]),
        )
        res = bundle_adjustment(prob._replace(priors=pr), n_iters=15,
                                huber=False)
        Tout = np.asarray(res.kf_Tcw)
        c3 = -Tout[3, :3, :3].T @ Tout[3, :3, 3]
        # strong prior wins against reprojection: center lands near target
        assert np.linalg.norm(c3 - shifted[3]) < 0.02
        # un-priored poses shift only slightly (dragged via shared
        # landmarks, far less than the 5 cm prior pull)
        c1 = -Tout[1, :3, :3].T @ Tout[1, :3, 3]
        assert np.linalg.norm(c1 - centers[1]) < 0.03

    def test_tie_edge_constrains_disconnected_pose(self):
        """Tiepoint SE3 edge holds a pose that has no observations at all —
        the submap-origin scenario (SetSubMapOriginEdges)."""
        prob, kf_T, _ = _toy_problem()
        K = kf_T.shape[0]
        # cut all observations of KF3 and perturb it
        obs_kf = np.asarray(prob.obs.kf)
        keep = obs_kf != 3
        prob = prob._replace(obs=prob.obs._replace(
            valid=prob.obs.valid & jnp.asarray(keep)))
        T_pert = kf_T.copy()
        T_pert[3] = _rand_pose(np.random.default_rng(7), 0.1) @ kf_T[3]
        M_meas = (kf_T[3] @ np.linalg.inv(kf_T[0])).astype(np.float32)
        pr = empty_pose_priors(K, E=1)._replace(
            tie_a=jnp.asarray([0]), tie_b=jnp.asarray([3]),
            tie_T=jnp.asarray(M_meas[None]),
            tie_info=jnp.full(1, 1e4, jnp.float32),
            tie_valid=jnp.ones(1, bool),
        )
        res = bundle_adjustment(
            prob._replace(kf_Tcw=jnp.asarray(T_pert), priors=pr),
            n_iters=20, huber=False,
        )
        err = np.asarray(res.kf_Tcw[3]) - kf_T[3]
        assert np.abs(err).max() < 1e-2

    def test_priors_none_matches_baseline(self):
        """priors=None takes the exact pre-existing code path."""
        prob, _, _ = _toy_problem()
        r0 = bundle_adjustment(prob, n_iters=3)
        r1 = bundle_adjustment(prob._replace(priors=None), n_iters=3)
        np.testing.assert_allclose(np.asarray(r0.kf_Tcw),
                                   np.asarray(r1.kf_Tcw))


class TestSensorFusionBuilder:
    def test_build_priors_gps_horn(self):
        """build_pose_priors fits the GPS->SLAM Horn alignment on centers
        and transforms measurements into the SLAM frame."""
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
        from hyslam_tpu.core import mapstate as M
        from hyslam_tpu.io.config import OptimizerInfo
        from hyslam_tpu.slam.sensor_fusion import build_pose_priors
        from hyslam_tpu.core.frame import empty_features

        caps = MapCaps(K=8, L=64, F=32, O=4)
        ms = empty_map_state(caps)
        arena = empty_sensor_arena(caps.K)
        rng = np.random.default_rng(3)
        # 6 keyframes on a line; GPS frame = SLAM frame rotated 90deg about z
        Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
        feats = empty_features(caps.F)
        for k in range(6):
            Tcw = np.eye(4, dtype=np.float32)
            Tcw[:3, 3] = [-k * 1.0, 0, 0]       # center at (k, 0, 0)
            ms, kf_id = M.add_keyframe(
                ms, feats, jnp.asarray(Tcw), float(k), k, 0,
                jnp.full((caps.F,), -1, jnp.int32),
            )
            center = np.array([k, 0, 0], np.float32)
            gps = Rz @ center + rng.normal(0, 1e-3, 3)
            arena = set_sensor(arena, int(kf_id), SensorData(
                gps_rel=tuple(gps), gps_err=(0.1, 0.1, 0.2), gps_valid=True,
            ))
        pr = build_pose_priors(ms, arena, OptimizerInfo(gps_info=1.0),
                               include_tiepoints=False)
        assert pr is not None
        got = np.asarray(pr.gps_pos)[:6]
        want = np.stack([[k, 0, 0] for k in range(6)]).astype(np.float32)
        np.testing.assert_allclose(got, want, atol=5e-3)
        assert np.asarray(pr.gps_valid)[:6].all()
        assert np.asarray(pr.gps_info)[:6].min() > 0

    def test_build_priors_none_when_inactive(self):
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
        from hyslam_tpu.io.config import OptimizerInfo
        from hyslam_tpu.slam.sensor_fusion import build_pose_priors

        ms = empty_map_state(MapCaps(K=8, L=64, F=32, O=4))
        assert build_pose_priors(ms, None, OptimizerInfo()) is None


class TestLocalBAPriors:
    def test_local_ba_with_sensors_runs(self):
        """Local BA accepts sensor priors and still converges (the
        reference's LocalBundleAdjustment also sets sensor edges)."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from helpers import DEFAULT_CAM, make_world, synth_frame_features

        from hyslam_tpu.core.mapstate import MapCaps
        from hyslam_tpu.core.sensordata import SensorData
        from hyslam_tpu.io.config import OptimizerInfo
        from hyslam_tpu.slam.tracker import Tracker

        rng = np.random.default_rng(0)
        pts = make_world(rng, 800, extent=(10.0, 7.0, 40.0))
        descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)
        tracker = Tracker(
            cam=DEFAULT_CAM, caps=MapCaps(K=32, L=4096, F=256, O=8),
            opt_info=OptimizerInfo(depth_info=5.0, imu_info=0.5),
        )
        T = np.eye(4, dtype=np.float32)
        for i in range(8):
            T2 = T.copy()
            T2[2, 3] = -0.12 * i
            feats, _ = synth_frame_features(DEFAULT_CAM, T2, pts, descs,
                                            rng, F=256)
            q = np.asarray(so3.quat_from_mat(jnp.asarray(T2[:3, :3])))
            sd = SensorData(quat=tuple(q), quat_valid=True,
                            depth=float(T2[2, 3]), depth_valid=True)
            tel = tracker.track(feats, timestamp=0.1 * i, frame_id=i,
                                sensor_data=sd)
        assert tracker.state.name in ("NORMAL", "POSTINIT")
        # sensors recorded and local BA (with priors) produced a cost
        assert bool(np.asarray(tracker.sensors.depth_valid).any())
        ba_costs = [t.mapper_stats.get("ba_cost") for t in tracker.telemetry
                    if t.mapper_stats.get("ba_cost") is not None]
        assert ba_costs and np.isfinite(ba_costs[-1])

    def test_slot_priors_remap(self):
        """Tie edges remap onto BA slots; dropped when an endpoint has no
        slot."""
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
        from hyslam_tpu.core import mapstate as M
        from hyslam_tpu.core.frame import empty_features
        from hyslam_tpu.slam.mapper import _slot_priors
        from hyslam_tpu.io.config import OptimizerInfo

        caps = MapCaps(K=16, L=64, F=32, O=4)
        ms = empty_map_state(caps)
        feats = empty_features(caps.F)
        for k in range(4):
            Tk = np.eye(4, dtype=np.float32)
            Tk[2, 3] = -0.5 * k
            ms, _ = M.add_keyframe(ms, feats, jnp.asarray(Tk), float(k), k,
                                   0, jnp.full((caps.F,), -1, jnp.int32),
                                   origin=(k == 0))
        ms, sub = M.create_submap(ms)
        Tk = np.eye(4, dtype=np.float32)
        Tk[2, 3] = -2.0
        ms, kf4 = M.add_keyframe(ms, feats, jnp.asarray(Tk), 4.0, 4, 0,
                                 jnp.full((caps.F,), -1, jnp.int32),
                                 origin=True)
        tie_T = Tk @ np.linalg.inv(np.eye(4, dtype=np.float32))
        ms = M.register_submap(ms, sub, Tse3_parent=jnp.asarray(tie_T),
                               tie_kf=3)
        # slots: kf 3 -> slot 0, kf 4 -> slot 1; others absent
        kf_of_slot = jnp.asarray([3, 4, 0, 0], jnp.int32)
        slot_used = jnp.asarray([True, True, False, False])
        pr = _slot_priors(ms, None, OptimizerInfo(), kf_of_slot, slot_used)
        assert pr is not None
        tv = np.asarray(pr.tie_valid)
        assert tv.sum() == 1
        e = int(np.nonzero(tv)[0][0])
        assert int(pr.tie_a[e]) == 0 and int(pr.tie_b[e]) == 1
        # endpoint without slot -> edge dropped
        pr2 = _slot_priors(ms, None, OptimizerInfo(),
                           jnp.asarray([3, 2, 0, 0], jnp.int32),
                           jnp.asarray([True, True, False, False]))
        assert pr2 is None or not np.asarray(pr2.tie_valid).any()
