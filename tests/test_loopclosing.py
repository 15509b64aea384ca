"""Loop-closing integration test: a circular trajectory with accumulated
drift revisits its start; the second pass creates duplicate landmarks (as
real drifted tracking does). The LoopCloser must detect the revisit via
BoW + consistency groups, compute the corrective Sim3, and shrink the final
pose error through loop correction + essential-graph optimization."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.frame import empty_features
from hyslam_tpu.core.mapstate import MapCaps, empty_map_state
from hyslam_tpu.features.bow import PlaceRecognizer, train_vocabulary
from hyslam_tpu.geometry import se3, so3
from hyslam_tpu.geometry.camera import Camera, project_stereo
from hyslam_tpu.slam.loop_closing import LoopCloser

from helpers import pose_error

CAM = Camera(fx=400.0, fy=400.0, cx=320.0, cy=240.0, width=640, height=480,
             bf=40.0)
F_CAP = 256
CAPS = MapCaps(K=32, L=8192, F=F_CAP, O=8)


def circle_pose(theta, radius=8.0):
    """Camera on a circle in the XZ plane looking tangentially (forward)."""
    c = np.array([radius * np.sin(theta), 0.0, radius * (1 - np.cos(theta))],
                 np.float32)
    yaw = -theta
    R_wc = np.asarray(so3.exp(jnp.asarray([0.0, yaw, 0.0], jnp.float32)))
    Twc = np.eye(4, dtype=np.float32)
    Twc[:3, :3] = R_wc
    Twc[:3, 3] = c
    return np.asarray(se3.inverse(jnp.asarray(Twc)), dtype=np.float32)


def build_drifted_loop(rng, n_kf=24, drift_per_kf=0.01, dup_from=16):
    """Returns (ms, closer-ready data, true poses, drifted poses)."""
    # world: landmarks scattered around the circle corridor
    thetas_w = rng.uniform(0, 2 * np.pi, 800)
    r_w = rng.uniform(6.0, 13.0, 800)
    pts = np.stack(
        [r_w * np.sin(thetas_w), rng.uniform(-2, 2, 800),
         8.0 - (8.0 - r_w) * np.cos(thetas_w) + (r_w - 8.0)], -1,
    ).astype(np.float32)
    # simpler: re-generate directly around the ring
    pts = np.stack(
        [(8.0 + rng.uniform(-2, 4, 800)) * np.sin(thetas_w),
         rng.uniform(-2.5, 2.5, 800),
         8.0 - (8.0 + rng.uniform(-2, 4, 800)) * np.cos(thetas_w)], -1,
    ).astype(np.float32)
    descs = rng.integers(0, 2**32, (800, 8), dtype=np.uint32)

    T_true = [circle_pose(2 * np.pi * k / n_kf) for k in range(n_kf)]
    # drift accumulates after the first half
    T_drift = []
    acc = np.eye(4, dtype=np.float32)
    for k in range(n_kf):
        if k > 0:
            step = np.asarray(se3.exp(jnp.asarray(
                [0.0, drift_per_kf * 0.15, 0.0, drift_per_kf, 0.0, 0.0],
                jnp.float32)))
            acc = (step @ acc).astype(np.float32)
        T_drift.append((T_true[k] @ np.asarray(se3.inverse(jnp.asarray(acc)))
                        ).astype(np.float32))

    ms = empty_map_state(CAPS)
    world2lm = {}   # world idx -> arena idx
    last_seen = {}  # world idx -> last KF that observed it
    for k in range(n_kf):
        Tk = T_drift[k]
        uv, ur, z = project_stereo(CAM, se3.apply(jnp.asarray(T_true[k]),
                                                  jnp.asarray(pts)))
        uv, ur, z = np.asarray(uv), np.asarray(ur), np.asarray(z)
        vis = ((z > 1.0) & (z < 15.0)
               & (uv[:, 0] > 5) & (uv[:, 0] < CAM.width - 5)
               & (uv[:, 1] > 5) & (uv[:, 1] < CAM.height - 5))
        w_idx = np.nonzero(vis)[0][:F_CAP]
        n = len(w_idx)
        feats = empty_features(F_CAP)
        feats = feats._replace(
            uv=feats.uv.at[:n].set(jnp.asarray(uv[w_idx])),
            ur=feats.ur.at[:n].set(jnp.asarray(ur[w_idx])),
            depth=feats.depth.at[:n].set(jnp.asarray(z[w_idx])),
            desc=feats.desc.at[:n].set(jnp.asarray(descs[w_idx])),
            valid=feats.valid.at[:n].set(True),
        )
        # associations: only to landmarks created in the CURRENT drift
        # regime (revisit creates duplicates, like real drifted tracking)
        assoc = np.full(F_CAP, -1, np.int32)
        create = np.zeros(F_CAP, bool)
        for slot, w in enumerate(w_idx):
            # real drifted tracking keeps re-finding landmarks it saw
            # RECENTLY (local continuity) but cannot match temporally
            # distant ones once drift exceeds the search radius: revisits
            # therefore create duplicates -> the loop-closure situation
            w = int(w)
            if w in world2lm and k - last_seen[w] <= 4:
                assoc[slot] = world2lm[w]
            else:
                create[slot] = True
        ms, kf = M.add_keyframe(
            ms, feats, jnp.asarray(Tk), 0.1 * k, k, 0, jnp.asarray(assoc),
            origin=(k == 0),
        )
        # create new landmarks by unprojecting with the DRIFTED pose
        X = se3.apply(
            se3.inverse(jnp.asarray(Tk)),
            jnp.stack(
                [(feats.uv[:, 0] - CAM.cx) / CAM.fx * feats.depth,
                 (feats.uv[:, 1] - CAM.cy) / CAM.fy * feats.depth,
                 feats.depth], -1,
            ),
        )
        ms, lm_idx = M.add_landmarks(
            ms, X, feats.desc, kf, jnp.arange(F_CAP, dtype=jnp.int32),
            jnp.asarray(create),
        )
        lm_idx = np.asarray(lm_idx)
        for slot, w in enumerate(w_idx):
            w = int(w)
            if lm_idx[slot] >= 0:
                world2lm[w] = int(lm_idx[slot])
            last_seen[w] = k
    ms = M.refresh_covisibility(ms)
    ms = M.compute_spanning_parents(ms)
    ms = M.update_landmark_stats(ms)
    return ms, descs, T_true, T_drift, n_kf


class TestLoopClosing:
    def test_detect_and_correct(self, rng):
        ms, descs, T_true, T_drift, n_kf = build_drifted_loop(rng)
        vocab = train_vocabulary(descs, k=8, depth=3)
        pr = PlaceRecognizer(vocab, K=CAPS.K)
        closer = LoopCloser(cam=CAM, recognizer=pr, fix_scale=True)

        err_before = pose_error(T_drift[n_kf - 1], T_true[n_kf - 1])[1]
        assert err_before > 0.08, "test needs real drift"

        # drift at a mid-chain KF far from the final covisibility group:
        # only essential-graph PROPAGATION can improve it (CorrectLoop's
        # Sim3 snap only moves the current group) — guards the
        # NonCorrectedSim3 semantics (edge measurements must come from
        # pre-correction poses, else every residual is zero and the graph
        # is a no-op)
        mid = (2 * n_kf) // 3
        err_mid_before = pose_error(T_drift[mid], T_true[mid])[1]

        closed = False
        for k in range(n_kf):
            ms, ok, info = closer.process_keyframe(ms, k)
            closed = closed or ok
        assert closed, "loop was not detected/closed"

        err_after = pose_error(np.asarray(ms.kf.Tcw[n_kf - 1]),
                               T_true[n_kf - 1])[1]
        assert err_after < 0.5 * err_before, (err_before, err_after)
        err_mid_after = pose_error(np.asarray(ms.kf.Tcw[mid]),
                                   T_true[mid])[1]
        assert err_mid_after < 0.75 * err_mid_before, \
            (err_mid_before, err_mid_after)

    def test_no_false_positive_without_revisit(self, rng):
        # straight-line map: no loops should close
        from helpers import make_world, synth_frame_features
        ms = empty_map_state(CAPS)
        pts = make_world(rng, 600, extent=(10, 6, 60), z_min=2.0)
        descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)
        vocab = train_vocabulary(descs, k=8, depth=3)
        pr = PlaceRecognizer(vocab, K=CAPS.K)
        closer = LoopCloser(cam=CAM, recognizer=pr)
        T = np.eye(4, dtype=np.float32)
        created = np.full(600, -1, np.int32)
        for k in range(8):
            feats, gt = synth_frame_features(CAM, T, pts, descs, rng, F=F_CAP)
            assoc = np.full(F_CAP, -1, np.int32)
            sel = gt >= 0
            assoc[sel] = created[gt[sel]]
            ms, kf = M.add_keyframe(ms, feats, jnp.asarray(T), 0.1 * k, k, 0,
                                    jnp.asarray(assoc), origin=(k == 0))
            new = sel & (assoc < 0)
            X = se3.apply(
                se3.inverse(jnp.asarray(T)),
                jnp.stack(
                    [(feats.uv[:, 0] - CAM.cx) / CAM.fx * feats.depth,
                     (feats.uv[:, 1] - CAM.cy) / CAM.fy * feats.depth,
                     feats.depth], -1),
            )
            ms, lm_idx = M.add_landmarks(
                ms, X, feats.desc, kf, jnp.arange(F_CAP, dtype=jnp.int32),
                jnp.asarray(new))
            lm_idx = np.asarray(lm_idx)
            created[gt[new]] = lm_idx[new]
            T = (np.asarray(se3.exp(jnp.asarray([0, 0, 0, 0, 0, -0.4],
                                                jnp.float32))) @ T)
            ms = M.refresh_covisibility(ms)
            ms, ok, _ = closer.process_keyframe(ms, int(kf))
            assert not ok
