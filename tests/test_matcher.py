"""Matching engine tests on synthetic geometry with exact correspondence
ground truth (descriptors assigned per landmark + noise bits)."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core.frame import empty_features
from hyslam_tpu.features.matcher import (
    fundamental_from_poses,
    match_descriptors,
    predict_level,
    rotation_consistency,
    search_by_projection_frame,
    search_by_projection_landmarks,
    search_for_triangulation,
)
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import project

from helpers import DEFAULT_CAM, make_world, perturb_pose


def random_descs(rng, n):
    return rng.integers(0, 2**32, (n, 8), dtype=np.uint32)


def corrupt(rng, desc, n_bits):
    """Flip n_bits random bits in each descriptor."""
    out = desc.copy()
    for i in range(len(desc)):
        for _ in range(n_bits):
            w = rng.integers(0, 8)
            b = rng.integers(0, 32)
            out[i, w] ^= np.uint32(1) << np.uint32(b)
    return out


def frame_from(uv, desc, level=None, angle=None, F=256):
    n = len(uv)
    f = empty_features(F)
    lv = np.zeros(n, np.int32) if level is None else level
    an = np.zeros(n, np.float32) if angle is None else angle
    return f._replace(
        uv=f.uv.at[:n].set(jnp.asarray(uv)),
        desc=f.desc.at[:n].set(jnp.asarray(desc)),
        level=f.level.at[:n].set(jnp.asarray(lv)),
        angle=f.angle.at[:n].set(jnp.asarray(an)),
        valid=f.valid.at[:n].set(True),
    )


class TestMatchDescriptors:
    def test_finds_correspondences(self, rng):
        d = random_descs(rng, 100)
        da = corrupt(rng, d, 3)
        db = corrupt(rng, d, 3)
        perm = rng.permutation(100)
        fa = frame_from(np.zeros((100, 2), np.float32), da)
        fb = frame_from(np.zeros((100, 2), np.float32), db[perm])
        # inverse permutation is ground truth
        out, n = match_descriptors(
            fa.desc, fa.valid, fa.angle, fb.desc, fb.valid, fb.angle,
        )
        out = np.asarray(out)[:100]
        inv = np.argsort(perm)
        correct = (out == inv).mean()
        assert correct > 0.95
        assert int(n) > 90

    def test_rejects_noise(self, rng):
        fa = frame_from(np.zeros((64, 2), np.float32), random_descs(rng, 64))
        fb = frame_from(np.zeros((64, 2), np.float32), random_descs(rng, 64))
        out, n = match_descriptors(
            fa.desc, fa.valid, fa.angle, fb.desc, fb.valid, fb.angle,
        )
        assert int(n) < 5  # random 256-bit descriptors ~128 apart


class TestRotationConsistency:
    def test_keeps_dominant_rotation(self, rng):
        n = 200
        delta = np.full(n, 0.3, np.float32)
        bad = rng.choice(n, 30, replace=False)
        delta[bad] = rng.uniform(1.0, 6.0, 30)
        keep = np.asarray(
            rotation_consistency(jnp.asarray(delta), jnp.ones(n, bool))
        )
        assert keep[np.setdiff1d(np.arange(n), bad)].all()
        assert (~keep[bad]).mean() > 0.8


class TestProjectionMatching:
    def _setup(self, rng, n=200):
        cam = DEFAULT_CAM
        pts = make_world(rng, n, extent=(6.0, 4.0, 12.0), z_min=3.0)
        descs = random_descs(rng, n)
        Tcw = np.eye(4, dtype=np.float32)
        uv, z = project(cam, se3.apply(jnp.asarray(Tcw), jnp.asarray(pts)))
        uv = np.asarray(uv)
        vis = np.asarray(
            (z > 0) & (uv[:, 0] >= 5) & (uv[:, 0] < cam.width - 5)
            & (uv[:, 1] >= 5) & (uv[:, 1] < cam.height - 5)
        )
        return cam, pts, descs, Tcw, uv, vis

    def test_search_landmarks(self, rng):
        cam, pts, descs, Tcw, uv, vis = self._setup(rng)
        frame = frame_from(
            uv[vis] + rng.normal(0, 0.5, uv[vis].shape).astype(np.float32),
            corrupt(rng, descs[vis], 4), F=512,
        )
        n = len(pts)
        res = search_by_projection_landmarks(
            cam, frame, jnp.asarray(Tcw),
            jnp.asarray(pts),
            jnp.asarray(-pts / np.linalg.norm(pts, axis=-1, keepdims=True) * -1.0),
            jnp.asarray(descs),
            # observed at level 0: max_dist = dist (MapPointDB convention)
            jnp.asarray(np.linalg.norm(pts, axis=-1) * 1.05),
            jnp.asarray(np.linalg.norm(pts, axis=-1) / 1.2**8),
            jnp.ones(n, bool),
            jnp.zeros(512, bool),
            th=3.0,
        )
        assert int(res.n_matches) > 0.8 * vis.sum()
        # spot-check correctness: matched feature f -> landmark res[f]
        lmf = np.asarray(res.lm_for_feature)
        vis_idx = np.nonzero(vis)[0]
        correct = 0
        total = 0
        for f in np.nonzero(lmf >= 0)[0]:
            if f < vis.sum():
                total += 1
                correct += lmf[f] == vis_idx[f]
        assert total > 0 and correct / total > 0.95

    def test_search_frame_motion_model(self, rng):
        cam, pts, descs, Tcw, uv, vis = self._setup(rng)
        # last frame at Tcw, current at slightly moved pose
        T2 = perturb_pose(rng, Tcw, rot=0.005, trans=0.05)
        uv2, z2 = project(cam, se3.apply(jnp.asarray(T2), jnp.asarray(pts)))
        uv2 = np.asarray(uv2)
        vis2 = vis & np.asarray(
            (z2 > 0) & (uv2[:, 0] >= 0) & (uv2[:, 0] < cam.width)
            & (uv2[:, 1] >= 0) & (uv2[:, 1] < cam.height)
        )
        last = frame_from(uv[vis], corrupt(rng, descs[vis], 3), F=512)
        curf = frame_from(uv2[vis2], corrupt(rng, descs[vis2], 3), F=512)
        # last frame landmark ids = world indices
        last_lm_id = np.full(512, -1, np.int32)
        last_lm_id[: vis.sum()] = np.nonzero(vis)[0]
        last_lm_pos = np.zeros((512, 3), np.float32)
        last_lm_pos[: vis.sum()] = pts[vis]
        lm_ids, n = search_by_projection_frame(
            cam, curf, jnp.asarray(T2), last,
            jnp.asarray(last_lm_id), jnp.asarray(last_lm_pos), th=7.0,
        )
        lm_ids = np.asarray(lm_ids)
        assert int(n) > 0.7 * vis2.sum()
        vis2_idx = np.nonzero(vis2)[0]
        matched = np.nonzero(lm_ids >= 0)[0]
        ok = [lm_ids[f] == vis2_idx[f] for f in matched if f < vis2.sum()]
        assert np.mean(ok) > 0.95


class TestTriangulationSearch:
    def test_epipolar_gating(self, rng):
        cam = DEFAULT_CAM
        pts = make_world(rng, 150, extent=(6.0, 4.0, 12.0), z_min=3.0)
        descs = random_descs(rng, 150)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(
            se3.exp(jnp.asarray([0.0, 0.02, 0.0, 0.4, 0.0, 0.0], jnp.float32))
        )
        uv1, z1 = project(cam, se3.apply(jnp.asarray(T1), jnp.asarray(pts)))
        uv2, z2 = project(cam, se3.apply(jnp.asarray(T2), jnp.asarray(pts)))
        uv1, uv2 = np.asarray(uv1), np.asarray(uv2)
        vis = np.asarray(
            (z1 > 0) & (z2 > 0)
            & (uv1 >= 0).all(-1) & (uv1 < [cam.width, cam.height]).all(-1)
            & (uv2 >= 0).all(-1) & (uv2 < [cam.width, cam.height]).all(-1)
        )
        f1 = frame_from(uv1[vis], corrupt(rng, descs[vis], 3), F=256)
        f2 = frame_from(uv2[vis], corrupt(rng, descs[vis], 3), F=256)
        F12 = fundamental_from_poses(cam, jnp.asarray(T1), cam, jnp.asarray(T2))
        # sanity: epipolar residual of true correspondences ~ 0
        x1 = np.concatenate([uv1[vis], np.ones((vis.sum(), 1))], -1)
        x2 = np.concatenate([uv2[vis], np.ones((vis.sum(), 1))], -1)
        resid = np.abs(np.einsum("ni,ij,nj->n", x2, np.asarray(F12), x1))
        lines = x1 @ np.asarray(F12).T
        d = resid / np.linalg.norm(lines[:, :2], axis=-1)
        assert np.median(d) < 0.1

        out, n = search_for_triangulation(
            cam, f1, f2,
            jnp.ones(256, bool), jnp.ones(256, bool), F12,
        )
        out = np.asarray(out)
        assert int(n) > 0.8 * vis.sum()
        matched = np.nonzero(out >= 0)[0]
        ok = [out[f] == f for f in matched if f < vis.sum()]
        assert np.mean(ok) > 0.95


class TestPredictLevel:
    def test_monotone(self):
        md = jnp.asarray([10.0, 10.0, 10.0])
        d = jnp.asarray([10.0, 5.0, 2.0])
        lv = np.asarray(predict_level(d, md))
        assert lv[0] == 0
        assert lv[1] > lv[0]
        assert lv[2] > lv[1]
