"""Atlas extractor equivalence: behaves like the per-level extractor on
rendered scenes (detections near true constellations, matchable
descriptors, stereo depth recovery through the same downstream path)."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.features.atlas import extract_atlas
from hyslam_tpu.features.extractor import ExtractorConfig, extract
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.ops.hamming import hamming_matrix
from hyslam_tpu.ops.stereo import match_stereo_refined

from helpers import make_world, render_world

SMALL_CAM = Camera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320,
                   height=240, bf=30.0)
CFG = ExtractorConfig(n_features=300, n_levels=4, cell_size=24)


class TestAtlas:
    def test_detections_near_truth(self, rng):
        pts = make_world(rng, 150, extent=(4.0, 3.0, 10.0), z_min=3.0)
        img, uv_true, vis = render_world(SMALL_CAM, np.eye(4, dtype=np.float32), pts)
        feats = extract_atlas(jnp.asarray(img), CFG, capacity=512)
        n_valid = int(feats.valid.sum())
        assert n_valid > 100
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        d = np.linalg.norm(uv[:, None, :] - uv_true[vis][None], axis=-1).min(1)
        assert (d < 8).mean() > 0.75

    def test_descriptors_match_across_views(self, rng):
        pts = make_world(rng, 150, extent=(4.0, 3.0, 10.0), z_min=3.0)
        T2 = np.asarray(se3.from_Rt(jnp.eye(3), jnp.asarray([-0.05, 0.0, 0.0])))
        img1, _, _ = render_world(SMALL_CAM, np.eye(4, dtype=np.float32), pts)
        img2, _, _ = render_world(SMALL_CAM, T2.astype(np.float32), pts)
        f1 = extract_atlas(jnp.asarray(img1), CFG, capacity=512)
        f2 = extract_atlas(jnp.asarray(img2), CFG, capacity=512)
        d = np.asarray(hamming_matrix(f1.desc, f2.desc))
        v1 = np.asarray(f1.valid)
        v2 = np.asarray(f2.valid)
        d = d[v1][:, v2]
        best = d.min(axis=1)
        assert (best < 40).mean() > 0.5  # half the features re-found

    def test_agrees_with_per_level_extractor(self, rng):
        """Same scene: both extractors find overlapping keypoint sets."""
        pts = make_world(rng, 150, extent=(4.0, 3.0, 10.0), z_min=3.0)
        img, _, _ = render_world(SMALL_CAM, np.eye(4, dtype=np.float32), pts)
        fa = extract_atlas(jnp.asarray(img), CFG, capacity=512)
        fb = extract(jnp.asarray(img), CFG, capacity=512)
        uva = np.asarray(fa.uv)[np.asarray(fa.valid)]
        uvb = np.asarray(fb.uv)[np.asarray(fb.valid)]
        d = np.linalg.norm(uva[:, None] - uvb[None], axis=-1).min(1)
        assert (d < 2).mean() > 0.6

    def test_stereo_depth_through_atlas(self, rng):
        pts = make_world(rng, 120, extent=(4.0, 3.0, 10.0), z_min=3.0)
        T_l = np.eye(4, dtype=np.float32)
        T_r = np.asarray(se3.from_Rt(
            jnp.eye(3), jnp.asarray([-SMALL_CAM.baseline, 0.0, 0.0]))) @ T_l
        img_l, uv_l, vis = render_world(SMALL_CAM, T_l, pts)
        img_r, _, _ = render_world(SMALL_CAM, T_r.astype(np.float32), pts)
        fl = extract_atlas(jnp.asarray(img_l), CFG, capacity=512)
        fr = extract_atlas(jnp.asarray(img_r), CFG, capacity=512)
        out = match_stereo_refined(fl, fr, jnp.asarray(img_l),
                                   jnp.asarray(img_r), bf=SMALL_CAM.bf,
                                   min_z=0.5)
        depth = np.asarray(out.depth)
        valid = np.asarray(out.valid) & (depth > 0)
        assert valid.sum() > 25
        errs = []
        for i in np.nonzero(valid)[0]:
            j = np.linalg.norm(uv_l[vis] - np.asarray(out.uv)[i], axis=-1).argmin()
            if np.linalg.norm(uv_l[vis][j] - np.asarray(out.uv)[i]) < 4:
                errs.append(abs(pts[vis][j, 2] - depth[i]) / pts[vis][j, 2])
        assert len(errs) > 15 and np.median(errs) < 0.1
