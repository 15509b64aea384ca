"""Feature engine tests: FAST detection, grid selection, ORB descriptors,
full extraction pipeline, stereo matching — validated on rendered synthetic
scenes with known geometry (SURVEY.md §4 strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hyslam_tpu.core.frame import empty_features
from hyslam_tpu.features.extractor import ExtractorConfig, extract, level_budgets
from hyslam_tpu.geometry import se3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.ops.fast import fast_scores, nms3x3, select_keypoints
from hyslam_tpu.ops.hamming import (
    hamming_matrix,
    hamming_pairwise,
    pack_bits,
    unpack_bits,
)
from hyslam_tpu.ops.orb import descriptors, orientations
from hyslam_tpu.ops.stereo import match_stereo, match_stereo_refined

from helpers import make_world, render_world

SMALL_CAM = Camera(fx=300.0, fy=300.0, cx=160.0, cy=120.0, width=320, height=240,
                   bf=30.0)
CFG = ExtractorConfig(n_features=300, n_levels=4, cell_size=24)


class TestHamming:
    def test_pack_unpack_roundtrip(self, rng):
        d = jnp.asarray(rng.integers(0, 2**32, (16, 8), dtype=np.uint32))
        np.testing.assert_array_equal(
            np.asarray(pack_bits(unpack_bits(d, jnp.float32) > 0.5)), np.asarray(d)
        )

    def test_pairwise_known(self):
        a = jnp.asarray([[0, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
        b = jnp.asarray([[0b1011, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
        assert int(hamming_pairwise(a, b)[0]) == 3

    def test_matrix_matches_pairwise(self, rng):
        a = jnp.asarray(rng.integers(0, 2**32, (12, 8), dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, (17, 8), dtype=np.uint32))
        M = np.asarray(hamming_matrix(a, b))
        P = np.asarray(hamming_pairwise(a[:, None, :], b[None, :, :]))
        np.testing.assert_array_equal(M, P)


class TestFast:
    def test_detects_blob(self):
        img = np.full((64, 64), 10.0, np.float32)
        img[30, 40] = 250.0  # bright dot: all 16 circle pixels darker
        s = np.asarray(fast_scores(jnp.asarray(img), 7.0))
        assert s[30, 40] > 0
        assert s.argmax() == 30 * 64 + 40

    def test_flat_image_no_corners(self):
        img = np.full((64, 64), 77.0, np.float32)
        s = np.asarray(fast_scores(jnp.asarray(img), 7.0))
        assert (s == 0).all()

    def test_edge_is_not_corner(self):
        # vertical step edge: no 9-contiguous arc is uniformly brighter/darker
        img = np.full((64, 64), 10.0, np.float32)
        img[:, 32:] = 200.0
        s = np.asarray(fast_scores(jnp.asarray(img), 7.0))
        assert (s == 0).all()

    def test_select_spreads_over_grid(self):
        img = np.full((128, 128), 10.0, np.float32)
        rs = np.random.default_rng(3)
        ys, xs = rs.integers(20, 108, 40), rs.integers(20, 108, 40)
        img[ys, xs] = 255.0
        s = nms3x3(fast_scores(jnp.asarray(img), 7.0))
        uv, sc, valid = select_keypoints(s, 32, cell=32, border=8)
        uv = np.asarray(uv)[np.asarray(valid)]
        # selected keypoints should be near injected dots
        d = np.abs(uv[:, None, :] - np.stack([xs, ys], -1)[None]).sum(-1).min(1)
        assert (d <= 2).mean() > 0.9


class TestDescriptors:
    def test_deterministic(self, rng):
        img = jnp.asarray(rng.uniform(0, 255, (120, 160)).astype(np.float32))
        uv = jnp.asarray(rng.uniform(30, 90, (10, 2)).astype(np.float32))
        a = orientations(img, uv)
        d1 = descriptors(img, uv, a)
        d2 = descriptors(img, uv, a)
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))

    def test_translation_invariance(self, rng):
        base = rng.uniform(0, 255, (150, 200)).astype(np.float32)
        shift = np.roll(base, (0, 5), axis=(0, 1))
        uv = jnp.asarray(rng.uniform(40, 100, (20, 2)).astype(np.float32))
        uv2 = uv + jnp.asarray([5.0, 0.0])
        a1 = orientations(jnp.asarray(base), uv)
        a2 = orientations(jnp.asarray(shift), uv2)
        d1 = descriptors(jnp.asarray(base), uv, a1)
        d2 = descriptors(jnp.asarray(shift), uv2, a2)
        dist = np.asarray(hamming_pairwise(d1, d2))
        assert dist.mean() < 10  # same patch, same descriptor
        # cross distances should be near random (~128)
        cross = np.asarray(hamming_matrix(d1, d2))
        off = cross[~np.eye(20, dtype=bool)]
        assert off.mean() > 80

    def test_rotation_steering(self, rng):
        # rotate image content by 90 deg; steered descriptors should match
        base = rng.uniform(0, 255, (101, 101)).astype(np.float32)
        rot = np.rot90(base, k=-1).copy()  # (x,y)->(N-1-y, x)
        uv = jnp.asarray([[40.0, 30.0]])
        uv_rot = jnp.asarray([[101 - 1 - 30.0, 40.0]])
        a1 = orientations(jnp.asarray(base), uv)
        a2 = orientations(jnp.asarray(rot), uv_rot)
        d1 = descriptors(jnp.asarray(base), uv, a1)
        d2 = descriptors(jnp.asarray(rot), uv_rot, a2)
        dist = int(hamming_pairwise(d1, d2)[0])
        assert dist < 60  # far below random 128


class TestExtract:
    def test_budgets(self):
        b = level_budgets(CFG)
        assert sum(b) == CFG.n_features
        assert b[0] > b[-1]

    def test_extracts_on_rendered_scene(self, rng):
        pts = make_world(rng, 150, extent=(4.0, 3.0, 10.0), z_min=3.0)
        img, uv_true, vis = render_world(SMALL_CAM, np.eye(4, dtype=np.float32), pts)
        feats = extract(jnp.asarray(img), CFG, capacity=512)
        n_valid = int(feats.valid.sum())
        assert n_valid > 100
        # most detections should be near rendered constellations
        uv = np.asarray(feats.uv)[np.asarray(feats.valid)]
        d = np.linalg.norm(
            uv[:, None, :] - uv_true[vis][None], axis=-1
        ).min(1)
        assert (d < 8).mean() > 0.8

    def test_levels_populated(self, rng):
        pts = make_world(rng, 150, extent=(4.0, 3.0, 10.0), z_min=3.0)
        img, _, _ = render_world(SMALL_CAM, np.eye(4, dtype=np.float32), pts)
        feats = extract(jnp.asarray(img), CFG, capacity=512)
        lv = np.asarray(feats.level)[np.asarray(feats.valid)]
        assert len(np.unique(lv)) >= 2


class TestStereo:
    def test_recovers_depth(self, rng):
        pts = make_world(rng, 120, extent=(4.0, 3.0, 10.0), z_min=3.0)
        T_l = np.eye(4, dtype=np.float32)
        T_r = np.asarray(
            se3.from_Rt(jnp.eye(3), jnp.asarray([-SMALL_CAM.baseline, 0.0, 0.0]))
        ) @ T_l
        img_l, uv_l, vis = render_world(SMALL_CAM, T_l, pts)
        img_r, _, _ = render_world(SMALL_CAM, T_r, pts)
        fl = extract(jnp.asarray(img_l), CFG, capacity=512)
        fr = extract(jnp.asarray(img_r), CFG, capacity=512)
        out = match_stereo_refined(
            fl, fr, jnp.asarray(img_l), jnp.asarray(img_r),
            bf=SMALL_CAM.bf, min_z=0.5,
        )
        depth = np.asarray(out.depth)
        valid = np.asarray(out.valid) & (depth > 0)
        assert valid.sum() > 30
        # compare matched depths against nearest ground-truth point depth
        uv = np.asarray(out.uv)
        pc = pts  # camera frame == world frame for T_l = I
        errs = []
        for i in np.nonzero(valid)[0]:
            j = np.linalg.norm(uv_l[vis] - uv[i], axis=-1).argmin()
            if np.linalg.norm(uv_l[vis][j] - uv[i]) < 4:
                errs.append(abs(pc[vis][j, 2] - depth[i]) / pc[vis][j, 2])
        errs = np.asarray(errs)
        assert len(errs) > 20
        assert np.median(errs) < 0.1


def test_preprocess_image_scale():
    """PreProcessImg analog: grayscale + pre-scaling (the Imaging camera
    runs at scale 0.5, config/sample_primary_config_file.yaml:43-71)."""
    import jax.numpy as jnp
    from hyslam_tpu.ops.pyramid import preprocess_image

    rgb = np.zeros((64, 96, 3), np.float32)
    rgb[..., 1] = 100.0
    out = preprocess_image(jnp.asarray(rgb), scale=0.5)
    assert out.shape == (32, 48)
    np.testing.assert_allclose(np.asarray(out), 58.7, atol=0.2)
    full = preprocess_image(jnp.asarray(rgb), scale=1.0)
    assert full.shape == (64, 96)
