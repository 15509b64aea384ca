"""sparsify_map (GenUtils::sparsifyMap analog): successive near-duplicate
keyframes are culled when > overlap_criterion of the previous kept KF's
landmarks are visible in them."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapCaps
from hyslam_tpu.slam.sparsify import keyframe_overlap_fractions, sparsify_map

from helpers import DEFAULT_CAM, make_world, synth_frame_features


def build_map(rng, Ts, F=256):
    pts = make_world(rng, 600, extent=(8.0, 6.0, 30.0), z_min=2.0)
    descs = rng.integers(0, 2**32, (600, 8), dtype=np.uint32)
    ms = M.empty_map_state(MapCaps(K=16, L=2048, F=F, O=8))
    for i, T in enumerate(Ts):
        feats, gt = synth_frame_features(DEFAULT_CAM, T, pts, descs, rng, F=F)
        ms, k = M.add_keyframe(
            ms, feats, jnp.asarray(T), 0.1 * i, i, 0,
            jnp.full((F,), -1, jnp.int32), origin=(i == 0),
        )
        if i == 0:
            valid = np.asarray(feats.valid) & (np.asarray(feats.depth) > 0)
            from hyslam_tpu.geometry.camera import unproject_to_world
            X = np.asarray(unproject_to_world(
                DEFAULT_CAM, jnp.asarray(T), feats.uv, feats.depth))
            ms, lm_idx = M.add_landmarks(
                ms, jnp.asarray(X), feats.desc, k,
                jnp.arange(F, dtype=jnp.int32), jnp.asarray(valid))
        else:
            # associate same world points by projecting (use gt mapping)
            ms = M.add_associations(
                ms, k, jnp.arange(F, dtype=jnp.int32),
                jnp.asarray(first_lm[np.clip(gt, 0, len(first_lm) - 1)]),
                jnp.asarray((gt >= 0)))
        if i == 0:
            # map world-point index -> landmark id through frame-0 gt
            first_lm = np.full(600, -1, np.int32)
            g = np.asarray(gt)
            li = np.asarray(lm_idx)
            sel = g >= 0
            first_lm[g[sel]] = li[sel]
    return ms


class TestSparsify:
    def test_duplicates_culled(self, rng):
        # 6 keyframes at (almost) the same pose: all but the first get culled
        Ts = [np.eye(4, dtype=np.float32) for _ in range(6)]
        for i, T in enumerate(Ts):
            T[0, 3] = 0.001 * i
        ms = build_map(rng, Ts)
        frac = np.asarray(keyframe_overlap_fractions(ms, DEFAULT_CAM))
        assert frac[0, 1] > 0.97
        ms2, n = sparsify_map(ms, DEFAULT_CAM, overlap_criterion=0.9)
        assert n == 5
        bad = np.asarray(ms2.kf.bad)
        assert not bad[0] and bad[1:6].all()

    def test_distinct_views_kept(self, rng):
        # keyframes looking at disjoint parts of the world: nothing culled
        Ts = []
        for i in range(4):
            T = np.eye(4, dtype=np.float32)
            T[0, 3] = 18.0 * i   # big sideways jumps
            Ts.append(T)
        ms = build_map(rng, Ts)
        ms2, n = sparsify_map(ms, DEFAULT_CAM, overlap_criterion=0.5)
        assert n == 0

    def test_origin_never_culled(self, rng):
        Ts = [np.eye(4, dtype=np.float32) for _ in range(3)]
        ms = build_map(rng, Ts)
        # make ALL keyframes origins: sparsify must cull none
        ms = ms._replace(kf=ms.kf._replace(
            origin=ms.kf.origin | ms.kf.valid))
        ms2, n = sparsify_map(ms, DEFAULT_CAM, overlap_criterion=0.5)
        assert n == 0
