"""Map arena tests: allocation, associations (both sides), covisibility,
spanning tree, landmark stats, culling, replacement, sub-map tree."""

import numpy as np
import jax.numpy as jnp

from hyslam_tpu.core.frame import empty_features
from hyslam_tpu.core.mapstate import (
    MapCaps,
    add_associations,
    add_keyframe,
    add_landmarks,
    apply_transform_to_map,
    compute_spanning_parents,
    covis_neighbors,
    create_submap,
    empty_map_state,
    erase_associations,
    map_root,
    refresh_covisibility,
    register_submap,
    replace_landmarks,
    resolve_landmarks,
    set_active_map,
    set_keyframes_bad,
    set_landmarks_bad,
    update_landmark_stats,
    visible_scope,
)
from hyslam_tpu.geometry import se3

CAPS = MapCaps(K=8, L=64, F=32, O=4)


def feats_with(n, F=32, seed=0):
    rng = np.random.default_rng(seed)
    f = empty_features(F)
    return f._replace(
        uv=jnp.asarray(rng.uniform(0, 640, (F, 2)).astype(np.float32)),
        desc=jnp.asarray(rng.integers(0, 2**32, (F, 8), dtype=np.uint32)),
        valid=jnp.asarray(np.arange(F) < n),
    )


def ms_with_two_kfs(n_shared=10):
    """Two keyframes sharing n_shared landmarks."""
    ms = empty_map_state(CAPS)
    f0 = feats_with(20, seed=1)
    ms, k0 = add_keyframe(
        ms, f0, se3.identity(), 0.0, 0, 0,
        jnp.full((32,), -1, jnp.int32), origin=True,
    )
    # create landmarks from k0's first 15 features
    pos = np.tile([0.0, 0.0, 5.0], (32, 1)).astype(np.float32)
    mask = np.arange(32) < 15
    ms, lm_idx = add_landmarks(
        ms, jnp.asarray(pos), f0.desc, k0, jnp.arange(32, dtype=jnp.int32),
        jnp.asarray(mask),
    )
    # second KF observes the first n_shared of them
    f1 = feats_with(20, seed=2)
    assoc = np.full(32, -1, np.int32)
    assoc[:n_shared] = np.asarray(lm_idx)[:n_shared]
    ms, k1 = add_keyframe(
        ms, f1, se3.exp(jnp.asarray([0, 0, 0, 0.3, 0, 0], dtype=jnp.float32)),
        1.0, 1, 0, jnp.asarray(assoc),
    )
    return ms, k0, k1, np.asarray(lm_idx)


class TestAllocation:
    def test_add_keyframe(self):
        ms, k0, k1, _ = ms_with_two_kfs()
        assert int(ms.next_kf) == 2
        assert bool(ms.kf.valid[0]) and bool(ms.kf.valid[1])
        assert bool(ms.kf.origin[0]) and not bool(ms.kf.origin[1])

    def test_add_landmarks_allocates_and_binds(self):
        ms, k0, _, lm_idx = ms_with_two_kfs()
        assert int(ms.next_lm) == 15
        assert (lm_idx[:15] >= 0).all() and (lm_idx[15:] == -1).all()
        # KF-side association
        kf_lm = np.asarray(ms.kf.lm_id[0])
        assert (kf_lm[:15] == lm_idx[:15]).all()
        # LM-side observation
        assert np.asarray(ms.lm.n_obs)[lm_idx[0]] >= 1

    def test_two_sided_consistency(self):
        ms, k0, k1, lm_idx = ms_with_two_kfs()
        n_obs = np.asarray(ms.lm.n_obs)
        assert (n_obs[lm_idx[:10]] == 2).all()  # seen by both
        assert (n_obs[lm_idx[10:15]] == 1).all()
        obs_kf = np.asarray(ms.lm.obs_kf)
        obs_valid = np.asarray(ms.lm.obs_valid)
        for l in lm_idx[:10]:
            kfs = set(obs_kf[l][obs_valid[l]].tolist())
            assert kfs == {0, 1}

    def test_erase_association(self):
        ms, k0, k1, lm_idx = ms_with_two_kfs()
        ms = erase_associations(
            ms, k1, jnp.arange(32, dtype=jnp.int32),
            jnp.asarray(np.arange(32) < 5),
        )
        n_obs = np.asarray(ms.lm.n_obs)
        assert (n_obs[lm_idx[:5]] == 1).all()
        assert (np.asarray(ms.kf.lm_id[1])[:5] == -1).all()
        assert (n_obs[lm_idx[5:10]] == 2).all()


class TestCovisibility:
    def test_weights(self):
        ms, k0, k1, _ = ms_with_two_kfs(n_shared=10)
        ms = refresh_covisibility(ms)
        covis = np.asarray(ms.covis)
        assert covis[0, 1] == 10 and covis[1, 0] == 10
        assert covis[0, 0] == 0

    def test_neighbors_thresholded(self):
        ms, k0, k1, _ = ms_with_two_kfs(n_shared=10)
        ms = refresh_covisibility(ms)
        ids, w = covis_neighbors(ms, 0, n_best=4, min_weight=15)
        assert (np.asarray(ids) == -1).all()  # below threshold 15
        ids, w = covis_neighbors(ms, 0, n_best=4, min_weight=5)
        assert np.asarray(ids)[0] == 1

    def test_spanning_parent(self):
        ms, k0, k1, _ = ms_with_two_kfs(n_shared=10)
        ms = refresh_covisibility(ms)
        ms = compute_spanning_parents(ms)
        par = np.asarray(ms.kf.span_parent)
        assert par[0] == -1 and par[1] == 0


class TestLandmarkStats:
    def test_normals_point_at_cameras(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        ms = update_landmark_stats(ms)
        # cameras near origin, landmarks at z=5 -> normal approx +z
        n = np.asarray(ms.lm.normal)[lm_idx[0]]
        assert n[2] > 0.9

    def test_distance_range(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        ms = update_landmark_stats(ms)
        mn = np.asarray(ms.lm.min_dist)[lm_idx[0]]
        mx = np.asarray(ms.lm.max_dist)[lm_idx[0]]
        assert 0 < mn < mx
        assert abs(mx - 5.0) < 1.0  # mean distance ~5, level 0

    def test_best_descriptor_is_an_observed_one(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        ms = update_landmark_stats(ms)
        d = np.asarray(ms.lm.desc)[lm_idx[0]]
        d0 = np.asarray(ms.kf.desc[0, 0])
        d1 = np.asarray(ms.kf.desc[1, 0])
        assert (d == d0).all() or (d == d1).all()


class TestBadAndReplace:
    def test_set_landmarks_bad_detaches(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        bad = np.zeros(64, bool)
        bad[lm_idx[0]] = True
        ms = set_landmarks_bad(ms, jnp.asarray(bad))
        assert bool(ms.lm.bad[lm_idx[0]])
        assert not (np.asarray(ms.kf.lm_id) == lm_idx[0]).any()

    def test_replace_rewrites_references(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        src = jnp.asarray([int(lm_idx[0])])
        dst = jnp.asarray([int(lm_idx[1])])
        ms = replace_landmarks(ms, src, dst, jnp.asarray([True]))
        kf_lm = np.asarray(ms.kf.lm_id[0])
        assert kf_lm[0] == lm_idx[1]
        res = resolve_landmarks(ms, jnp.asarray([int(lm_idx[0])]))
        assert int(res[0]) == lm_idx[1]

    def test_cull_keyframe_reparents(self):
        ms, k0, k1, lm_idx = ms_with_two_kfs()
        f2 = feats_with(5, seed=3)
        assoc = np.full(32, -1, np.int32)
        assoc[:5] = lm_idx[:5]
        ms, k2 = add_keyframe(ms, f2, se3.identity(), 2.0, 2, 0, jnp.asarray(assoc))
        ms = refresh_covisibility(ms)
        ms = compute_spanning_parents(ms)
        par_before = np.asarray(ms.kf.span_parent)
        assert par_before[2] in (0, 1)
        bad = np.zeros(8, bool)
        bad[1] = True
        n_obs_before = np.asarray(ms.lm.n_obs)[lm_idx[0]]
        ms = set_keyframes_bad(ms, jnp.asarray(bad))
        assert bool(ms.kf.bad[1])
        assert np.asarray(ms.lm.n_obs)[lm_idx[0]] == n_obs_before - 1
        par = np.asarray(ms.kf.span_parent)
        if par_before[2] == 1:
            assert par[2] == 0  # lifted to grandparent

    def test_spanning_recompute_preserves_culled_anchors(self):
        """compute_spanning_parents after a cull must NOT wipe the culled
        keyframes' frozen (span_parent, Tcp) pair — trajectory re-anchoring
        composes Tcp with the live ancestor's pose, and a -1 parent leaves
        every frame referencing the culled KF permanently stuck at its
        stale pose (the round-4 loop-closure regression: ~1.26 m frozen
        spikes in an otherwise corrected trajectory)."""
        from hyslam_tpu.core import trajectory as TJ

        ms, k0, k1, lm_idx = ms_with_two_kfs()
        f2 = feats_with(5, seed=3)
        assoc = np.full(32, -1, np.int32)
        assoc[:5] = lm_idx[:5]
        T2 = np.eye(4, dtype=np.float32)
        T2[0, 3] = 0.7
        ms, k2 = add_keyframe(ms, f2, jnp.asarray(T2), 2.0, 2, 0,
                              jnp.asarray(assoc))
        ms = refresh_covisibility(ms)
        ms = compute_spanning_parents(ms)
        # record a trajectory frame referenced to k1 before culling it
        traj = TJ.empty_trajectory(16)
        Tf = np.asarray(ms.kf.Tcw[k1])
        traj = TJ.append(traj, 1.0, jnp.asarray(Tf), k1,
                         ms.kf.Tcw[k1], True)
        bad = np.zeros(8, bool)
        bad[int(k1)] = True
        ms = set_keyframes_bad(ms, jnp.asarray(bad))
        # the mapper's cull path refreshes covis + spanning afterwards
        ms = refresh_covisibility(ms)
        ms = compute_spanning_parents(ms)
        par = np.asarray(ms.kf.span_parent)
        assert par[int(k1)] >= 0, "culled KF lost its frozen parent"
        # move the whole map; the frame must re-anchor through the culled
        # KF's Tcp onto the live parent's new pose
        dT = np.eye(4, dtype=np.float32)
        dT[1, 3] = 2.5
        ms = ms._replace(kf=ms.kf._replace(
            Tcw=jnp.asarray(dT) @ ms.kf.Tcw))
        traj = TJ.refresh(traj, ms.kf.Tcw, ms.kf.bad, ms.kf.span_parent,
                          ms.kf.Tcp)
        got = np.asarray(traj.Tcw[0])
        want = dT @ Tf
        assert np.allclose(got, want, atol=1e-4), (
            f"frame did not follow the map move:\n{got}\nvs\n{want}")

    def test_landmark_slots_recycle(self):
        """Culled landmark rows must be reusable: a monotonic allocation
        cursor exhausted the fixed-capacity arena on long sequences (600-
        frame run hit the L cap at frame ~120, after which every new
        allocation — including re-initialization seeding — silently
        failed)."""
        ms, k0, k1, lm_idx = ms_with_two_kfs()
        L = ms.L
        # fill the arena completely
        n_live = int(np.asarray(ms.lm.valid.sum()))
        f = feats_with(32, seed=7)
        pos = np.tile([0.0, 0.0, 6.0], (32, 1)).astype(np.float32)
        while n_live < L:
            ms, idx = add_landmarks(
                ms, jnp.asarray(pos), f.desc, k0,
                jnp.arange(32, dtype=jnp.int32),
                jnp.ones(32, bool), protection=0,
            )
            got = int(np.asarray((np.asarray(idx) >= 0).sum()))
            if got == 0:
                break
            n_live += got
        assert int(np.asarray(ms.lm.valid.sum())) == L
        # full: new allocation must fail...
        ms, idx = add_landmarks(
            ms, jnp.asarray(pos[:4]), f.desc[:4], k0,
            jnp.arange(4, dtype=jnp.int32), jnp.ones(4, bool))
        assert (np.asarray(idx) == -1).all()
        # ...until slots are culled. A freshly-culled slot must NOT be
        # reused immediately — the RECYCLE_DELAY countdown keeps it
        # unallocatable until stale host-held indices have re-resolved
        # against the bad flag (ADVICE r4: same-pass cull->triangulate
        # reuse aliased the tracker's last-frame associations)
        bad = np.zeros(L, bool)
        bad[np.asarray(lm_idx[:6])] = True
        ms = set_landmarks_bad(ms, jnp.asarray(bad))
        ms, idx = add_landmarks(
            ms, jnp.asarray(pos[:4]), f.desc[:4], k0,
            jnp.arange(4, dtype=jnp.int32), jnp.ones(4, bool))
        assert (np.asarray(idx) == -1).all(), (
            "freshly-culled slots were reallocated before the delay expired")
        # tick the countdown down (mapper.cull_landmarks does this once per
        # integrate pass); after RECYCLE_DELAY passes the slots are free
        from hyslam_tpu.core.mapstate import RECYCLE_DELAY
        lm = ms.lm
        ms = ms._replace(lm=lm._replace(protection=jnp.where(
            lm.bad, jnp.maximum(lm.protection - RECYCLE_DELAY, 0),
            lm.protection)))
        ms, idx = add_landmarks(
            ms, jnp.asarray(pos[:4]), f.desc[:4], k0,
            jnp.arange(4, dtype=jnp.int32), jnp.ones(4, bool))
        idx = np.asarray(idx)
        assert (idx >= 0).all(), "culled slots were not recycled"
        assert set(idx.tolist()) <= set(np.asarray(lm_idx[:6]).tolist())
        # recycled rows come back clean
        assert not np.asarray(ms.lm.bad)[idx].any()
        assert (np.asarray(ms.lm.n_obs)[idx] == 1).all()  # creator binding

    def test_origin_not_erasable(self):
        ms, k0, _, _ = ms_with_two_kfs()
        bad = np.ones(8, bool)
        ms = set_keyframes_bad(ms, jnp.asarray(bad))
        assert not bool(ms.kf.bad[0])  # origin survives
        assert bool(ms.kf.bad[1])


class TestSubMaps:
    def test_create_and_scope(self):
        ms, _, _, _ = ms_with_two_kfs()
        ms, child = create_submap(ms)
        assert int(ms.maps.active) == int(child)
        f = feats_with(5, seed=9)
        ms, k2 = add_keyframe(
            ms, f, se3.identity(), 3.0, 3, 0, jnp.full((32,), -1, jnp.int32)
        )
        assert int(ms.kf.map_id[k2]) == int(child)
        kf_ok, lm_ok = visible_scope(ms)
        # active is the unregistered child: parent content out of scope
        assert not bool(kf_ok[0]) and bool(kf_ok[2])

    def test_register_merges_scope(self):
        ms, _, _, _ = ms_with_two_kfs()
        ms, child = create_submap(ms)
        f = feats_with(5, seed=9)
        ms, k2 = add_keyframe(
            ms, f, se3.identity(), 3.0, 3, 0, jnp.full((32,), -1, jnp.int32)
        )
        ms = register_submap(ms, child)
        ms = set_active_map(ms, 0)
        kf_ok, _ = visible_scope(ms)
        assert bool(kf_ok[0]) and bool(kf_ok[1]) and bool(kf_ok[2])
        # root resolution
        assert int(map_root(ms.maps, jnp.asarray(int(child)))) == 0

    def test_private_submap_hidden_from_parent(self):
        ms, _, _, _ = ms_with_two_kfs()
        ms, child = create_submap(ms)
        f = feats_with(5, seed=9)
        ms, k2 = add_keyframe(
            ms, f, se3.identity(), 3.0, 3, 0, jnp.full((32,), -1, jnp.int32)
        )
        ms = set_active_map(ms, 0)
        kf_ok, _ = visible_scope(ms)
        assert not bool(kf_ok[2])

    def test_apply_transform(self):
        ms, _, _, lm_idx = ms_with_two_kfs()
        T = se3.from_Rt(jnp.eye(3), jnp.asarray([1.0, 0.0, 0.0]))
        pos_before = np.asarray(ms.lm.pos[lm_idx[0]])
        cam_before = np.asarray(se3.translation(se3.inverse(ms.kf.Tcw[0])))
        ms = apply_transform_to_map(ms, 0, T)
        pos_after = np.asarray(ms.lm.pos[lm_idx[0]])
        np.testing.assert_allclose(pos_after, pos_before + [1, 0, 0], atol=1e-5)
        cam_after = np.asarray(se3.translation(se3.inverse(ms.kf.Tcw[0])))
        np.testing.assert_allclose(cam_after, cam_before + [1, 0, 0], atol=1e-5)
