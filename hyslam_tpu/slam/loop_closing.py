"""Loop closing: detection, Sim3 computation, loop correction.

Replaces src/main/LoopClosing.cc — including the parts the reference keeps
but currently stubs out at detection (LoopClosing.cc:101-233; SURVEY.md §8
requires the full path as capability surface):

- DetectLoop: BoW candidates above the min covisible-neighbor score, with
  covisibility-consistency groups requiring 3 consecutive detections
  (LoopClosing.cc:152-227).
- ComputeSim3: descriptor matching (>= 20) -> Sim3 RANSAC ->
  OptimizeSim3 (>= 20 inliers) -> guided projection harvest (>= 40 total)
  (LoopClosing.cc:235-419).
- CorrectLoop: propagate the corrected Sim3 through the current KF's
  covisibility group, correct their landmarks, fuse duplicates, optimize the
  essential graph with the loop edge, then global BA
  (LoopClosing.cc:421-614, RunGlobalBundleAdjustment :681-799).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from hyslam_tpu.core import mapstate as M
from hyslam_tpu.core.mapstate import MapState
from hyslam_tpu.estimators.sim3_solver import sim3_ransac
from hyslam_tpu.features.bow import PlaceRecognizer, l1_score
from hyslam_tpu.features.matcher import match_descriptors
from hyslam_tpu.geometry import se3, sim3
from hyslam_tpu.geometry.camera import Camera
from hyslam_tpu.slam.mapper import _fuse_into_kf
from hyslam_tpu.solver.pose_graph import optimize_pose_graph
from hyslam_tpu.solver.sim3_opt import optimize_sim3

MIN_MATCHES_BOW = 20
MIN_INLIERS_SIM3 = 20
MIN_MATCHES_TOTAL = 40
CONSISTENCY_THRESHOLD = 3   # consecutive consistent detections
COVIS_ESSENTIAL = 100       # covis weight for essential-graph edges
KF_GAP = 10                 # min keyframes between loop closures


@dataclass
class LoopCloser:
    cam: Camera
    recognizer: PlaceRecognizer
    fix_scale: bool = True   # stereo/RGB-D: scale is observable
    consistency: list = field(default_factory=list)  # [(group_set, count)]
    loop_edges: list = field(default_factory=list)   # [(i, j, meas S_ji)]
    last_loop_kf: int = -(10**6)

    # -- detection ----------------------------------------------------------

    def detect(self, ms: MapState, kf_id: int):
        """Returns a consistent loop-candidate KF id or -1."""
        if kf_id - self.last_loop_kf < KF_GAP:
            return -1
        desc = ms.kf.desc[kf_id]
        valid = ms.kf.kp_valid[kf_id]
        covis = np.asarray(ms.covis)
        # min score among covisible neighbors
        nbrs = np.nonzero(covis[kf_id] >= 15)[0]
        if len(nbrs) == 0:
            return -1
        scores = self.recognizer.scores(desc, valid)
        min_score = max(float(scores[nbrs].min()), 0.01)
        cands = self.recognizer.detect_loop_candidates(
            desc, valid, covis, kf_id, min_score
        )
        if not cands:
            self.consistency = []
            return -1
        # covisibility-consistency: a candidate's group must intersect a
        # previously seen group on CONSISTENCY_THRESHOLD consecutive KFs
        new_consistency = []
        enough = -1
        for c in cands:
            group = set(np.nonzero(covis[c] >= 15)[0].tolist()) | {c}
            best_count = 0
            for prev_group, count in self.consistency:
                if group & prev_group:
                    best_count = max(best_count, count + 1)
            new_consistency.append((group, best_count))
            if best_count + 1 >= CONSISTENCY_THRESHOLD and enough < 0:
                enough = c
        self.consistency = new_consistency
        return enough

    # -- Sim3 ---------------------------------------------------------------

    def compute_sim3(self, ms: MapState, kf_id: int, cand: int):
        """Returns (ok, g_cl packed Sim3 cand-cam -> current-cam, n_inl)."""
        F = ms.F
        idx, n = match_descriptors(
            ms.kf.desc[kf_id], ms.kf.kp_valid[kf_id] & (ms.kf.lm_id[kf_id] >= 0),
            ms.kf.angle[kf_id],
            ms.kf.desc[cand], ms.kf.kp_valid[cand] & (ms.kf.lm_id[cand] >= 0),
            ms.kf.angle[cand],
            max_dist=50, ratio=0.75,
        )
        if int(n) < MIN_MATCHES_BOW:
            return False, None, 0
        lm_c = M.resolve_landmarks(ms, ms.kf.lm_id[kf_id])
        lm_l = M.resolve_landmarks(
            ms, ms.kf.lm_id[cand, jnp.clip(idx, 0, F - 1)]
        )
        pair_ok = (idx >= 0) & (lm_c >= 0) & (lm_l >= 0)
        Xw_c = ms.lm.pos[jnp.clip(lm_c, 0, ms.L - 1)]
        Xw_l = ms.lm.pos[jnp.clip(lm_l, 0, ms.L - 1)]
        X1 = se3.apply(ms.kf.Tcw[kf_id], Xw_c)     # current-cam coords
        X2 = se3.apply(ms.kf.Tcw[cand], Xw_l)      # cand-cam coords
        uv1 = ms.kf.uv[kf_id]
        uv2 = ms.kf.uv[cand, jnp.clip(idx, 0, F - 1)]
        is2_1 = 1.0 / (1.2 ** (2.0 * ms.kf.level[kf_id].astype(jnp.float32)))
        is2_2 = 1.0 / (
            1.2 ** (2.0 * ms.kf.level[cand, jnp.clip(idx, 0, F - 1)].astype(jnp.float32))
        )
        g, inl, n_inl = sim3_ransac(
            self.cam, self.cam, X1, X2, uv1, uv2, is2_1, is2_2, pair_ok,
            jax.random.PRNGKey(kf_id), fix_scale=self.fix_scale,
        )
        if int(n_inl) < MIN_INLIERS_SIM3:
            return False, None, int(n_inl)
        g, inl, n_inl = optimize_sim3(
            self.cam, self.cam, g, X1, X2, uv1, uv2, is2_1, is2_2, pair_ok,
            fix_scale=self.fix_scale,
        )
        if int(n_inl) < MIN_INLIERS_SIM3:
            return False, None, int(n_inl)
        n_total = int(n_inl) + self._guided_harvest(ms, kf_id, cand, g)
        if n_total < MIN_MATCHES_TOTAL:
            return False, None, n_total
        return True, g, n_total

    def _guided_harvest(self, ms: MapState, kf_id: int, cand: int, g_cl):
        """SearchByProjection(Scw) (LoopClosing.cc:343-419): project the
        loop-side landmarks (candidate KF + its covisible neighbors) through
        the corrected Sim3 into the current keyframe and count additional
        matches; the loop is accepted only when sim3-inliers + harvested
        matches reach MIN_MATCHES_TOTAL (the reference's >= 40 gate)."""
        from hyslam_tpu.features.matcher import search_by_projection_landmarks

        covis = np.asarray(ms.covis)
        kf_lm = np.asarray(jax.vmap(lambda r: M.resolve_landmarks(ms, r))(
            ms.kf.lm_id))
        rows = kf_lm[cand][kf_lm[cand] >= 0]
        for nb in np.nonzero(covis[cand] >= 15)[0][:10]:
            rows = np.concatenate([rows, kf_lm[nb][kf_lm[nb] >= 0]])
        rows = np.unique(rows)[: ms.F]
        padded = np.full(ms.F, -1, np.int32)
        padded[: len(rows)] = rows
        rowsj = jnp.asarray(padded)
        rc = jnp.clip(rowsj, 0, ms.L - 1)
        row_ok = (rowsj >= 0) & ms.lm.valid[rc] & ~ms.lm.bad[rc]

        # world -> current-cam through the corrected Sim3 (scaled SE3)
        S_cw = sim3.compose(g_cl, sim3.from_se3(ms.kf.Tcw[cand]))
        T_scw = sim3.to_se3_scaled(S_cw)
        feats = M.kf_features(ms, kf_id)
        res = search_by_projection_landmarks(
            self.cam, feats, T_scw,
            ms.lm.pos[rc], ms.lm.normal[rc], ms.lm.desc[rc],
            ms.lm.max_dist[rc], ms.lm.min_dist[rc], row_ok,
            already_matched=ms.kf.lm_id[kf_id] >= 0, th=7.5,
        )
        return int(res.n_matches)

    # -- correction ---------------------------------------------------------

    def correct(self, ms: MapState, kf_id: int, cand: int, g_cl):
        """CorrectLoop: propagate, fuse, essential graph, loop edge."""
        K = ms.K
        covis = np.asarray(ms.covis)
        kf_ok = np.asarray(ms.kf.valid & ~ms.kf.bad)

        # corrected Sim3 of the current KF: S_cw = g_cl o S_lw
        S_lw = sim3.from_se3(ms.kf.Tcw[cand])
        S_cw_corr = sim3.compose(g_cl, S_lw)

        # propagate to the current covisibility group (T_kc o S_cw)
        group = set(np.nonzero(covis[kf_id] >= 15)[0].tolist()) | {kf_id}
        group = [k for k in group if kf_ok[k]]
        T_cw = ms.kf.Tcw[kf_id]
        corrected = {}
        for k in group:
            T_kc = ms.kf.Tcw[k] @ se3.inverse(T_cw)
            corrected[k] = sim3.compose(sim3.from_se3(T_kc), S_cw_corr)

        # correct landmarks of the group: X' = S_new^-1 (S_old (X))
        lm_hit = np.zeros(ms.L, bool)
        kf_lm = np.asarray(ms.kf.lm_id)
        new_pos = np.array(ms.lm.pos)
        for k in group:
            rows = kf_lm[k][kf_lm[k] >= 0]
            rows = rows[~lm_hit[rows]]
            if len(rows) == 0:
                continue
            lm_hit[rows] = True
            S_old = sim3.from_se3(ms.kf.Tcw[k])
            S_new_inv = sim3.inverse(corrected[k])
            X = jnp.asarray(new_pos[rows])
            Xc = sim3.apply(S_new_inv, sim3.apply(S_old, X))
            new_pos[rows] = np.asarray(Xc)
        ms = ms._replace(lm=ms.lm._replace(pos=jnp.asarray(new_pos)))

        # write corrected SE3 poses for the group
        Tcw_new = np.array(ms.kf.Tcw)
        for k, S in corrected.items():
            Tcw_new[k] = np.asarray(sim3.to_se3_scaled(S))
        ms = ms._replace(kf=ms.kf._replace(Tcw=jnp.asarray(Tcw_new)))

        # fuse loop-side landmarks into the current group
        loop_rows = kf_lm[cand][kf_lm[cand] >= 0]
        for nb in np.nonzero(covis[cand] >= 15)[0][:5]:
            loop_rows = np.concatenate([loop_rows, kf_lm[nb][kf_lm[nb] >= 0]])
        loop_rows = np.unique(loop_rows)[: ms.F]
        rows = np.full(ms.F, -1, np.int32)
        rows[: len(loop_rows)] = loop_rows
        for k in list(group)[:5]:
            ms, _, _ = _fuse_into_kf(ms, int(k), jnp.asarray(rows), self.cam, th=4.0)
        ms = M.refresh_covisibility(ms)
        ms = M.update_landmark_stats(ms)

        # record the loop edge (measurement from corrected poses)
        meas = sim3.compose(
            sim3.from_se3(ms.kf.Tcw[cand]),
            sim3.inverse(sim3.from_se3(ms.kf.Tcw[kf_id])),
        )
        self.loop_edges.append((int(kf_id), int(cand), np.asarray(meas)))

        # essential-graph optimization
        ms = self.optimize_essential_graph(ms, fixed_kf=cand)
        self.last_loop_kf = kf_id
        return ms

    def optimize_essential_graph(self, ms: MapState, fixed_kf: int):
        """Build the Sim3 pose graph: spanning-tree edges + strong covis
        edges (>= 100) + accumulated loop edges; optimize and write back
        poses + landmark corrections (Optimizer::OptimizeEssentialGraph)."""
        K = ms.K
        kf_ok = np.asarray(ms.kf.valid & ~ms.kf.bad)
        g0 = jax.vmap(sim3.from_se3)(ms.kf.Tcw)
        g_before = g0

        covis = np.asarray(ms.covis)
        parents = np.asarray(ms.kf.span_parent)
        ei, ej, meas, wts = [], [], [], []

        def add_edge(i, j, w):
            ei.append(i)
            ej.append(j)
            m = sim3.compose(
                sim3.from_se3(ms.kf.Tcw[j]), sim3.inverse(sim3.from_se3(ms.kf.Tcw[i]))
            )
            meas.append(np.asarray(m))
            wts.append(w)

        seen = set()
        for k in range(K):
            if not kf_ok[k]:
                continue
            p = parents[k]
            if p >= 0 and kf_ok[p]:
                add_edge(int(p), k, 1.0)
                seen.add((min(int(p), k), max(int(p), k)))
        for i in range(K):
            if not kf_ok[i]:
                continue
            for j in np.nonzero(covis[i] >= COVIS_ESSENTIAL)[0]:
                if j <= i or not kf_ok[j]:
                    continue
                if (i, int(j)) in seen:
                    continue
                add_edge(i, int(j), 1.0)
                seen.add((i, int(j)))
        for (i, j, m) in self.loop_edges:
            ei.append(j)
            ej.append(i)
            meas.append(np.asarray(sim3.inverse(jnp.asarray(m))))
            wts.append(2.0)

        if not ei:
            return ms
        fixed = np.zeros(K, bool)
        fixed[fixed_kf] = True
        fixed |= ~kf_ok
        fixed |= np.asarray(ms.kf.origin)
        g_opt = optimize_pose_graph(
            g0, jnp.asarray(fixed),
            jnp.asarray(ei, jnp.int32), jnp.asarray(ej, jnp.int32),
            jnp.asarray(np.stack(meas)), jnp.ones(len(ei), bool),
            jnp.asarray(wts, jnp.float32),
            fix_scale=self.fix_scale,
        )
        # write back poses; correct each landmark through its first KF
        Tcw_new = jax.vmap(sim3.to_se3_scaled)(g_opt)
        ref = np.asarray(ms.lm.first_kf)
        refc = np.clip(ref, 0, K - 1)
        lm_ok = np.asarray(ms.lm.valid & ~ms.lm.bad) & (ref >= 0)
        S_old = g_before[refc]
        S_new_inv = jax.vmap(sim3.inverse)(g_opt[refc])
        X = ms.lm.pos
        Xc = jax.vmap(sim3.apply)(S_new_inv, jax.vmap(sim3.apply)(S_old, X))
        pos_new = jnp.where(jnp.asarray(lm_ok)[:, None], Xc, X)
        ms = ms._replace(
            kf=ms.kf._replace(Tcw=Tcw_new),
            lm=ms.lm._replace(pos=pos_new),
        )
        ms = M.update_landmark_stats(ms)
        return ms

    # -- driver -------------------------------------------------------------

    def process_keyframe(self, ms: MapState, kf_id: int):
        """Full LoopClosing::Run step for one keyframe. Returns
        (ms, closed: bool, info)."""
        self.recognizer.add_keyframe(
            kf_id, ms.kf.desc[kf_id], ms.kf.kp_valid[kf_id]
        )
        cand = self.detect(ms, kf_id)
        if cand < 0:
            return ms, False, {}
        ok, g_cl, n = self.compute_sim3(ms, kf_id, cand)
        if not ok:
            return ms, False, {"sim3_inliers": n}
        ms = self.correct(ms, kf_id, cand, g_cl)
        return ms, True, {"loop_kf": cand, "sim3_inliers": n}
