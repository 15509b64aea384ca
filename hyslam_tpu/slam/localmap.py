"""Local-map construction for TrackLocalMap.

Replaces TrackLocalMap::UpdateLocalKeyFrames/UpdateLocalPoints
(src/slam/tracking/TrackLocalMap.cpp:80-184): keyframes are voted by the
current frame's matched landmarks (each landmark votes for its observers),
the top voters' covisibility neighbors are added (cap 80 KFs), and all
landmarks observed by the local keyframe set are harvested into a
fixed-capacity local landmark table for the projection matcher.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from hyslam_tpu.core.mapstate import MapState, visible_scope

MAX_LOCAL_KFS = 80  # reference cap (TrackLocalMap.cpp: 80)


class LocalMap(NamedTuple):
    lm_idx: jnp.ndarray       # [Lloc] landmark arena ids (-1 pad)
    lm_pos: jnp.ndarray       # [Lloc, 3]
    lm_normal: jnp.ndarray    # [Lloc, 3]
    lm_desc: jnp.ndarray      # [Lloc, 8]
    lm_max_dist: jnp.ndarray  # [Lloc]
    lm_min_dist: jnp.ndarray  # [Lloc]
    lm_valid: jnp.ndarray     # [Lloc]
    kf_mask: jnp.ndarray      # [K] local keyframe set
    ref_kf: jnp.ndarray       # [] best-voted keyframe (reference KF)


@partial(jax.jit, static_argnames=("capacity",))
def build_local_map(ms: MapState, frame_lm_id: jnp.ndarray, capacity: int = 4096
                    ) -> LocalMap:
    """frame_lm_id: [F] current frame's landmark associations (-1 none)."""
    K, L, O = ms.K, ms.L, ms.O
    kf_scope, lm_scope = visible_scope(ms)

    # --- vote keyframes through the matched landmarks' observation lists ---
    has = frame_lm_id >= 0
    lmc = jnp.clip(frame_lm_id, 0, L - 1)
    obs_kf = ms.lm.obs_kf[lmc]                    # [F, O]
    obs_ok = ms.lm.obs_valid[lmc] & has[:, None]
    votes = jax.ops.segment_sum(
        obs_ok.reshape(-1).astype(jnp.int32),
        jnp.where(obs_ok, jnp.clip(obs_kf, 0, K - 1), K).reshape(-1),
        num_segments=K + 1,
    )[:K]
    votes = jnp.where(kf_scope, votes, 0)
    ref_kf = jnp.argmax(votes)

    # --- top voters + their best covis neighbors (cap MAX_LOCAL_KFS) ---
    top_v, top_i = jax.lax.top_k(votes, min(MAX_LOCAL_KFS, K))
    kf_mask = jnp.zeros((K,), bool).at[top_i].set(top_v > 0)
    # one-hop covis expansion from the voters (neighbors with weight >= 15)
    covis_from_voters = jnp.max(
        jnp.where(kf_mask[:, None], ms.covis, 0), axis=0
    )
    kf_mask = kf_mask | (covis_from_voters >= 15)
    kf_mask = kf_mask & kf_scope

    # --- harvest landmarks of local KFs ---
    lm_hit = jnp.zeros((L,), bool)
    src = jnp.where(
        kf_mask[:, None] & (ms.kf.lm_id >= 0), jnp.clip(ms.kf.lm_id, 0, L - 1), L
    )
    lm_hit = jnp.zeros((L + 1,), bool).at[src.reshape(-1)].set(True, mode="drop")[:L]
    lm_hit = lm_hit & lm_scope

    score = lm_hit.astype(jnp.int32)
    _, sel = jax.lax.top_k(score, capacity)
    sel_ok = lm_hit[sel]
    lm_idx = jnp.where(sel_ok, sel, -1)
    selc = jnp.clip(sel, 0, L - 1)
    return LocalMap(
        lm_idx=lm_idx,
        lm_pos=ms.lm.pos[selc],
        lm_normal=ms.lm.normal[selc],
        lm_desc=ms.lm.desc[selc],
        lm_max_dist=ms.lm.max_dist[selc],
        lm_min_dist=ms.lm.min_dist[selc],
        lm_valid=sel_ok,
        kf_mask=kf_mask,
        ref_kf=ref_kf,
    )
