"""ORB feature extraction pipeline: pyramid -> FAST -> grid top-k ->
orientation -> steered BRIEF, producing a fixed-capacity FrameFeatures.

Replaces ORBExtractor::operator() (src/features/ORBExtractor.{h,cc}): the
same stage structure, with the quadtree replaced by grid top-k selection and
all per-keypoint work batched (SURVEY.md §7.1). The per-level feature budget
follows the reference's geometric distribution over 8 levels at factor 1.2
(ORBExtractor ctor nfeatures-per-level computation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.ops.fast import fast_scores, nms3x3, select_keypoints
from hyslam_tpu.ops.orb import orient_and_describe
from hyslam_tpu.ops.pyramid import build_pyramid


class ExtractorConfig(NamedTuple):
    """Mirrors FeatureExtractorSettings (config/slam_feature_config.yaml:
    1000 features, 8 levels, x1.2, FAST threshold 20 init / 7 min, 30-cell
    grid -> ~cell size from image width)."""

    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_threshold: float = 7.0   # min threshold; strong corners rank higher
    cell_size: int = 32
    border: int = 19              # EDGE_THRESHOLD in the reference
    family: str = "ORB"           # feature family (ORB | SURF),
                                  # resolved by features.factory


def level_budgets(cfg: ExtractorConfig) -> list[int]:
    """Features per level, proportional to (1/scale)^level (reference ctor)."""
    inv = 1.0 / cfg.scale_factor
    raw = np.array([inv**i for i in range(cfg.n_levels)])
    n = np.floor(raw / raw.sum() * cfg.n_features).astype(int)
    n[0] += cfg.n_features - n.sum()
    return [int(x) for x in n]


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def extract(img: jnp.ndarray, cfg: ExtractorConfig, capacity: int) -> FrameFeatures:
    """Extract ORB features from a grayscale [H, W] f32 image into a
    FrameFeatures of the given capacity (>= cfg.n_features)."""
    budgets = level_budgets(cfg)
    pyr = build_pyramid(img, cfg.n_levels, cfg.scale_factor)

    uvs, levels, angles, descs, valids = [], [], [], [], []
    for lv, (im, n_lv) in enumerate(zip(pyr, budgets)):
        if n_lv <= 0:
            continue
        s = nms3x3(fast_scores(im, cfg.fast_threshold))
        uv, _, valid = select_keypoints(
            s, n_lv, cell=cfg.cell_size,
            border=max(4, int(round(cfg.border / cfg.scale_factor**lv))),
        )
        # fused patch path (same as the atlas extractor, so the two
        # extraction paths stay descriptor-compatible)
        ang, d = orient_and_describe(im, uv)
        scale = cfg.scale_factor ** lv
        uvs.append(uv * scale)
        levels.append(jnp.full((n_lv,), lv, jnp.int32))
        angles.append(ang)
        descs.append(d)
        valids.append(valid)

    uv = jnp.concatenate(uvs)
    level = jnp.concatenate(levels)
    angle = jnp.concatenate(angles)
    desc = jnp.concatenate(descs)
    valid = jnp.concatenate(valids)
    n = uv.shape[0]
    pad = capacity - n
    if pad < 0:
        raise ValueError(f"capacity {capacity} < total budget {n}")
    F = capacity
    return FrameFeatures(
        uv=jnp.pad(uv, ((0, pad), (0, 0))),
        ur=jnp.full((F,), -1.0, jnp.float32),
        depth=jnp.full((F,), -1.0, jnp.float32),
        level=jnp.pad(level, (0, pad)),
        angle=jnp.pad(angle, (0, pad)),
        desc=jnp.pad(desc, ((0, pad), (0, 0))),
        valid=jnp.pad(valid, (0, pad)),
    )
