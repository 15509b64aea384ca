"""Feature factory: pluggable feature families selected from config.

Capability parity with src/features/FeatureFactory.h:21-33 and
ORBFactory/SURFFactory (ORBFactory.cpp:13-120): a single config-keyed
object produces the family's extractor, descriptor distance, matching
thresholds and vocabulary trainer, so the rest of the system is
family-agnostic.

Families:
- "ORB": FAST + grid top-k + steered BRIEF-256 (features.extractor /
  features.atlas), Hamming distance, thresholds TH_HIGH=100 / TH_LOW=50
  (the reference ORB defaults, slam_feature_config.yaml).
- "SURF": box-filter determinant-of-Hessian detection + binary Haar
  descriptor (ops.hessian) in the same 256-bit format, matched with the
  same Hamming kernels. Scale comes from four first-octave filter sizes
  instead of an image pyramid.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from hyslam_tpu.core.frame import FrameFeatures
from hyslam_tpu.features.extractor import ExtractorConfig
from hyslam_tpu.ops.fast import nms3x3, select_keypoints
from hyslam_tpu.ops.hamming import hamming_matrix
from hyslam_tpu.ops.hessian import (
    FILTER_SIZES, binary_haar_descriptors, doh_response,
)


class FeatureFamily(NamedTuple):
    """What FeatureFactory hands out (extractor/distance/matcher settings/
    vocabulary come from one object in the reference)."""

    name: str
    extract: Callable  # (img [H,W] f32, capacity) -> FrameFeatures
    distance_matrix: Callable  # ([Q,8]u32, [F,8]u32) -> [Q,F]
    th_high: float     # first-pass match acceptance (TH_HIGH)
    th_low: float      # strict acceptance (TH_LOW)
    extract_batch: Callable = None  # (imgs [B,H,W], capacity) ->
                       # batched FrameFeatures; one program for the whole
                       # batch (stereo pairs; the reference's two extractor
                       # threads, ImageProcessing.cpp:82-84)


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def extract_hessian(img: jnp.ndarray, cfg: ExtractorConfig,
                    capacity: int) -> FrameFeatures:
    """SURF-family extraction: per-filter-size DoH score maps, NMS + grid
    top-k selection, binary Haar descriptors. Single-resolution (box
    filters scale instead of the image, the SURF trick)."""
    n_scales = len(FILTER_SIZES)
    budgets = [cfg.n_features // n_scales] * n_scales
    budgets[0] += cfg.n_features - sum(budgets)

    uvs, levels, descs, valids = [], [], [], []
    for si, (L, n_s) in enumerate(zip(FILTER_SIZES, budgets)):
        if n_s <= 0:
            continue
        score = nms3x3(jnp.maximum(doh_response(img, L), 0.0))
        uv, _, valid = select_keypoints(
            score, n_s, cell=cfg.cell_size, border=max(L, cfg.border),
        )
        d = binary_haar_descriptors(img, uv, scale=L / 9.0)
        uvs.append(uv)
        levels.append(jnp.full((n_s,), si, jnp.int32))
        descs.append(d)
        valids.append(valid)

    uv = jnp.concatenate(uvs)
    level = jnp.concatenate(levels)
    desc = jnp.concatenate(descs)
    valid = jnp.concatenate(valids)
    pad = capacity - uv.shape[0]
    if pad < 0:
        raise ValueError(f"capacity {capacity} < budget {uv.shape[0]}")
    F = capacity
    return FrameFeatures(
        uv=jnp.pad(uv, ((0, pad), (0, 0))),
        ur=jnp.full((F,), -1.0, jnp.float32),
        depth=jnp.full((F,), -1.0, jnp.float32),
        level=jnp.pad(level, (0, pad)),
        angle=jnp.zeros((F,), jnp.float32),   # upright (U-SURF)
        desc=jnp.pad(desc, ((0, pad), (0, 0))),
        valid=jnp.pad(valid, (0, pad)),
    )


def make_family(cfg: ExtractorConfig) -> FeatureFamily:
    """Resolve the configured feature family (ORBFactory/SURFFactory
    selection, System.cc:78-85)."""
    name = getattr(cfg, "family", "ORB").upper()
    if name == "ORB":
        from hyslam_tpu.features.atlas import extract_atlas, extract_atlas_batch

        return FeatureFamily(
            name="ORB",
            extract=lambda img, capacity: extract_atlas(img, cfg, capacity),
            extract_batch=lambda imgs, capacity: extract_atlas_batch(
                imgs, cfg, capacity),
            distance_matrix=hamming_matrix,
            th_high=100.0, th_low=50.0,
        )
    if name in ("SURF", "HESSIAN"):
        return FeatureFamily(
            name="SURF",
            extract=lambda img, capacity: extract_hessian(img, cfg, capacity),
            extract_batch=lambda imgs, capacity: _extract_hessian_batch(
                imgs, cfg, capacity),
            distance_matrix=hamming_matrix,
            th_high=100.0, th_low=50.0,
        )
    raise ValueError(f"unknown feature family {name!r} (ORB | SURF)")


@partial(jax.jit, static_argnames=("cfg", "capacity"))
def _extract_hessian_batch(imgs: jnp.ndarray, cfg: ExtractorConfig,
                           capacity: int) -> FrameFeatures:
    return jax.vmap(lambda im: extract_hessian(im, cfg, capacity))(imgs)
