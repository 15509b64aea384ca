"""ORB keypoint orientation + steered binary descriptors, batched.

Replaces the reference's IC_Angle + rBRIEF computation
(src/features/ORBExtractor.cpp:496-562, ORBFinder rBRIEF from the WILLOW
GARAGE lineage). Differences by design:

- The sampling pattern is NOT the learned OpenCV constellation; it is a
  deterministic seeded Gaussian BRIEF pattern (sigma = patch/5, the classic
  BRIEF-32 recipe). Matching is always our-descriptor vs our-descriptor, so
  only internal consistency matters; a Gaussian pattern performs within a
  few percent of the learned one on matching benchmarks.
- All keypoints are processed as one [N, 961] gather batch + [N, 256, 2]
  rotated-pattern gather: no per-keypoint loops.

Angles follow the reference convention: intensity-centroid moments over a
radius-15 circular patch.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PATCH_RADIUS = 15            # HALF_PATCH_SIZE in the reference
PATTERN_BITS = 256
_PATTERN_CLIP = 13           # keep rotated samples inside the 31x31 patch


def _make_pattern(seed: int = 7, n_bits: int = PATTERN_BITS) -> np.ndarray:
    """[n_bits, 2, 2] int32 (pair, point, (dx, dy)) Gaussian BRIEF pattern."""
    rng = np.random.default_rng(seed)
    sigma = (2 * PATCH_RADIUS + 1) / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 2, 2))
    return np.clip(np.round(pts), -_PATTERN_CLIP, _PATTERN_CLIP).astype(np.int32)

PATTERN = _make_pattern()

# circular patch mask offsets for the orientation moments
_dy, _dx = np.mgrid[-PATCH_RADIUS : PATCH_RADIUS + 1, -PATCH_RADIUS : PATCH_RADIUS + 1]
_CIRC = (_dy * _dy + _dx * _dx) <= PATCH_RADIUS * PATCH_RADIUS
PATCH_DY = _dy.reshape(-1)
PATCH_DX = _dx.reshape(-1)
PATCH_MASK = _CIRC.reshape(-1)


def _gather_pixels(img: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Clamped 2D gather: img [H, W], ys/xs [...] int32 -> [...].

    Linearized to a 1D take on the flattened image: XLA lowers a 1-D
    gather ~30% faster than the 2-D advanced-indexing form on TPU
    (measured 8.5 vs 11.6 ms for the 1M-sample orientation patch batch,
    PROFILE_r05.md)."""
    h, w = img.shape
    ys = jnp.clip(ys, 0, h - 1)
    xs = jnp.clip(xs, 0, w - 1)
    return jnp.take(img.reshape(-1), ys * w + xs)


@jax.jit
def orientations(img: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid angles (radians) for keypoints uv [N, 2] (x, y)
    on a level image [H, W] (ORBExtractor IC_Angle analog)."""
    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    ys = y0[:, None] + jnp.asarray(PATCH_DY)[None, :]
    xs = x0[:, None] + jnp.asarray(PATCH_DX)[None, :]
    p = _gather_pixels(img, ys, xs) * jnp.asarray(PATCH_MASK, jnp.float32)[None, :]
    m10 = jnp.sum(p * jnp.asarray(PATCH_DX, jnp.float32)[None, :], axis=-1)
    m01 = jnp.sum(p * jnp.asarray(PATCH_DY, jnp.float32)[None, :], axis=-1)
    return jnp.arctan2(m01, m10)


@jax.jit
def descriptors(
    img_blur: jnp.ndarray, uv: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF-256 descriptors [N, 8] uint32 from a BLURRED level
    image. uv [N, 2] (x, y) in level coords, angle [N] radians."""
    pat = jnp.asarray(PATTERN, jnp.float32)        # [256, 2, 2] (dx, dy)
    ca = jnp.cos(angle)[:, None, None]
    sa = jnp.sin(angle)[:, None, None]
    dx = pat[None, ..., 0]
    dy = pat[None, ..., 1]
    rx = jnp.round(ca * dx - sa * dy).astype(jnp.int32)   # [N, 256, 2]
    ry = jnp.round(sa * dx + ca * dy).astype(jnp.int32)
    x0 = jnp.round(uv[:, 0]).astype(jnp.int32)[:, None, None]
    y0 = jnp.round(uv[:, 1]).astype(jnp.int32)[:, None, None]
    vals = _gather_pixels(img_blur, y0 + ry, x0 + rx)     # [N, 256, 2]
    bits = vals[..., 0] < vals[..., 1]                     # [N, 256]
    from hyslam_tpu.ops.hamming import pack_bits

    return pack_bits(bits)
