"""hyslam_tpu — a TPU-native SLAM/SfM engine (JAX / XLA / Pallas).

A from-scratch re-design of the capabilities of bmhopkinson/hyslam (an
ORB-SLAM2-derived hybrid SLAM/SfM system for ecosystem mapping) for TPU:

- ORB feature extraction / descriptor matching as batched XLA + Pallas kernels
  (:mod:`hyslam_tpu.ops`, :mod:`hyslam_tpu.features`),
- the state-machine tracker and job-based mapper re-expressed as batched JAX
  programs over SoA map arenas (:mod:`hyslam_tpu.slam`, :mod:`hyslam_tpu.core`),
- g2o's LM bundle adjustment replaced by a JAX Levenberg-Marquardt solver with
  dense Schur-complement reduction (:mod:`hyslam_tpu.solver`),
- multi-camera, recursive multi-map/sub-map trees, per-frame trajectories, and
  dual-camera imaging BA preserved as first-class subsystems,
- multi-host scaling via jax.sharding meshes + psum-reduced Schur assembly
  (:mod:`hyslam_tpu.parallel`).

See SURVEY.md at the repo root for the structural map of the reference system
(citations of the form ``file:line`` in module docstrings point into
``/root/reference``, the reference implementation this engine re-creates).
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry/solver correctness requires true float32 accumulation: TPU matmuls
# default to bfloat16 passes (~3 decimal digits), which is catastrophic for
# pose math (observed ~5e-3 abs error in 3x3 Rodrigues products). Hot kernels
# that WANT bf16 MXU throughput (descriptor Hamming matmuls, BoW scoring)
# opt back in explicitly with precision=DEFAULT / preferred_element_type.
_jax.config.update("jax_default_matmul_precision", "highest")

from hyslam_tpu.geometry import se3, so3, sim3  # noqa: F401
