"""Device mesh construction for sharded SLAM workloads."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_names=("lm", "model")):
    """Build a 2D mesh (lm, model): the 'lm' axis shards landmark /
    observation blocks (Schur partial sums are psum'ed over it); the
    'model' axis is reserved for sharding the dense reduced-camera solve at
    large K. With few devices the model axis is 1."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    model = 1
    mesh_devices = np.asarray(devs).reshape(n // model, model)
    return Mesh(mesh_devices, axis_names)


def make_mesh_2d(n_devices: int | None = None, kf: int = 2,
                 axis_names=("kf", "lm")):
    """2-D (kf, lm) mesh for the keyframe-AND-landmark-sharded BA
    (BASELINE north star: partition keyframes and map blocks per host).
    The 'kf' axis shards the reduced camera system's column blocks, the
    'lm' axis shards landmark/observation blocks."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    kf = max(1, min(kf, n))
    while n % kf:
        kf -= 1
    mesh_devices = np.asarray(devs).reshape(kf, n // kf)
    return Mesh(mesh_devices, axis_names)
