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
