"""Device-mesh construction.

Axes:
  'data'  — data parallelism: the batch is split along it, gradients are
            all-reduced across it (XLA psum over ICI).
  'model' — tensor parallelism: the head Dense kernels are sharded along
            it (models/heads.py annotations).

The reference's GPU_COUNT knob (reference config.py:20,154) maps to the
total number of chips = MESH_DATA × MESH_MODEL (see Config.update).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

AXIS_DATA = 'data'
AXIS_MODEL = 'model'


def mesh_devices(n: Optional[int] = None) -> Sequence:
    """The first `n` addressable devices (all if n is None)."""
    devs = jax.devices()
    if n is None:
        return devs
    if n > len(devs):
        raise ValueError(
            f"requested {n} devices but only {len(devs)} available "
            f"({[d.platform for d in devs[:1]]})")
    return devs[:n]


def make_mesh(config=None, data: Optional[int] = None,
              model: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Build the (data, model) mesh.

    Shapes come from the config (MESH_DATA, MESH_MODEL) unless given
    explicitly. With a single device this still returns a valid 1×1 mesh so
    every code path is mesh-shaped (no special single-chip branch).
    """
    if data is None:
        data = int(getattr(config, 'MESH_DATA', 1)) if config else 1
    if model is None:
        model = int(getattr(config, 'MESH_MODEL', 1)) if config else 1
    if devices is None:
        devices = mesh_devices(data * model)
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (AXIS_DATA, AXIS_MODEL))
