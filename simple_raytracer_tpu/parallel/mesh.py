"""Device mesh helpers for SPMD rendering.

The reference is a single-device renderer (SURVEY C24); multi-chip scaling
is a new capability: a 1-D ``jax.sharding.Mesh`` with data parallelism over
horizontal pixel bands.  Rendering is communication-free (pixel RNG streams
are independent, render.cl:496); the only collective is the implicit gather
when the host reads the sharded canvas at image-save time.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"


def make_mesh(devices: Optional[Sequence] = None, n: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over `devices` (default: all local devices,
    optionally truncated to `n`)."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        devices = devices[:n]
    import numpy as np
    return Mesh(np.asarray(devices), (DP_AXIS,))


def canvas_sharding(mesh: Mesh) -> NamedSharding:
    """(H, W, 3) canvas sharded by rows across the dp axis."""
    return NamedSharding(mesh, P(DP_AXIS, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
