"""Device mesh construction.

Two logical axes:

- ``data``  — data parallelism for the encoder (index-build embedding
  batches are split across it);
- ``index`` — the embedding store's row axis is sharded across it; queries
  are replicated and each chip scans its shard.

A single physical device set serves both: for index-build we want all chips
on ``data``; for serving we want all chips on ``index``. Rather than
re-meshing between phases, the default mesh puts all devices on ``index``
and the encoder treats ``index`` as its batch axis too (both uses are
embarrassingly parallel over devices, so the axis name only has to be
consistent within each jitted program).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
INDEX_AXIS = "index"


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, INDEX_AXIS),
              devices=None) -> Mesh:
    """Build a mesh over the local devices.

    ``shape=[]``/None → (1, n_devices): no data-axis split, full index
    sharding. An explicit shape must multiply to the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if not shape:
        shape = [1] * (len(axis_names) - 1) + [n]
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def default_mesh() -> Optional[Mesh]:
    """Mesh over all local devices; None on a single device (plain jit is
    both simpler and faster than a 1-device mesh)."""
    if jax.device_count() <= 1:
        return None
    return make_mesh()
