"""Mesh construction and sharding helpers.

The reference's only parallelism is an mp.Pool fan-out over hyb rounds
(classes/field_of_view.py:1128-1142, SURVEY §2.11); the TPU-native
equivalent is a 1-D "data" mesh over which round/FOV batches are sharded
with `shard_map`, with ICI collectives replacing file locks (there is no
shared mutable state — results are sharded arrays).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D mesh over the first `n_devices` devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the mesh."""
    return NamedSharding(mesh, P(axis))
