"""Device-mesh helpers.

The reference is strictly single-process single-GPU (SURVEY §2.15); the
TPU framework's scaling axis is a ``jax.sharding.Mesh``. Round-robin usage:
``data`` for DP gradient all-reduce over ICI; further axes (``model``) are
reserved for optional tensor sharding of the wide FC head.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis_name: str = "data"
) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_batch(batch, mesh: Mesh, axis_name: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
