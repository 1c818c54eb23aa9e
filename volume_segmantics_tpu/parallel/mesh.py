"""Device mesh + sharding helpers for data-parallel training and inference.

The reference is single-GPU with no distributed layer (SURVEY.md §2); here
scaling is first-class: a 1-D `data` mesh shards the slice/batch axis over
ICI, parameters are replicated, and XLA's GSPMD inserts the gradient
all-reduces and BatchNorm statistics reductions automatically — no explicit
collectives needed (the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the first `n_devices` devices (all by
    default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, sharded along axis 0."""
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
