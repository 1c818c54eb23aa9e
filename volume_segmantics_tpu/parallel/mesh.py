"""Device mesh + sharding helpers for data-parallel training and inference.

The reference is single-GPU with no distributed layer (SURVEY.md §2); here
scaling is first-class: a 1-D `data` mesh shards the slice/batch axis over
ICI, parameters are replicated, and XLA's GSPMD inserts the gradient
all-reduces and BatchNorm statistics reductions automatically — no explicit
collectives needed (the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe).
"""

import logging
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPACE_AXIS = "space"

_distributed_initialized = False


def maybe_initialize_distributed() -> bool:
    """Multi-host (DCN) glue: initialize the JAX distributed runtime when
    `VOLSEG_TPU_DISTRIBUTED=1`.

    On TPU pods, `jax.distributed.initialize()` auto-discovers the
    coordinator from the TPU metadata; elsewhere it reads the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID variables.
    After initialization `jax.devices()` enumerates the GLOBAL device set,
    so `get_mesh()` and the DP train/eval/predict steps work unchanged —
    host data parallelism over DCN falls out of the same GSPMD program.
    Each process feeds its local batch shard through `shard_batch`.

    Returns True when running multi-process. Idempotent.
    """
    global _distributed_initialized
    if _distributed_initialized:
        return jax.process_count() > 1
    flag = os.environ.get("VOLSEG_TPU_DISTRIBUTED", "0").lower()
    if flag not in ("1", "true", "yes"):
        return False
    # On TPU pods initialize() auto-discovers everything; for manual
    # clusters (or simulation) the three standard variables are passed
    # through explicitly.
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = os.environ.get("JAX_NUM_PROCESSES")
    process_id = os.environ.get("JAX_PROCESS_ID")
    if coordinator and num_processes is not None and process_id is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(num_processes),
            process_id=int(process_id),
        )
    else:
        jax.distributed.initialize()
    _distributed_initialized = True
    logging.info(
        f"JAX distributed runtime up: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices."
    )
    return jax.process_count() > 1


def get_mesh(n_devices: Optional[int] = None, space: int = 1) -> Mesh:
    """Device mesh over the first `n_devices` devices (all by default).

    `space == 1` (default): 1-D data-parallel mesh. `space > 1`: 2-D
    (`data`, `space`) mesh — the batch axis shards over `data` and the
    image height axis over `space` (spatial partitioning: GSPMD inserts
    the conv halo exchanges and cross-shard BatchNorm reductions), which
    trades ICI traffic for per-device activation memory so large
    `image_size` training fits. Under `jax.distributed` the mesh spans
    every process's devices (ICI within a host/slice, DCN across hosts);
    keep `space` groups inside a host/slice so halos ride ICI, not DCN
    (devices are laid out row-major, so adjacent `space` coordinates are
    adjacent devices)."""
    maybe_initialize_distributed()
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if space <= 1:
        return Mesh(np.array(devices), (DATA_AXIS,))
    if len(devices) % space != 0:
        raise ValueError(
            f"spatial_partitions={space} must divide the device count "
            f"({len(devices)})."
        )
    grid = np.array(devices).reshape(len(devices) // space, space)
    return Mesh(grid, (DATA_AXIS, SPACE_AXIS))


def space_size(mesh: Mesh) -> int:
    """Size of the spatial-partition axis (1 on a pure data mesh)."""
    return mesh.shape.get(SPACE_AXIS, 1)


def nhwc_sharding(mesh: Mesh) -> NamedSharding:
    """Activation sharding for NHWC tensors: batch over `data`, height
    over `space` (no-op spec entries on a 1-D mesh)."""
    if space_size(mesh) == 1:
        return NamedSharding(mesh, P(DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS, SPACE_AXIS))


def nchw_sharding(mesh: Mesh) -> NamedSharding:
    """Activation sharding for NCHW tensors (loss-side layout)."""
    if space_size(mesh) == 1:
        return NamedSharding(mesh, P(DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS, None, SPACE_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host batch on the mesh, sharded along axis 0.

    Single-process: `batch` is the full global batch. Multi-process (DCN):
    `batch` is this process's LOCAL portion; the global array is assembled
    across processes without any cross-host data movement."""
    if mesh.devices.size == 1:
        # Plain upload: an explicit NamedSharding placement is a no-op on a
        # 1-device mesh but takes a measurably slower path on the tunneled
        # axon backend (see build_dp_train_step).
        return jnp.asarray(batch)
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
