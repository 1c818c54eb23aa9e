"""Data-parallel volume sweeps: shard the slice axis across the mesh.

Prediction slices are embarrassingly parallel (no halos: the 2D model sees
one slice at a time and the TTA merge is pointwise), so each device sweeps a
contiguous slab of slices via shard_map; the surrounding global transposes /
rot90s / merges stay ordinary jnp ops that GSPMD repartitions over ICI.
This is the scale-out path SURVEY.md §5 calls for (slice-axis sharding for
big-volume TTA).
"""

from typing import Callable

import jax
from jax.sharding import PartitionSpec as P

from volume_segmantics_tpu.parallel.mesh import DATA_AXIS


def shard_mapped_sweep(sweep_trace: Callable, mesh) -> Callable:
    """Wrap a traceable (variables, vol, batch_size) -> (labels, probs)
    sweep so each mesh device processes its own slab of slices.

    The wrapped function takes (variables, vol, global_batch_size); vol's
    leading axis must be divisible by (n_devices * local_batch)."""
    n_dev = mesh.devices.size

    def dp_sweep(variables, vol, batch_size):
        local_bs = max(batch_size // n_dev, 1)

        def local_sweep(v, local_vol):
            return sweep_trace(v, local_vol, local_bs)

        return jax.shard_map(
            local_sweep,
            mesh=mesh,
            in_specs=(P(), P(DATA_AXIS)),
            out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        )(variables, vol)

    return dp_sweep
