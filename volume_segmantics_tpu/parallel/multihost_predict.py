"""Multi-host sharded prediction with per-host partial HDF5 writes.

SURVEY §5's volume-scale row calls for slice-axis sharding with "per-host
HDF5 chunk streaming over DCN" (SURVEY §7 stage 9). The recipe: every
process holds a contiguous block of slices along the sweep axis, the global
sharded array is assembled with `jax.make_array_from_process_local_data`
(no cross-host input movement — each host's block lands on its own
devices), ONE jitted sweep runs over the global array (GSPMD inserts any
DCN collectives), and every host downloads only its ADDRESSABLE output
shards and writes its own partial HDF5 file. The partials concatenate to
exactly the single-process result (pinned by
tests/test_parallel.py::test_two_process_dcn_prediction).
"""

import logging
from pathlib import Path
from typing import List, Optional, Tuple

import jax
import numpy as np

from volume_segmantics_tpu.parallel.mesh import batch_sharding


def local_slice_range(n_slices: int) -> Tuple[int, int]:
    """[start, stop) of the slice block this process should feed (uniform
    contiguous split along the leading axis; n_slices must divide evenly
    across processes)."""
    p, n_proc = jax.process_index(), jax.process_count()
    if n_slices % n_proc:
        raise ValueError(
            f"{n_slices} slices do not split evenly over {n_proc} processes; "
            "pad the volume to a multiple of the process count."
        )
    per = n_slices // n_proc
    return p * per, (p + 1) * per


def predict_local_block_to_hdf5(
    predictor,
    local_block: np.ndarray,
    out_stem,
    global_start: Optional[int] = None,
    output_probs: bool = False,
    internal_path: str = "/data",
) -> Path:
    """Sweep this process's slice block as part of the global sharded sweep
    and write the process's output slab to ``{out_stem}_part{pid:04d}.h5``.

    `local_block` is (n_local, H, W) uint8 with the SWEEP axis leading
    (callers rotate with utils.rotate_array_to_axis first; the partial files
    are then in that rotated frame). All processes must call this
    collectively with equal block sizes.
    """
    import h5py as h5

    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.utils.base_data_utils import Axis

    mesh = predictor.mesh
    sharding = batch_sharding(mesh)
    local_block = np.ascontiguousarray(local_block)
    global_vol = jax.make_array_from_process_local_data(sharding, local_block)
    n_global = global_vol.shape[0]
    pid = jax.process_index()

    # Route through the predictor's shape-keyed jit cache so repeated
    # same-shaped blocks reuse the compiled sweep instead of recompiling.
    fn = predictor._get_jitted(
        "multihost_sweep_Z",
        global_vol.shape,
        jax.jit(
            lambda variables, v: predictor._axis_sweep_trace(
                variables, v, Axis.Z
            ),
            out_shardings=(sharding, sharding),
        ),
    )
    labels_d, probs_d = fn(predictor.bundle.variables, global_vol)

    def local_rows(arr):
        shards = sorted(
            arr.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        rows = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        start = shards[0].index[0].start or 0
        # With the standard contiguous split a process's addressable output
        # rows are exactly the rows it fed; an explicit `global_start`
        # overrides the recorded stitch offset for callers embedding this
        # block at a custom position in a larger frame.
        return rows, (start if global_start is None else int(global_start))

    labels, start = local_rows(labels_d)
    out = Path(f"{out_stem}_part{pid:04d}.h5")
    logging.info(
        f"Process {pid}: writing slices [{start}, {start + labels.shape[0]}) "
        f"of {n_global} to {out}."
    )
    with h5.File(out, "w") as f:
        dset = f.create_dataset(
            internal_path, data=labels, compression=cfg.HDF5_COMPRESSION
        )
        dset.attrs["global_start"] = int(start)
        dset.attrs["global_slices"] = int(n_global)
        if output_probs:
            probs, pstart = local_rows(probs_d)
            pset = f.create_dataset(
                "/probs", data=probs, compression=cfg.HDF5_COMPRESSION
            )
            pset.attrs["global_start"] = int(pstart)
    return out


def stitch_partial_predictions(
    part_paths: List[Path], internal_path: str = "/data"
) -> np.ndarray:
    """Concatenate per-host partial files (any order) back into the full
    label volume (rotated frame — the frame the blocks were fed in)."""
    import h5py as h5

    parts = []
    for p in part_paths:
        with h5.File(p, "r") as f:
            d = f[internal_path]
            parts.append((int(d.attrs["global_start"]), d[()]))
    parts.sort(key=lambda t: t[0])
    return np.concatenate([arr for _, arr in parts], axis=0)
