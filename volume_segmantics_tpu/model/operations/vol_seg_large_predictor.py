"""Streaming predictor for volumes too large for device memory.

The reference caps out at in-RAM volumes with full-volume TTA containers
(reference vol_seg_2d_predictor.py:67-116 allocates (2, *shape) uint8 +
float16 arrays). This module scales the same TTA semantics to very large
volumes (e.g. 2048^3 synchrotron uCT): slices stream through the device in
slabs, outputs accumulate in host memmaps, and multi-axis merging happens
slab-wise with the same max-prob/tie rules. Slabs reuse the predictor's
per-shape compiled sweep (and its multi-device slice-axis sharding), so one
chip or a pod slice can chew through arbitrarily large volumes at constant
device-memory cost.
"""

import logging
import tempfile
from pathlib import Path
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

import volume_segmantics_tpu.utils.base_data_utils as utils
from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
    VolSeg2dPredictor,
)
from volume_segmantics_tpu.utils.base_data_utils import Axis, Quality

# ---------------------------------------------------------------------------
# View specs: signed axis permutations describing every TTA frame
# ---------------------------------------------------------------------------
# A "view spec" encodes a composition of np.rot90 in-plane rotations and
# axis reorientations as spec[i] = (src_axis, flip): view axis i draws from
# source axis src_axis, index-reversed when flip is True. All 12 TTA frames
# (4 rotations x 3 sweep axes; reference vol_seg_2d_predictor.py:100-116)
# live in this group, so ANY frame's leading-axis slab can be fetched from
# the original volume with one basic slice — h5py-Dataset-safe — and the
# transpose/flips run on device inside the sweep program
# (VolSeg2dPredictor._sweep_slab_device). No in-RAM np.rot90 input views.

_IDENTITY_SPEC = ((0, False), (1, False), (2, False))
_ROT90_SPEC = ((1, True), (0, False), (2, False))  # spec of np.rot90(V, 1)
_AXIS_SPECS = {
    Axis.Z: _IDENTITY_SPEC,
    Axis.Y: ((1, False), (0, False), (2, False)),
    Axis.X: ((2, False), (1, False), (0, False)),
}


def _compose_specs(outer, inner):
    """Spec of view(outer(inner(V))) — `inner` applied to the source first."""
    return tuple((inner[a][0], inner[a][1] ^ f) for (a, f) in outer)


def _view_spec(axis: Axis, rot_k: int = 0):
    """Spec of rotate_array_to_axis(np.rot90(V, rot_k), axis)."""
    spec = _IDENTITY_SPEC
    for _ in range(rot_k % 4):
        spec = _compose_specs(_ROT90_SPEC, spec)
    return _compose_specs(_AXIS_SPECS[axis], spec)


def _spec_shape(shape, spec):
    return tuple(shape[a] for a, _ in spec)


def _read_spec_slab(vol, spec, start, stop) -> np.ndarray:
    """Fetch the raw source chunk backing view-slab [start, stop) along the
    view's leading axis. Uses BASIC slicing only (ndarray / memmap / h5py
    Dataset all work); the chunk keeps SOURCE axis order — the view
    transform happens on device."""
    a0, f0 = spec[0]
    sel = [slice(None)] * 3
    n0 = vol.shape[a0]
    sel[a0] = slice(n0 - stop, n0 - start) if f0 else slice(start, stop)
    return np.ascontiguousarray(vol[tuple(sel)])


class VolSegLargeVolPredictor:
    """Slab-streamed single/3-axis/12-way prediction with host-memmap
    accumulation.

    EVERY path (including 12-way and one-hot voting) reads input slabs with
    basic slicing only, so `data_vol` may be a numpy array, a memmap, or an
    h5py Dataset — volumes larger than host RAM stream straight from disk.
    TTA rotations are folded into the on-device sweep via view specs (see
    module docstring above).

    Args:
        predictor: a VolSeg2dPredictor (its compiled sweeps are reused).
        workdir: directory for the output memmaps (defaults to a tempdir).
        slab_size: number of slices per device round-trip.
    """

    def __init__(
        self,
        predictor: VolSeg2dPredictor,
        workdir: Optional[Union[str, Path]] = None,
        slab_size: int = 64,
    ):
        self.predictor = predictor
        self._own_tmp = workdir is None
        self.workdir = Path(workdir or tempfile.mkdtemp(prefix="volseg_large_"))
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.slab_size = int(slab_size)
        if self._own_tmp:
            import shutil
            import weakref

            # Reclaim the accumulator memmaps when the predictor goes away.
            # Returned label/prob arrays are views over these files; on
            # POSIX, unlinking a file backing a live np.memmap is safe (the
            # mapping keeps the inode alive until munmap), so consumers can
            # keep reading results after the predictor is dropped — only
            # the disk space is reclaimed once the views die too.
            self._tmp_finalizer = weakref.finalize(
                self, shutil.rmtree, str(self.workdir), ignore_errors=True
            )

    def _memmap(self, name, shape, dtype):
        """Fresh accumulation memmap. Filenames carry a per-instance
        sequence number so successive predictions on one predictor NEVER
        reuse a path: mode='w+' truncates the inode, which would silently
        corrupt label/prob views returned to callers by earlier calls.
        Superseded files are reclaimed with the workdir (see __init__
        finalizer) or by the caller deleting the views."""
        self._memmap_seq = getattr(self, "_memmap_seq", 0) + 1
        return np.lib.format.open_memmap(
            self.workdir / f"{self._memmap_seq:03d}_{name}.npy",
            mode="w+", shape=tuple(shape), dtype=dtype,
        )

    def _predict_axis_streaming(
        self, data_vol, axis, labels_out, probs_out, rot_k: int = 0
    ):
        """Sweep one TTA frame (in-plane rotation `rot_k` x sweep `axis`) in
        slabs. `labels_out`/`probs_out` are (D, H, W) arrays in the FRAME
        orientation (slice index leading; caller handles the inverse
        rotation via index mapping). `probs_out` may be None when only
        labels are needed (one-hot voting). `data_vol` may be any
        basic-sliceable 3-D source (ndarray / memmap / h5py Dataset)."""
        spec = _view_spec(axis, rot_k)
        perm = tuple(a for a, _ in spec)
        flips = tuple(f for _, f in spec)
        n = data_vol.shape[perm[0]]
        slab = self.slab_size
        # 1-deep software pipeline: dispatch slab k (upload + sweep, all
        # async), then drain slab k-1's results to the host memmaps. The
        # host<->device transfers of consecutive slabs overlap the device
        # compute — on a slow link (this environment's tunnel measures
        # ~35 MB/s) transfers dominate the streaming path, so this is up
        # to a 2x wall-clock win; it costs one extra slab of HBM.
        pending = None
        for start in range(0, n, slab):
            stop = min(start + slab, n)
            chunk_dev = jnp.asarray(
                _read_spec_slab(data_vol, spec, start, stop)
            )
            labels_d, probs_d = self.predictor._sweep_slab_device(
                chunk_dev, perm, flips
            )
            if pending is not None:
                self._drain_slab(pending, labels_out, probs_out)
            pending = (start, stop, labels_d, probs_d)
        self._drain_slab(pending, labels_out, probs_out)
        return labels_out, probs_out

    def _drain_slab(self, pending, labels_out, probs_out):
        """Fetch a dispatched slab's results into the host accumulators
        (labels via the bit-packed download path)."""
        start, stop, labels_d, probs_d = pending
        labels_out[start:stop] = self.predictor._fetch_labels(labels_d)
        if probs_out is not None:
            probs_out[start:stop] = np.asarray(probs_d)

    @staticmethod
    def _merge_into(acc_labels, acc_probs, new_labels, new_probs, slab=64):
        """Slab-wise max-prob merge with ties keeping the accumulator
        (reference merge semantics, predictor :90-98)."""
        n = acc_labels.shape[0]
        for start in range(0, n, slab):
            stop = min(start + slab, n)
            al, ap = acc_labels[start:stop], acc_probs[start:stop]
            nl, np_ = new_labels[start:stop], new_probs[start:stop]
            take_new = np_ > ap
            al[take_new] = nl[take_new]
            ap[take_new] = np_[take_new]
            acc_labels[start:stop] = al
            acc_probs[start:stop] = ap

    @staticmethod
    def _rotated_shape(shape, axis: Axis) -> tuple:
        """Shape of a volume after rotating `axis` to the leading position
        (the orientation the streaming sweeps accumulate in)."""
        perm = {Axis.Z: (0, 1, 2), Axis.Y: (1, 0, 2), Axis.X: (2, 1, 0)}[axis]
        return tuple(shape[i] for i in perm)

    def predict_single_axis(self, data_vol, axis=Axis.Z, output_probs=True):
        """Streaming single-axis sweep (LOW quality). Accepts any
        basic-sliceable 3-D source (ndarray / memmap / h5py Dataset).
        Returns (labels u8, probs f16) as rotate-back VIEWS over the
        accumulation memmaps, in the original volume orientation; probs is
        None when `output_probs` is False (skips the float16 download and
        the memmap entirely)."""
        rot_shape = self._rotated_shape(data_vol.shape, axis)
        labels = self._memmap("labels", rot_shape, np.uint8)
        probs = self._memmap("probs", rot_shape, np.float16) if output_probs else None
        self._predict_axis_streaming(data_vol, axis, labels, probs)
        return (
            utils.rotate_array_to_axis(labels, axis),
            utils.rotate_array_to_axis(probs, axis) if output_probs else None,
        )

    def predict_3_ways(self, data_vol, prefix: str = "", rot_k: int = 0) -> tuple:
        """3-axis max-prob TTA over an arbitrarily large basic-sliceable
        volume, optionally in the rot90^rot_k TTA frame. Returns
        (labels u8 memmap, probs f16 memmap) in that frame's orientation."""
        frame_shape = _spec_shape(data_vol.shape, _view_spec(Axis.Z, rot_k))
        acc_labels = self._memmap(f"{prefix}labels", frame_shape, np.uint8)
        acc_probs = self._memmap(f"{prefix}probs", frame_shape, np.float16)

        logging.info("Streaming YX (z-axis) sweep.")
        self._predict_axis_streaming(
            data_vol, Axis.Z, acc_labels, acc_probs, rot_k=rot_k
        )

        for axis in (Axis.Y, Axis.X):
            logging.info(f"Streaming sweep along axis {axis.name}.")
            rot_shape = _spec_shape(data_vol.shape, _view_spec(axis, rot_k))
            tmp_labels = self._memmap(
                f"{prefix}labels_{axis.name}", rot_shape, np.uint8
            )
            tmp_probs = self._memmap(
                f"{prefix}probs_{axis.name}", rot_shape, np.float16
            )
            self._predict_axis_streaming(
                data_vol, axis, tmp_labels, tmp_probs, rot_k=rot_k
            )
            # Rotate back views (swapaxes on memmaps is a zero-copy view)
            back_labels = utils.rotate_array_to_axis(tmp_labels, axis)
            back_probs = utils.rotate_array_to_axis(tmp_probs, axis)
            logging.info(f"Merging {axis.name} sweep into accumulator.")
            self._merge_into(acc_labels, acc_probs, back_labels, back_probs)
        return acc_labels, acc_probs

    # The reference's 12 (rotation, axis) sweeps contain four exact
    # duplicates (see the dedup block comment in vol_seg_2d_predictor.py);
    # only these 8 are distinct, listed in the reference's merge priority
    # order with duplicates removed. Max-prob merging is an associative
    # priority-argmax (ties keep the earlier/accumulated value), so
    # sequential merging in this order is bit-identical to the reference's
    # grouped rotation merging — pinned by the streaming-vs-in-memory
    # equality tests (tests/test_large_predictor.py).
    DEDUP_SWEEPS = (
        (Axis.Z, 0), (Axis.Y, 0), (Axis.X, 0), (Axis.Y, 1),
        (Axis.X, 1), (Axis.Y, 2), (Axis.X, 2), (Axis.X, 3),
    )
    # Sweeps that stand in for a dropped duplicate count twice in one-hot
    # voting (total weight 12).
    _DOUBLE_WEIGHT = frozenset(
        [(Axis.Z, 0), (Axis.Y, 0), (Axis.Y, 1), (Axis.Y, 2)]
    )

    def predict_12_ways(self, data_vol) -> tuple:
        """12-way max-prob TTA with bounded memory via the 8 DISTINCT
        sweeps (1/3 less model compute and 1/3 fewer float16 prob
        downloads than sweeping all 12): every sweep streams straight from
        the (possibly lazy) source via view specs and merges slab-wise
        into the accumulator. Only the OUTPUT memmaps are rotated on the
        host (zero-copy views)."""
        acc_labels = self._memmap("labels", data_vol.shape, np.uint8)
        acc_probs = self._memmap("probs", data_vol.shape, np.float16)
        logging.info("Streaming YX (z-axis) sweep.")
        self._predict_axis_streaming(data_vol, Axis.Z, acc_labels, acc_probs)
        for axis, k in self.DEDUP_SWEEPS[1:]:
            logging.info(
                f"Streaming sweep along axis {axis.name} of the "
                f"{k * 90}-degree TTA frame."
            )
            rot_shape = _spec_shape(data_vol.shape, _view_spec(axis, k))
            tmp_labels = self._memmap(
                f"labels_{axis.name}{k}", rot_shape, np.uint8
            )
            tmp_probs = self._memmap(
                f"probs_{axis.name}{k}", rot_shape, np.float16
            )
            self._predict_axis_streaming(
                data_vol, axis, tmp_labels, tmp_probs, rot_k=k
            )
            # Back to the original orientation: zero-copy views only.
            back_l = np.rot90(utils.rotate_array_to_axis(tmp_labels, axis), -k)
            back_p = np.rot90(utils.rotate_array_to_axis(tmp_probs, axis), -k)
            logging.info("Merging sweep into accumulator.")
            self._merge_into(
                acc_labels, acc_probs, back_l, back_p, slab=self.slab_size
            )
        return acc_labels, acc_probs

    # ------------------------------------------------------------------
    # One-hot vote streaming (reference predictor :118-136 semantics)
    # ------------------------------------------------------------------

    def _accumulate_votes(self, votes, labels_view, weight: int = 1):
        """votes (C, D, H, W) += weight * one_hot(labels_view) slab-wise
        along D."""
        n_classes = votes.shape[0]
        slab = self.slab_size
        w = np.uint8(weight)
        for start in range(0, labels_view.shape[0], slab):
            stop = min(start + slab, labels_view.shape[0])
            chunk = np.asarray(labels_view[start:stop])
            for c in range(n_classes):
                votes[c, start:stop] += w * (chunk == c).astype(np.uint8)

    def _three_way_votes(self, data_vol, votes, prefix: str = "", rot_k: int = 0):
        """Add the 3-axis one-hot votes of the rot90^rot_k TTA frame into
        `votes` (which is in that frame's orientation)."""
        for axis in (Axis.Z, Axis.Y, Axis.X):
            logging.info(f"Streaming one-hot sweep along axis {axis.name}.")
            rot_shape = _spec_shape(data_vol.shape, _view_spec(axis, rot_k))
            tmp_labels = self._memmap(
                f"{prefix}oh_labels_{axis.name}", rot_shape, np.uint8
            )
            self._predict_axis_streaming(
                data_vol, axis, tmp_labels, None, rot_k=rot_k
            )
            self._accumulate_votes(
                votes, utils.rotate_array_to_axis(tmp_labels, axis)
            )

    def predict_single_axis_one_hot(self, data_vol, axis=Axis.Z):
        """Streaming single-axis one-hot votes: (C, D, H, W) uint8 memmap."""
        shape = data_vol.shape
        rot_shape = self._rotated_shape(shape, axis)
        votes = self._memmap(
            "oh_votes", (self.predictor.num_labels,) + shape, np.uint8
        )
        tmp_labels = self._memmap("oh_labels", rot_shape, np.uint8)
        self._predict_axis_streaming(data_vol, axis, tmp_labels, None)
        self._accumulate_votes(votes, utils.rotate_array_to_axis(tmp_labels, axis))
        return votes

    def predict_3_ways_one_hot(self, data_vol):
        """Streaming 3-axis one-hot vote summation."""
        votes = self._memmap(
            "oh_votes", (self.predictor.num_labels,) + data_vol.shape, np.uint8
        )
        self._three_way_votes(data_vol, votes)
        return votes

    def predict_12_ways_one_hot(self, data_vol):
        """Streaming 12-way one-hot vote summation via the 8 DISTINCT
        sweeps (the four that stand in for dropped duplicates count twice;
        total weight 12, identical to the reference's counts). Inputs
        stream via view specs — no host rot90 of the source; per-sweep
        label memmaps are added back through zero-copy np.rot90 views."""
        votes = self._memmap(
            "oh_votes", (self.predictor.num_labels,) + tuple(data_vol.shape),
            np.uint8,
        )
        for axis, k in self.DEDUP_SWEEPS:
            logging.info(
                f"Streaming one-hot sweep along axis {axis.name} of the "
                f"{k * 90}-degree TTA frame."
            )
            rot_shape = _spec_shape(data_vol.shape, _view_spec(axis, k))
            tmp_labels = self._memmap(
                f"oh_labels_{axis.name}{k}", rot_shape, np.uint8
            )
            self._predict_axis_streaming(
                data_vol, axis, tmp_labels, None, rot_k=k
            )
            back = np.rot90(utils.rotate_array_to_axis(tmp_labels, axis), -k)
            weight = 2 if (axis, k) in self._DOUBLE_WEIGHT else 1
            self._accumulate_votes(votes, back, weight)
        return votes

    def predict_to_hdf5(
        self,
        data_vol,
        output_path: Path,
        quality: Quality = Quality.MEDIUM,
        internal_path: str = "/data",
        chunking=True,
    ) -> None:
        """Predict and write labels (and probs) chunk-wise to gzip HDF5
        without materialising extra copies."""
        import h5py as h5

        if quality == Quality.LOW:
            # No probs memmap / float16 download: only labels are written.
            labels, _ = self.predict_single_axis(
                data_vol, axis=Axis.Z, output_probs=False
            )
        elif quality == Quality.HIGH:
            labels, _ = self.predict_12_ways(data_vol)
        else:
            labels, _ = self.predict_3_ways(data_vol)
        logging.info(f"Writing streamed prediction to {output_path}.")
        with h5.File(output_path, "w") as f:
            dset = f.create_dataset(
                internal_path,
                shape=labels.shape,
                dtype=np.uint8,
                chunks=chunking if chunking not in (True, None) else True,
                compression="gzip",
            )
            slab = self.slab_size
            for start in range(0, labels.shape[0], slab):
                stop = min(start + slab, labels.shape[0])
                dset[start:stop] = labels[start:stop]
