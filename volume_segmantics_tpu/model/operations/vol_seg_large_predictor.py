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


class VolSegLargeVolPredictor:
    """Slab-streamed single/3-axis prediction with host-memmap accumulation.

    The single-axis and 3-axis paths read input slabs with basic slicing
    only, so `data_vol` may be a numpy array, a memmap, or an h5py Dataset
    — volumes larger than host RAM stream straight from disk. The 12-way
    paths additionally take np.rot90 views of the input and therefore need
    an in-RAM array or memmap.

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

    def _memmap(self, name, shape, dtype):
        return np.lib.format.open_memmap(
            self.workdir / f"{name}.npy", mode="w+", shape=tuple(shape), dtype=dtype
        )

    @staticmethod
    def _read_axis_slab(vol, axis, start, stop) -> np.ndarray:
        """Slices [start, stop) along `axis`, returned in the rotated
        orientation (slice index leading). Only basic slicing is used, so
        `vol` may be a numpy array, a memmap, or an h5py Dataset — the
        streaming sweeps never need the whole volume in RAM."""
        if axis == Axis.Z:
            return np.asarray(vol[start:stop])
        if axis == Axis.Y:
            return np.asarray(vol[:, start:stop]).swapaxes(0, 1)
        return np.asarray(vol[:, :, start:stop]).swapaxes(0, 2)

    def _predict_axis_streaming(self, data_vol, axis, labels_out, probs_out):
        """Sweep one axis in slabs. `labels_out`/`probs_out` are (D, H, W)
        arrays in the ROTATED orientation of `axis` (caller handles the
        inverse rotation via index mapping). `probs_out` may be None when
        only labels are needed (one-hot voting). `data_vol` may be any
        basic-sliceable 3-D source (ndarray / memmap / h5py Dataset)."""
        n = data_vol.shape[axis.value]
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
                np.ascontiguousarray(
                    self._read_axis_slab(data_vol, axis, start, stop)
                )
            )
            labels_d, probs_d = self.predictor._sweep_axis_device(
                chunk_dev, Axis.Z
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

    def predict_3_ways(self, data_vol, prefix: str = "") -> tuple:
        """3-axis max-prob TTA over an arbitrarily large in-RAM (or memmap)
        uint8 volume. Returns (labels u8 memmap, probs f16 memmap)."""
        shape = data_vol.shape
        acc_labels = self._memmap(f"{prefix}labels", shape, np.uint8)
        acc_probs = self._memmap(f"{prefix}probs", shape, np.float16)

        logging.info("Streaming YX (z-axis) sweep.")
        self._predict_axis_streaming(data_vol, Axis.Z, acc_labels, acc_probs)

        for axis in (Axis.Y, Axis.X):
            logging.info(f"Streaming sweep along axis {axis.name}.")
            rot_shape = tuple(
                shape[i] for i in ((1, 0, 2) if axis == Axis.Y else (2, 1, 0))
            )
            tmp_labels = self._memmap(
                f"{prefix}labels_{axis.name}", rot_shape, np.uint8
            )
            tmp_probs = self._memmap(
                f"{prefix}probs_{axis.name}", rot_shape, np.float16
            )
            self._predict_axis_streaming(data_vol, axis, tmp_labels, tmp_probs)
            # Rotate back views (swapaxes on memmaps is a zero-copy view)
            back_labels = utils.rotate_array_to_axis(tmp_labels, axis)
            back_probs = utils.rotate_array_to_axis(tmp_probs, axis)
            logging.info(f"Merging {axis.name} sweep into accumulator.")
            self._merge_into(acc_labels, acc_probs, back_labels, back_probs)
        return acc_labels, acc_probs

    def predict_12_ways(self, data_vol) -> tuple:
        """12-way max-prob TTA (3 axes x 4 in-plane rotations; reference
        predictor :100-116) with bounded memory: each rotation streams
        through the device against a zero-copy np.rot90 VIEW of the input,
        and per-rotation results merge slab-wise into the accumulator in the
        reference's rotation order."""
        acc_labels, acc_probs = self.predict_3_ways(data_vol, prefix="rot0_")
        for k in range(1, 4):
            logging.info(f"Streaming sweeps of volume rotated {k * 90} degrees.")
            rotated_view = np.rot90(data_vol, k)  # zero-copy
            lab_k, prob_k = self.predict_3_ways(rotated_view, prefix=f"rot{k}_")
            logging.info(
                f"Merging rot {k * 90} deg volume with rot {(k - 1) * 90} deg "
                "volume."
            )
            self._merge_into(
                acc_labels, acc_probs,
                np.rot90(lab_k, -k), np.rot90(prob_k, -k),
                slab=self.slab_size,
            )
        return acc_labels, acc_probs

    # ------------------------------------------------------------------
    # One-hot vote streaming (reference predictor :118-136 semantics)
    # ------------------------------------------------------------------

    def _accumulate_votes(self, votes, labels_view):
        """votes (C, D, H, W) += one_hot(labels_view) slab-wise along D."""
        n_classes = votes.shape[0]
        slab = self.slab_size
        for start in range(0, labels_view.shape[0], slab):
            stop = min(start + slab, labels_view.shape[0])
            chunk = np.asarray(labels_view[start:stop])
            for c in range(n_classes):
                votes[c, start:stop] += (chunk == c).astype(np.uint8)

    def _three_way_votes(self, data_vol, votes, prefix: str = ""):
        """Add the 3-axis one-hot votes for `data_vol` into `votes`
        (both in the SAME orientation as data_vol)."""
        shape = data_vol.shape
        for axis in (Axis.Z, Axis.Y, Axis.X):
            logging.info(f"Streaming one-hot sweep along axis {axis.name}.")
            rot_shape = tuple(
                shape[i]
                for i in {
                    Axis.Z: (0, 1, 2), Axis.Y: (1, 0, 2), Axis.X: (2, 1, 0)
                }[axis]
            )
            tmp_labels = self._memmap(
                f"{prefix}oh_labels_{axis.name}", rot_shape, np.uint8
            )
            self._predict_axis_streaming(data_vol, axis, tmp_labels, None)
            self._accumulate_votes(
                votes, utils.rotate_array_to_axis(tmp_labels, axis)
            )

    def predict_single_axis_one_hot(self, data_vol, axis=Axis.Z):
        """Streaming single-axis one-hot votes: (C, D, H, W) uint8 memmap."""
        shape = data_vol.shape
        rot_shape = tuple(
            shape[i]
            for i in {Axis.Z: (0, 1, 2), Axis.Y: (1, 0, 2), Axis.X: (2, 1, 0)}[axis]
        )
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
        """Streaming 12-way one-hot vote summation: per-rotation votes
        accumulate into rotated-orientation memmaps and are added back
        through zero-copy np.rot90 views."""
        votes = self._memmap(
            "oh_votes", (self.predictor.num_labels,) + data_vol.shape, np.uint8
        )
        self._three_way_votes(data_vol, votes, prefix="rot0_")
        for k in range(1, 4):
            logging.info(
                f"Streaming one-hot sweeps of volume rotated {k * 90} degrees."
            )
            rotated_view = np.rot90(data_vol, k)
            votes_k = self._memmap(
                f"rot{k}_oh_votes",
                (self.predictor.num_labels,) + rotated_view.shape,
                np.uint8,
            )
            self._three_way_votes(rotated_view, votes_k, prefix=f"rot{k}_")
            back = np.rot90(votes_k, -k, axes=(1, 2))
            slab = self.slab_size
            for start in range(0, votes.shape[1], slab):
                stop = min(start + slab, votes.shape[1])
                votes[:, start:stop] += back[:, start:stop]
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
            labels = self._memmap("labels", data_vol.shape, np.uint8)
            probs = self._memmap("probs", data_vol.shape, np.float16)
            self._predict_axis_streaming(data_vol, Axis.Z, labels, probs)
        else:
            labels, probs = self.predict_3_ways(data_vol)
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
