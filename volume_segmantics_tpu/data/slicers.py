"""Training data slicer: label sanitation + volume -> 2D slice extraction.

Covers the surface of reference volume_segmantics/data/slicers.py:14-149
(PNG export along z/y/x or a single axis, sequential relabeling, binary
``>1 -> 1`` squash, cleanup) with one TPU-first addition: the trainer can
consume slices **in memory** via `get_slice_arrays`, skipping the PNG disk
round-trip entirely. The PNG methods remain for API compatibility (SuRVoS2
and the reference CLI workflow rely on them).
"""

import logging
from pathlib import Path
from types import SimpleNamespace
from typing import List, Optional, Tuple, Union

import imageio
import numpy as np
from tqdm import tqdm

import volume_segmantics_tpu.utils.base_data_utils as utils
from volume_segmantics_tpu.data.base_data_manager import BaseDataManager


class TrainingDataSlicer(BaseDataManager):
    """Preprocesses a data volume + label volume pair and slices both along
    the z/y/x axes (or a single axis) into 2D images."""

    # Slicing iterates single planes along all three axes and the label
    # sanitation needs whole-volume numpy ops — training volumes (128-512³,
    # reference README.md:13) are materialised eagerly.
    ALLOW_LAZY_INGEST = False

    def __init__(
        self,
        data_vol: Union[str, np.ndarray],
        label_vol: Union[str, np.ndarray],
        settings: SimpleNamespace,
    ):
        super().__init__(data_vol, settings)
        self.settings = settings
        self.data_im_out_dir: Optional[Path] = None
        self.seg_im_out_dir: Optional[Path] = None
        self.seg_vol = self._load_labels(label_vol)
        self.multilabel = False
        self._sanitise_labels()

    def _load_labels(self, label_vol):
        self.label_vol_path = utils.setup_path_if_exists(label_vol)
        if self.label_vol_path is not None:
            vol, _ = utils.get_numpy_from_path(
                self.label_vol_path, internal_path=self.settings.seg_hdf5_path
            )
        else:
            vol = label_vol
        if self.downsample and vol.shape != self.data_vol_shape:
            # The reference never downsamples the label volume, silently
            # pairing half-resolution data slices with full-resolution
            # labels (a broken configuration). Labels are categorical, so
            # 2x reduce by stride-picking the leading voxel of each block —
            # ceil-shaped to match downsample_data's output dims.
            logging.info("Downsampling label volume by a factor of 2.")
            vol = vol[::2, ::2, ::2]
        if vol.shape != self.data_vol_shape:
            raise ValueError(
                f"Label volume shape {vol.shape} does not match the "
                f"preprocessed data volume shape {self.data_vol_shape}."
            )
        return vol

    # ------------------------------------------------------------------
    # Label sanitation (reference slicers.py:48-70 semantics)
    # ------------------------------------------------------------------

    def _sanitise_labels(self):
        """Ensure label values are sequential ints starting at 0, flag
        multi-label volumes, and record label codes."""
        seg_classes = np.unique(self.seg_vol)
        self.num_seg_classes = len(seg_classes)
        self.multilabel = self.num_seg_classes > 2
        logging.info(
            f"Number of classes in segmentation dataset: {self.num_seg_classes}"
        )
        logging.info(f"These classes are: {seg_classes}")
        if seg_classes[0] != 0 or not utils.sequential_labels(seg_classes):
            logging.info("Fixing label classes.")
            self._fix_label_classes(seg_classes)
        self.codes = [f"label_val_{i}" for i in seg_classes]

    # Kept as a public-ish named method for reference API familiarity.
    def _fix_label_classes(self, seg_classes):
        """Map each distinct label value to its rank (0-based), keeping the
        original dtype. Vectorized (searchsorted) rather than the
        reference's per-class masking loop."""
        self.seg_vol = np.searchsorted(seg_classes, self.seg_vol).astype(
            self.seg_vol.dtype
        )

    # Alias used by earlier revisions/tests.
    _preprocess_labels = _sanitise_labels

    # ------------------------------------------------------------------
    # In-memory slice access (TPU-native fast path; no reference equivalent)
    # ------------------------------------------------------------------

    def get_slice_arrays(self) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Returns (data_slices, label_slices) as lists of 2D uint8 arrays,
        in the same axis/index order the PNG export would produce. Labels
        get the same binary `>1 -> 1` squash as the PNG path."""
        axis_enum = utils.get_training_axis(self.settings)
        data_slices, label_slices = [], []
        for axis, index in utils.get_axis_index_pairs(self.data_vol.shape, axis_enum):
            data_slices.append(
                np.asarray(self._as_ubyte(
                    utils.axis_index_to_slice(self.data_vol, axis, index)
                ))
            )
            label_slices.append(self._label_slice(axis, index))
        return data_slices, label_slices

    def _label_slice(self, axis, index):
        s = np.array(
            utils.axis_index_to_slice(self.seg_vol, axis, index), copy=True
        )
        s = self._as_ubyte(s)
        if not self.multilabel:
            s[s > 1] = 1
        return s

    @staticmethod
    def _as_ubyte(arr):
        return arr if arr.dtype == np.uint8 else utils.img_as_ubyte(arr)

    # ------------------------------------------------------------------
    # PNG export path (API parity with reference slicers.py:72-149)
    # ------------------------------------------------------------------

    def output_data_slices(self, data_dir: Path, prefix: str) -> None:
        """Slice the image volume to PNGs on disk."""
        logging.info("Slicing data volume and saving slices to disk")
        self.data_im_out_dir = self._export_volume(
            self.data_vol, Path(data_dir), prefix, label=False
        )

    def output_label_slices(self, data_dir: Path, prefix: str) -> None:
        """Slice the label volume to PNGs on disk."""
        logging.info("Slicing label volume and saving slices to disk")
        self.seg_im_out_dir = self._export_volume(
            self.seg_vol, Path(data_dir), prefix, label=True
        )

    def _export_volume(self, vol, out_dir: Path, prefix: str, label: bool) -> Path:
        out_dir.mkdir(parents=True, exist_ok=True)
        axis_enum = utils.get_training_axis(self.settings)
        pairs = utils.get_axis_index_pairs(vol.shape, axis_enum)
        total = utils.get_num_of_ims(vol.shape, axis_enum)
        for axis, index in tqdm(pairs, total=total):
            if label:
                im = self._label_slice(axis, index)
            else:
                im = self._as_ubyte(utils.axis_index_to_slice(vol, axis, index))
            imageio.imwrite(out_dir / f"{prefix}_{axis}_stack_{index}.png", im)
        return out_dir

    # ------------------------------------------------------------------
    # Cleanup (reference slicers.py:135-149)
    # ------------------------------------------------------------------

    def clean_up_slices(self) -> None:
        """Deletes data and label image slices created by this slicer."""
        for im_dir in (self.data_im_out_dir, self.seg_im_out_dir):
            if im_dir is None or not im_dir.exists():
                continue
            pngs = list(im_dir.glob("*.png"))
            logging.info(f"Deleting {len(pngs)} images.")
            for png in pngs:
                png.unlink()
            logging.info("Deleting the empty directory.")
            im_dir.rmdir()
