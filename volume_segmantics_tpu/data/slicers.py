"""Training data slicer: label sanitation + volume -> 2D slice extraction.

Behavioral parity with reference volume_segmantics/data/slicers.py:14-149,
with one TPU-first difference: slices can be consumed **in memory** by the
trainer (`get_slice_arrays`) instead of making the PNG disk round-trip. The
PNG export methods are kept for API compatibility (SuRVoS2 and the reference
CLI workflow rely on them).
"""

import logging
import os
from pathlib import Path
from types import SimpleNamespace
from typing import List, Tuple, Union

import imageio
import numpy as np
from tqdm import tqdm

import volume_segmantics_tpu.utils.base_data_utils as utils
from volume_segmantics_tpu.data.base_data_manager import BaseDataManager


class TrainingDataSlicer(BaseDataManager):
    """Preprocesses a data volume + label volume pair and slices both along
    the z/y/x axes (or a single axis) into 2D images."""

    def __init__(
        self,
        data_vol: Union[str, np.ndarray],
        label_vol: Union[str, np.ndarray],
        settings: SimpleNamespace,
    ):
        super().__init__(data_vol, settings)
        self.data_im_out_dir = None
        self.seg_im_out_dir = None
        self.multilabel = False
        self.settings = settings
        self.label_vol_path = utils.setup_path_if_exists(label_vol)
        if self.label_vol_path is not None:
            self.seg_vol, _ = utils.get_numpy_from_path(
                self.label_vol_path, internal_path=settings.seg_hdf5_path
            )
        elif isinstance(label_vol, np.ndarray):
            self.seg_vol = label_vol
        self._preprocess_labels()

    def _preprocess_labels(self):
        """Relabel classes to sequential 0-based ints when needed
        (reference slicers.py:48-70)."""
        seg_classes = np.unique(self.seg_vol)
        self.num_seg_classes = len(seg_classes)
        if self.num_seg_classes > 2:
            self.multilabel = True
        logging.info(
            f"Number of classes in segmentation dataset: {self.num_seg_classes}"
        )
        logging.info(f"These classes are: {seg_classes}")
        if seg_classes[0] != 0 or not utils.sequential_labels(seg_classes):
            logging.info("Fixing label classes.")
            self._fix_label_classes(seg_classes)
        self.codes = [f"label_val_{i}" for i in seg_classes]

    def _fix_label_classes(self, seg_classes):
        for idx, current in enumerate(seg_classes):
            self.seg_vol[self.seg_vol == current] = idx

    # ------------------------------------------------------------------
    # In-memory slice access (TPU-native fast path; no reference equivalent)
    # ------------------------------------------------------------------

    def get_slice_arrays(self) -> Tuple[List[np.ndarray], List[np.ndarray]]:
        """Returns (data_slices, label_slices) as lists of 2D uint8 arrays,
        in the same axis/index order the PNG export would produce. Labels
        get the same binary `>1 -> 1` squash as `_output_im`."""
        axis_enum = utils.get_training_axis(self.settings)
        data_slices, label_slices = [], []
        for axis, index in utils.get_axis_index_pairs(self.data_vol.shape, axis_enum):
            d = utils.axis_index_to_slice(self.data_vol, axis, index)
            if d.dtype != np.uint8:
                d = utils.img_as_ubyte(d)
            s = np.array(
                utils.axis_index_to_slice(self.seg_vol, axis, index), copy=True
            )
            if s.dtype != np.uint8:
                s = utils.img_as_ubyte(s)
            if not self.multilabel:
                s[s > 1] = 1
            data_slices.append(np.asarray(d))
            label_slices.append(s)
        return data_slices, label_slices

    # ------------------------------------------------------------------
    # PNG export path (API parity with reference slicers.py:72-149)
    # ------------------------------------------------------------------

    def output_data_slices(self, data_dir: Path, prefix: str) -> None:
        """Slice the image volume to PNGs on disk."""
        data_dir = Path(data_dir)
        self.data_im_out_dir = data_dir
        logging.info("Slicing data volume and saving slices to disk")
        os.makedirs(data_dir, exist_ok=True)
        self._output_slices_to_disk(self.data_vol, data_dir, prefix)

    def output_label_slices(self, data_dir: Path, prefix: str) -> None:
        """Slice the label volume to PNGs on disk."""
        data_dir = Path(data_dir)
        self.seg_im_out_dir = data_dir
        logging.info("Slicing label volume and saving slices to disk")
        os.makedirs(data_dir, exist_ok=True)
        self._output_slices_to_disk(self.seg_vol, data_dir, prefix, label=True)

    def _output_slices_to_disk(self, data_arr, output_path, name_prefix, label=False):
        shape_tup = data_arr.shape
        axis_enum = utils.get_training_axis(self.settings)
        ax_idx_pairs = utils.get_axis_index_pairs(shape_tup, axis_enum)
        num_ims = utils.get_num_of_ims(shape_tup, axis_enum)
        for axis, index in tqdm(ax_idx_pairs, total=num_ims):
            out_path = output_path / f"{name_prefix}_{axis}_stack_{index}"
            self._output_im(
                utils.axis_index_to_slice(data_arr, axis, index), out_path, label
            )

    def _output_im(self, data, path, label=False):
        """Write one slice as a PNG; binary labels get values >1 squashed to 1
        (reference slicers.py:119-133)."""
        if data.dtype != np.uint8:
            data = utils.img_as_ubyte(data)
        if label and not self.multilabel:
            data = np.array(data, copy=True)
            data[data > 1] = 1
        imageio.imwrite(f"{path}.png", data)

    def _delete_image_dir(self, im_dir_path):
        if im_dir_path is not None and im_dir_path.exists():
            ims = list(im_dir_path.glob("*.png"))
            logging.info(f"Deleting {len(ims)} images.")
            for im in ims:
                im.unlink()
            logging.info("Deleting the empty directory.")
            im_dir_path.rmdir()

    def clean_up_slices(self) -> None:
        """Deletes data and label image slices created by this slicer."""
        self._delete_image_dir(self.data_im_out_dir)
        self._delete_image_dir(self.seg_im_out_dir)
