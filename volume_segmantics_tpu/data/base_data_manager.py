"""Shared volume ingestion for the slicer and the prediction manager.

A ``BaseDataManager`` turns whatever the user hands in — an HDF5/TIFF/NXS
path or an in-memory ndarray — into a pipeline-ready volume: optional 2x
block-mean downsampling, an optional mean ± k·σ clip-and-rescale to uint8,
and NaN scrubbing. The behavioral contract (attribute names, preprocessing
order, chunking passthrough) follows reference
volume_segmantics/data/base_data_manager.py:10-42.
"""

import logging
from pathlib import Path
from types import SimpleNamespace
from typing import Union

import numpy as np

import volume_segmantics_tpu.utils.base_data_utils as utils


class BaseDataManager:
    """Holds the preprocessed data volume plus its on-disk chunking.

    Attributes:
        data_vol: the (preprocessed) 3D numpy volume.
        data_vol_shape: shape after preprocessing.
        data_mean: mean of the volume before any clipping (NaNs ignored).
        input_data_chunking: HDF5 chunk shape of the source dataset, or
            True when the source had none (ndarray input / TIFF).
    """

    def __init__(
        self, data_vol: Union[Path, str, np.ndarray], settings: SimpleNamespace
    ) -> None:
        self.settings = settings
        self.st_dev_factor = settings.st_dev_factor
        self.downsample = settings.downsample
        self.data_vol_path = utils.setup_path_if_exists(data_vol)
        self.data_vol, self.input_data_chunking = self._ingest(data_vol)
        self._preprocess_data()

    def _ingest(self, data_vol):
        """Resolve the input to (ndarray, chunking)."""
        if self.data_vol_path is not None:
            return utils.get_numpy_from_path(
                self.data_vol_path, internal_path=self.settings.data_hdf5_path
            )
        if isinstance(data_vol, np.ndarray):
            return data_vol, True
        raise ValueError(
            "data_vol must be an existing file path or a numpy array, got "
            f"{type(data_vol)!r}."
        )

    def _preprocess_data(self) -> None:
        vol = self.data_vol
        if self.downsample:
            vol = utils.downsample_data(vol)
        logging.info("Calculating mean of data...")
        self.data_mean = np.nanmean(vol)
        logging.info(f"Mean value: {self.data_mean}")
        if self.settings.clip_data:
            vol = utils.clip_to_uint8(vol, self.data_mean, self.st_dev_factor)
        if np.isnan(vol).any():
            logging.info("Replacing NaN values.")
            vol = np.nan_to_num(vol, copy=False)
        self.data_vol = vol
        self.data_vol_shape = vol.shape
