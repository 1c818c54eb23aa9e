"""Prediction manager: preprocessing + predictor + quality dispatch + HDF5.

Parity with reference
volume_segmantics/model/operations/vol_seg_prediction_manager.py:12-100.
"""

from pathlib import Path
from types import SimpleNamespace
from typing import Union

import numpy as np

import volume_segmantics_tpu.utils.base_data_utils as utils
from volume_segmantics_tpu.data.base_data_manager import BaseDataManager
from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
    VolSeg2dPredictor,
)


class VolSeg2DPredictionManager(BaseDataManager):
    """Manages prediction of segmentation volumes to disk."""

    # Keys the prediction flow reads WITHOUT defaults; checked up front so
    # a hand-built settings object fails with a clear message instead of a
    # deep AttributeError (`quality` is only needed when predict is called
    # without an explicit quality argument, so it stays lazy).
    REQUIRED_SETTINGS = (
        "clip_data", "st_dev_factor", "downsample", "data_hdf5_path",
        "one_hot", "output_probs",
    )

    def __init__(
        self,
        model_file_path: str,
        data_vol: Union[str, np.ndarray],
        settings: SimpleNamespace,
    ) -> None:
        from volume_segmantics_tpu.data.settings_data import require_settings

        require_settings(settings, self.REQUIRED_SETTINGS, "prediction")
        super().__init__(data_vol, settings)
        self.predictor = VolSeg2dPredictor(model_file_path, settings)
        self.settings = settings

    def get_label_codes(self) -> dict:
        """Label codes retrieved from the saved model."""
        return self.predictor.label_codes

    # Volumes larger than this stream through slabs + host memmaps instead
    # of living wholly in HBM (override with settings.streaming_threshold).
    STREAMING_THRESHOLD_VOXELS = 1024**3
    # The in-memory 12-way path keeps all four rotations' (labels, probs)
    # pairs live as inputs to the fused merge program (~14 bytes/voxel peak
    # incl. outputs), so HIGH quality and one-hot voting stream earlier to
    # stay within a 16 GB chip's HBM with margin.
    HIGH_STREAMING_THRESHOLD_VOXELS = 600 * 1024**2

    def _upload_lazy_to_device(self, vol):
        """Assemble a lazy/basic-sliceable volume into one device-resident
        uint8 array, reading (and transforming: clip/uint8 cast) bounded
        chunks at a time so host memory stays O(chunk).

        On a multi-device mesh the array is built SHARDED along the slice
        axis (each device's shard is read straight from the lazy source via
        jax.make_array_from_callback), so per-chip HBM holds ~1/n_dev of
        the volume and the fused sweeps consume it without a reshard. On a
        single device it is a plain slab-wise concatenate (transient device
        cost ~2x the volume)."""
        import logging

        import jax
        import jax.numpy as jnp

        slab = int(getattr(self.settings, "streaming_slab_size", 64))
        n_dev = max(int(self.predictor.n_dev), 1)
        if n_dev > 1 and vol.shape[0] % n_dev == 0:
            from volume_segmantics_tpu.parallel.mesh import batch_sharding

            try:
                sharding = batch_sharding(self.predictor.mesh)
                logging.info(
                    f"Uploading lazy volume {tuple(vol.shape)} sharded over "
                    f"{n_dev} devices for fused prediction."
                )
                return jax.make_array_from_callback(
                    tuple(vol.shape),
                    sharding,
                    lambda idx: np.ascontiguousarray(vol[idx]),
                )
            except Exception as e:  # pragma: no cover - sharding edge case
                logging.warning(
                    f"Sharded lazy upload failed ({e}); falling back to a "
                    "single-device upload."
                )
        logging.info(
            f"Uploading lazy volume {tuple(vol.shape)} to device "
            f"slab-by-slab for fused prediction."
        )
        parts = [
            jnp.asarray(np.ascontiguousarray(vol[s : s + slab]))
            for s in range(0, vol.shape[0], slab)
        ]
        return jnp.concatenate(parts, axis=0)

    def predict_volume_to_path(
        self,
        output_path: Union[Path, None],
        quality: Union[utils.Quality, None] = None,
    ) -> np.ndarray:
        """Predict a 3D segmentation at the requested quality and optionally
        save it (and max-probabilities) to gzip HDF5 (reference manager
        :43-100). Very large volumes automatically switch to the slab-
        streaming path (constant device memory)."""
        probs = None
        one_hot = self.settings.one_hot
        preferred_axis = utils.get_prediction_axis(self.settings)
        if preferred_axis == utils.Axis.ALL:
            raise ValueError(
                "prediction_axis must be one of Z, Y, X (single-axis sweeps "
                "only; multi-axis prediction is selected via `quality`)."
            )
        if quality is None:
            quality = utils.get_prediction_quality(self.settings)
        default_threshold = (
            self.HIGH_STREAMING_THRESHOLD_VOXELS
            if quality == utils.Quality.HIGH or one_hot
            else self.STREAMING_THRESHOLD_VOXELS
        )
        # NOTE: the base thresholds encode a SINGLE chip's HBM: a
        # host-materialised ndarray uploads to one device before the first
        # jit boundary. Lazy sources are different — their fused-path
        # upload is sharded across the mesh (see _upload_lazy_to_device),
        # so their eligibility scales with the device count.
        threshold = int(
            getattr(self.settings, "streaming_threshold", default_threshold)
        )
        # Lazy-ingested volumes (never materialised on host — see
        # BaseDataManager) that fit the (mesh-scaled) HBM budget are
        # assembled ON DEVICE and take the fully-fused path: the
        # slab-streaming predictor merges on host, downloading float16
        # probabilities for every slab — on a slow host<->device link that
        # is ~15x slower than one upload + one fused sweep (measured 647 s
        # vs ~40 s for a 1024³ MEDIUM prediction through this API). Host
        # memory stays O(slab) either way.
        data_vol = self.data_vol
        is_lazy = not isinstance(data_vol, np.ndarray)
        uploaded = False
        n_dev = max(int(self.predictor.n_dev), 1)
        # The sharded upload needs the slice axis to split evenly across
        # the mesh; otherwise the upload lands on one device and the
        # single-chip threshold stays binding.
        shardable = n_dev > 1 and data_vol.shape[0] % n_dev == 0
        lazy_fused_limit = threshold * (n_dev if shardable else 1)
        if is_lazy and data_vol.size <= lazy_fused_limit:
            data_vol = self._upload_lazy_to_device(data_vol)
            is_lazy = False
            uploaded = True
        if is_lazy or (not uploaded and data_vol.size > threshold):
            import logging

            from volume_segmantics_tpu.model.operations.vol_seg_large_predictor import (
                VolSegLargeVolPredictor,
            )

            logging.info(
                f"Volume has {data_vol.size} voxels (> {threshold}); "
                "using the slab-streaming predictor."
            )
            large = VolSegLargeVolPredictor(
                self.predictor,
                slab_size=int(getattr(self.settings, "streaming_slab_size", 64)),
            )
            if one_hot:
                if quality == utils.Quality.LOW:
                    prediction = large.predict_single_axis_one_hot(
                        data_vol, axis=preferred_axis
                    )
                elif quality == utils.Quality.MEDIUM:
                    prediction = large.predict_3_ways_one_hot(data_vol)
                else:
                    prediction = large.predict_12_ways_one_hot(data_vol)
            elif quality == utils.Quality.LOW:
                prediction, probs = large.predict_single_axis(
                    data_vol,
                    axis=preferred_axis,
                    output_probs=bool(self.settings.output_probs),
                )
            elif quality == utils.Quality.MEDIUM:
                prediction, probs = large.predict_3_ways(data_vol)
            else:
                prediction, probs = large.predict_12_ways(data_vol)
        elif quality == utils.Quality.LOW:
            if one_hot:
                prediction = self.predictor._predict_single_axis_to_one_hot(
                    data_vol, axis=preferred_axis
                )
            else:
                prediction, probs = self.predictor._predict_single_axis(
                    data_vol,
                    output_probs=bool(self.settings.output_probs),
                    axis=preferred_axis,
                )
        elif quality == utils.Quality.MEDIUM:
            if one_hot:
                prediction = self.predictor._predict_3_ways_one_hot(data_vol)
            else:
                prediction, probs = self.predictor._predict_3_ways_max_probs(
                    data_vol, output_probs=self.settings.output_probs
                )
        else:
            if one_hot:
                prediction = self.predictor._predict_12_ways_one_hot(data_vol)
            else:
                prediction, probs = self.predictor._predict_12_ways_max_probs(
                    data_vol, output_probs=self.settings.output_probs
                )
        if output_path is not None:
            utils.save_data_to_hdf5(
                prediction, output_path, chunking=self.input_data_chunking
            )
            if probs is not None and self.settings.output_probs:
                utils.save_data_to_hdf5(
                    probs,
                    f"{output_path.parent / output_path.stem}_probs.h5",
                    chunking=self.input_data_chunking,
                )
        return prediction
