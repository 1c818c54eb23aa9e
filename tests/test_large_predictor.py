"""Streaming large-volume predictor: equivalence with the in-memory path."""

import h5py
import numpy as np
import pytest

from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
    VolSeg2dPredictor,
)
from volume_segmantics_tpu.model.operations.vol_seg_large_predictor import (
    VolSegLargeVolPredictor,
)
from volume_segmantics_tpu.utils.base_data_utils import Quality


@pytest.fixture()
def predictor(model_path, prediction_settings):
    return VolSeg2dPredictor(model_path, prediction_settings)


@pytest.mark.slow
def test_streaming_matches_in_memory(predictor, tmp_path):
    vol = np.random.default_rng(0).integers(0, 255, (12, 34, 21)).astype(np.uint8)
    large = VolSegLargeVolPredictor(predictor, workdir=tmp_path, slab_size=5)
    stream_labels, stream_probs = large.predict_3_ways(vol)
    mem_labels, mem_probs = predictor._predict_3_ways_max_probs(vol)
    assert np.array_equal(np.asarray(stream_labels), mem_labels)
    assert np.array_equal(np.asarray(stream_probs), mem_probs)


@pytest.mark.slow
def test_streaming_to_hdf5(predictor, tmp_path):
    vol = np.random.default_rng(1).integers(0, 255, (10, 20, 15)).astype(np.uint8)
    large = VolSegLargeVolPredictor(predictor, workdir=tmp_path / "w", slab_size=4)
    out = tmp_path / "streamed.h5"
    large.predict_to_hdf5(vol, out, quality=Quality.MEDIUM)
    with h5py.File(out) as f:
        data = f["/data"][()]
    assert data.shape == vol.shape
    assert data.dtype == np.uint8


@pytest.mark.slow
def test_manager_auto_streams_large_volumes(
    model_path, prediction_settings, tmp_path
):
    """The prediction manager switches to the streaming path above the
    voxel threshold and produces results identical to the in-memory path."""
    from volume_segmantics_tpu.model import VolSeg2DPredictionManager

    vol = np.random.default_rng(2).integers(0, 255, (12, 34, 21)).astype(np.float32)
    prediction_settings.clip_data = True

    mgr = VolSeg2DPredictionManager(model_path, vol.copy(), prediction_settings)
    baseline = mgr.predict_volume_to_path(None, Quality.MEDIUM)

    prediction_settings.streaming_threshold = 100  # force streaming
    mgr2 = VolSeg2DPredictionManager(model_path, vol.copy(), prediction_settings)
    out = tmp_path / "streamed_mgr.h5"
    streamed = mgr2.predict_volume_to_path(out, Quality.MEDIUM)
    assert np.array_equal(np.asarray(streamed), baseline)
    assert out.exists()

    prediction_settings.prediction_axis = "Y"
    mgr3 = VolSeg2DPredictionManager(model_path, vol.copy(), prediction_settings)
    low_streamed = mgr3.predict_volume_to_path(None, Quality.LOW)
    del prediction_settings.streaming_threshold
    prediction_settings.prediction_axis = "Y"
    mgr4 = VolSeg2DPredictionManager(model_path, vol.copy(), prediction_settings)
    low_mem = mgr4.predict_volume_to_path(None, Quality.LOW)
    assert np.array_equal(np.asarray(low_streamed), low_mem)
