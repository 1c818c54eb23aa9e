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
