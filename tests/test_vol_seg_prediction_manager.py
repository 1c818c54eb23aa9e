"""Prediction-manager end-to-end tests (reference
tests/test_vol_seg_prediction_manager.py equivalent)."""

import numpy as np
import pytest

from volume_segmantics_tpu.model import VolSeg2DPredictionManager
from volume_segmantics_tpu.utils.base_data_utils import Quality


@pytest.fixture()
def data_vol():
    return np.random.randint(256, size=(12, 34, 21)).astype(np.float32)


@pytest.fixture()
def manager(model_path, data_vol, prediction_settings):
    return VolSeg2DPredictionManager(model_path, data_vol, prediction_settings)


@pytest.mark.slow
class TestPredictionManager:
    def test_label_codes(self, manager):
        assert isinstance(manager.get_label_codes(), dict)

    def test_low_quality_to_path(self, manager, data_vol, tmp_path):
        out = tmp_path / "pred.h5"
        pred = manager.predict_volume_to_path(out, Quality.LOW)
        assert pred.shape == data_vol.shape
        assert pred.dtype == np.uint8
        assert out.exists()

    def test_medium_quality_no_path(self, manager, data_vol):
        pred = manager.predict_volume_to_path(None, Quality.MEDIUM)
        assert pred.shape == data_vol.shape

    def test_high_quality(self, manager, data_vol):
        pred = manager.predict_volume_to_path(None, Quality.HIGH)
        assert pred.shape == data_vol.shape
        assert pred.dtype == np.uint8

    def test_probs_sidecar(self, model_path, data_vol, prediction_settings, tmp_path):
        prediction_settings.output_probs = True
        mgr = VolSeg2DPredictionManager(model_path, data_vol, prediction_settings)
        out = tmp_path / "pred.h5"
        mgr.predict_volume_to_path(out, Quality.LOW)
        assert (tmp_path / "pred_probs.h5").exists()

    def test_one_hot_output(self, model_path, data_vol, prediction_settings):
        prediction_settings.one_hot = True
        mgr = VolSeg2DPredictionManager(model_path, data_vol, prediction_settings)
        pred = mgr.predict_volume_to_path(None, Quality.MEDIUM)
        assert pred.ndim == 4
        assert pred.shape[1:] == data_vol.shape
