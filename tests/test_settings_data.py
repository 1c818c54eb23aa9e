from pathlib import Path
from types import SimpleNamespace

import pytest

from volume_segmantics_tpu.data import get_settings_data


def test_training_settings_load(training_settings_path):
    settings = get_settings_data(training_settings_path)
    assert isinstance(settings, SimpleNamespace)
    assert settings.model["type"] == "U_Net"
    assert settings.image_size % 32 == 0
    assert settings.loss_criterion in (
        "BCEDiceLoss", "BCELoss", "DiceLoss", "GeneralizedDiceLoss",
        "CrossEntropyLoss",
    )


def test_prediction_settings_load(prediction_settings_path):
    settings = get_settings_data(prediction_settings_path)
    assert settings.quality in ("low", "medium", "high")
    assert isinstance(settings.one_hot, bool)


def test_settings_from_dict():
    settings = get_settings_data({"a": 1, "b": "two"})
    assert settings.a == 1
    assert settings.b == "two"


def test_settings_none():
    settings = get_settings_data(None)
    assert isinstance(settings, SimpleNamespace)


def test_settings_missing_file_exits():
    with pytest.raises(SystemExit):
        get_settings_data(Path("/nonexistent/settings.yaml"))


def test_settings_accepts_str_path(training_settings_path):
    """str paths (the common library-API call form) load the same YAML as
    Path inputs instead of silently returning an empty namespace."""
    from volume_segmantics_tpu.data.settings_data import get_settings_data

    from_str = get_settings_data(str(training_settings_path))
    from_path = get_settings_data(training_settings_path)
    assert vars(from_str) == vars(from_path)
    assert hasattr(from_str, "image_size")
