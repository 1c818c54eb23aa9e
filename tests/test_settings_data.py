from pathlib import Path
from types import SimpleNamespace

import pytest

from volume_segmantics_tpu.data import (
    PredictionSettings,
    SettingsError,
    TrainingSettings,
    get_settings_data,
)


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


def test_typed_training_settings_load(training_settings_path):
    """The shipped training YAML validates against the typed schema;
    extra keys and attribute mutation keep working."""
    s = get_settings_data(training_settings_path, kind="training")
    assert isinstance(s, TrainingSettings)
    assert isinstance(s.starting_lr, float)  # YAML "1e-6" string coerced
    assert s.image_size % 32 == 0
    s.batch_size = 4  # namespace-style mutation
    assert s.batch_size == 4


def test_typed_prediction_settings_load(prediction_settings_path):
    s = get_settings_data(prediction_settings_path, kind="prediction")
    assert isinstance(s, PredictionSettings)
    assert isinstance(s.one_hot, bool)
    assert isinstance(s.st_dev_factor, float)


@pytest.mark.parametrize(
    "kind,key",
    [("training", "loss_criterion"), ("prediction", "one_hot")],
)
def test_typed_settings_missing_key(kind, key, training_settings_path,
                                    prediction_settings_path):
    import yaml

    path = (training_settings_path if kind == "training"
            else prediction_settings_path)
    mapping = yaml.safe_load(Path(path).read_text())
    del mapping[key]
    with pytest.raises(SettingsError) as exc:
        get_settings_data(mapping, kind=kind)
    assert f"'{key}'" in str(exc.value)
    assert "missing required key" in str(exc.value)


@pytest.mark.parametrize(
    "kind,key,bad",
    [
        ("training", "image_size", "two-fifty-six"),
        ("training", "clip_data", 3),
        ("prediction", "one_hot", "yes please"),
        ("prediction", "st_dev_factor", [2.5]),
    ],
)
def test_typed_settings_wrong_type(kind, key, bad, training_settings_path,
                                   prediction_settings_path):
    import yaml

    path = (training_settings_path if kind == "training"
            else prediction_settings_path)
    mapping = yaml.safe_load(Path(path).read_text())
    mapping[key] = bad
    with pytest.raises(SettingsError) as exc:
        get_settings_data(mapping, kind=kind)
    assert f"'{key}'" in str(exc.value)
    assert "wrong type" in str(exc.value)


def test_typed_settings_reports_all_problems_at_once(prediction_settings_path):
    import yaml

    mapping = yaml.safe_load(Path(prediction_settings_path).read_text())
    del mapping["quality"]
    del mapping["downsample"]
    mapping["cuda_device"] = "zero"
    with pytest.raises(SettingsError) as exc:
        get_settings_data(mapping, kind="prediction")
    msg = str(exc.value)
    assert "'quality'" in msg and "'downsample'" in msg
    assert "'cuda_device'" in msg


def test_typed_settings_extra_keys_pass_through(prediction_settings_path):
    import yaml

    mapping = yaml.safe_load(Path(prediction_settings_path).read_text())
    mapping["my_custom_key"] = {"nested": True}
    s = get_settings_data(mapping, kind="prediction")
    assert s.my_custom_key == {"nested": True}
    # Optional TPU keys absent from the mapping are NOT materialised
    # (getattr defaults downstream must stay live).
    assert not hasattr(s, "compute_dtype")


def test_typed_settings_unknown_attr_names_source(training_settings_path):
    s = get_settings_data(training_settings_path, kind="training")
    with pytest.raises(AttributeError) as exc:
        _ = s.definitely_not_a_key
    assert "definitely_not_a_key" in str(exc.value)
    assert str(training_settings_path) in str(exc.value)


def test_typed_settings_bad_file_exits(tmp_path):
    """CLI contract: an invalid settings FILE exits(1), like a missing one."""
    bad = tmp_path / "settings.yaml"
    bad.write_text("quality: high\n")  # missing almost everything
    with pytest.raises(SystemExit) as exc:
        get_settings_data(bad, kind="prediction")
    assert exc.value.code == 1


def test_typed_settings_bad_kind():
    with pytest.raises(ValueError):
        get_settings_data({}, kind="inference")


def test_settings_accepts_str_path(training_settings_path):
    """str paths (the common library-API call form) load the same YAML as
    Path inputs instead of silently returning an empty namespace."""
    from volume_segmantics_tpu.data.settings_data import get_settings_data

    from_str = get_settings_data(str(training_settings_path))
    from_path = get_settings_data(training_settings_path)
    assert vars(from_str) == vars(from_path)
    assert hasattr(from_str, "image_size")


def test_require_settings_lists_all_missing():
    from volume_segmantics_tpu.data.settings_data import require_settings

    s = SimpleNamespace(one_hot=False)
    with pytest.raises(SettingsError) as exc:
        require_settings(s, ("one_hot", "output_probs", "quality"), "prediction")
    msg = str(exc.value)
    assert "'output_probs'" in msg and "'quality'" in msg
    assert "'one_hot'" not in msg


def test_prediction_manager_rejects_partial_settings(model_path):
    """Library route: a hand-built settings object missing required keys
    fails at construction with a clear SettingsError, not a deep
    AttributeError (reference parity gap closed)."""
    import numpy as np

    from volume_segmantics_tpu.model import VolSeg2DPredictionManager

    vol = np.zeros((4, 8, 8), np.uint8)
    with pytest.raises(SettingsError) as exc:
        VolSeg2DPredictionManager(
            model_path, vol, SimpleNamespace(clip_data=False)
        )
    assert "missing required key" in str(exc.value)
    assert "'one_hot'" in str(exc.value)


def test_trainer_rejects_partial_settings():
    from volume_segmantics_tpu.model import VolSeg2dTrainer

    with pytest.raises(SettingsError) as exc:
        VolSeg2dTrainer([], [], 2, SimpleNamespace(image_size=64))
    assert "missing required key" in str(exc.value)
    assert "'loss_criterion'" in str(exc.value)
