__all__ = [
    "get_settings_data",
    "TrainingDataSlicer",
    "TrainingSettings",
    "PredictionSettings",
    "SettingsError",
]

from volume_segmantics_tpu.data.settings_data import (
    PredictionSettings,
    SettingsError,
    TrainingSettings,
    get_settings_data,
)
from volume_segmantics_tpu.data.slicers import TrainingDataSlicer
