__all__ = ["get_settings_data", "TrainingDataSlicer"]

from volume_segmantics_tpu.data.settings_data import get_settings_data
from volume_segmantics_tpu.data.slicers import TrainingDataSlicer
