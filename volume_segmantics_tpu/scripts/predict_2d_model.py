#!/usr/bin/env python
"""`model-predict-2d` console entry point.

Same user-facing contract as reference
volume_segmantics/scripts/predict_2d_model.py:16-38: positional model +
data paths, settings discovered under <data_dir>/volseg-settings/, output
written next to the data dir as <date>_<stem>_2d_model_vol_pred.h5.
"""

import logging
import warnings
from datetime import date
from pathlib import Path

import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.data import get_settings_data
from volume_segmantics_tpu.model import VolSeg2DPredictionManager
from volume_segmantics_tpu.utils import get_2d_prediction_parser

warnings.filterwarnings("ignore", category=UserWarning)


def create_output_path(root_path, data_vol_path):
    """Dated output filename derived from the input volume's stem."""
    return Path(
        root_path, f"{date.today()}_{data_vol_path.stem}_2d_model_vol_pred.h5"
    )


def main():
    from volume_segmantics_tpu.utils.device import configure_platform

    configure_platform()
    logging.basicConfig(
        level=logging.INFO, format=cfg.LOGGING_FMT, datefmt=cfg.LOGGING_DATE_FMT
    )
    args = get_2d_prediction_parser().parse_args()
    root = Path(getattr(args, cfg.DATA_DIR_ARG)).resolve()
    data_path = Path(getattr(args, cfg.PREDICT_DATA_ARG))
    settings = get_settings_data(
        root / cfg.SETTINGS_DIR / cfg.PREDICTION_SETTINGS_FN, kind="prediction"
    )
    manager = VolSeg2DPredictionManager(
        getattr(args, cfg.MODEL_PTH_ARG), data_path, settings
    )
    manager.predict_volume_to_path(create_output_path(root, data_path))


if __name__ == "__main__":
    main()
