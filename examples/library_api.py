#!/usr/bin/env python
"""Library-API walkthrough: the same surface SuRVoS2 drives in the
reference (SURVEY.md §3.3-3.4) — in-memory numpy volumes end-to-end."""

import numpy as np

from volume_segmantics_tpu.data import TrainingDataSlicer, get_settings_data
from volume_segmantics_tpu.model import VolSeg2dTrainer, VolSeg2DPredictionManager
from volume_segmantics_tpu.utils import Quality


def main():
    # Settings from dicts (no YAML files needed for library use).
    # kind="training" validates the dict against the typed schema up front
    # (missing/mistyped keys raise SettingsError with the full list).
    train_settings = get_settings_data(
        {
            "data_im_dirname": "data", "seg_im_out_dirname": "seg",
            "model_output_fn": "trained_2d_model", "clip_data": False,
            "st_dev_factor": 2.575, "data_hdf5_path": "/data",
            "seg_hdf5_path": "/data", "training_axes": "All",
            "image_size": 128, "downsample": False,
            "training_set_proportion": 0.8, "cuda_device": 0,
            "num_cyc_frozen": 2, "num_cyc_unfrozen": 1, "patience": 3,
            "loss_criterion": "DiceLoss", "alpha": 0.75, "beta": 0.25,
            "eval_metric": "MeanIoU", "pct_lr_inc": 0.3,
            "starting_lr": "1e-6", "end_lr": 50, "lr_find_epochs": 1,
            "lr_reduce_factor": 500, "plot_lr_graph": False,
            "model": {"type": "U_Net", "encoder_name": "resnet34",
                      "encoder_weights": None},
        },
        kind="training",
    )

    # Synthetic volume + labels (replace with your arrays)
    rng = np.random.default_rng(0)
    vol = rng.integers(0, 255, (64, 128, 128)).astype(np.uint8)
    labels = (vol > 128).astype(np.uint8)

    # 1. Slice (in-memory arrays in, PNG slices out)
    slicer = TrainingDataSlicer(vol, labels, train_settings)
    slicer.output_data_slices("ex_data", "data0")
    slicer.output_label_slices("ex_seg", "seg0")

    # 2. Train
    from pathlib import Path

    trainer = VolSeg2dTrainer(
        Path("ex_data"), Path("ex_seg"), slicer.num_seg_classes, train_settings
    )
    model_out = Path("example_model.pytorch")
    trainer.train_model(model_out, 2, 3, create=True, frozen=True)
    trainer.output_loss_fig(model_out)

    # 3. Predict (returns ndarray; output_path=None skips disk)
    pred_settings = get_settings_data(
        {
            "quality": "medium", "output_probs": False, "clip_data": False,
            "st_dev_factor": 2.575, "data_hdf5_path": "/data",
            "cuda_device": 0, "downsample": False, "one_hot": False,
            "prediction_axis": "Z",
        },
        kind="prediction",
    )
    manager = VolSeg2DPredictionManager(str(model_out), vol, pred_settings)
    prediction = manager.predict_volume_to_path(None, Quality.MEDIUM)
    print("prediction:", prediction.shape, prediction.dtype, np.unique(prediction))
    slicer.clean_up_slices()


if __name__ == "__main__":
    main()
