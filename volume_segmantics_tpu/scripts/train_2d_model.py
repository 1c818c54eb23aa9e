#!/usr/bin/env python
"""`model-train-2d` console entry point.

Same user-facing workflow as reference
volume_segmantics/scripts/train_2d_model.py:15-71 — CLI flags, settings
discovery under <data_dir>/volseg-settings/, dated model filename, frozen ->
unfrozen two-phase schedule, figures, slice cleanup — implemented around
this framework's in-memory slicing fast path (settings key
``slice_to_disk: False`` skips the PNG round-trip entirely).
"""

import logging
import sys
from datetime import date
from pathlib import Path

import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.data import TrainingDataSlicer, get_settings_data
from volume_segmantics_tpu.model import VolSeg2dTrainer
from volume_segmantics_tpu.utils import get_2d_training_parser


def _parse_cli():
    args = get_2d_training_parser().parse_args()
    data_vols = getattr(args, cfg.TRAIN_DATA_ARG)
    label_vols = getattr(args, cfg.LABEL_DATA_ARG)
    if len(data_vols) != len(label_vols):
        logging.error(
            "Number of data volumes and number of label volumes must be equal!"
        )
        sys.exit(1)
    root = Path(getattr(args, cfg.DATA_DIR_ARG)).resolve()
    return data_vols, label_vols, root


def _slice_all_volumes(data_vols, label_vols, settings, root):
    """Slice every (data, label) pair; returns the trainer's inputs, the
    widest label count seen, its codes, and the last slicer (whose PNGs are
    cleaned up at the end, as the reference does)."""
    to_disk = bool(getattr(settings, "slice_to_disk", True))
    data_dir = root / settings.data_im_dirname
    seg_dir = root / settings.seg_im_out_dirname
    mem_data, mem_labels = [], []
    max_labels, codes, slicer = 0, None, None
    for i, (data_path, label_path) in enumerate(zip(data_vols, label_vols)):
        slicer = TrainingDataSlicer(data_path, label_path, settings)
        if to_disk:
            slicer.output_data_slices(data_dir, f"data{i}")
            slicer.output_label_slices(seg_dir, f"seg{i}")
        else:
            d, l = slicer.get_slice_arrays()
            mem_data.extend(d)
            mem_labels.extend(l)
        if slicer.num_seg_classes > max_labels:
            max_labels, codes = slicer.num_seg_classes, slicer.codes
    assert codes is not None, "no volumes were sliced"
    inputs = (data_dir, seg_dir) if to_disk else (mem_data, mem_labels)
    return inputs, max_labels, codes, slicer


def _model_output_path(settings, root: Path) -> Path:
    mtype = settings.model["type"]
    mtype = mtype if isinstance(mtype, str) else mtype.name
    return root / f"{date.today()}_{mtype}_{settings.model_output_fn}.pytorch"


def resolve_training_phases(settings) -> tuple:
    """(frozen_epochs, unfrozen_epochs) for the two-phase schedule.

    The frozen phase exists to protect PRETRAINED encoder features while the
    decoder adapts (reference trainer :102-116). With a random encoder it
    trains frozen random convolutions — poorly. When the opt-in setting
    ``skip_frozen_without_pretrained: True`` is set and no converted
    ImageNet weights are available for the configured encoder, the frozen
    epochs fold into the unfrozen phase so the shipped 8+5 schedule still
    spends all 13 epochs learning. Default is off: reference-parity
    behaviour (warn-only, inside the trainer) is preserved."""
    frozen_epochs = int(settings.num_cyc_frozen)
    unfrozen_epochs = int(settings.num_cyc_unfrozen)
    if frozen_epochs > 0 and bool(
        getattr(settings, "skip_frozen_without_pretrained", False)
    ):
        from volume_segmantics_tpu.models.pretrained import (
            pretrained_weights_available,
        )

        encoder = settings.model.get("encoder_name", "resnet34")
        wants_pretrained = settings.model.get("encoder_weights") == "imagenet"
        if not (wants_pretrained and pretrained_weights_available(encoder)):
            logging.warning(
                f"No pretrained weights available for encoder '{encoder}' "
                f"(skip_frozen_without_pretrained is on): folding "
                f"{frozen_epochs} frozen epochs into the unfrozen phase "
                f"({frozen_epochs + unfrozen_epochs} unfrozen epochs total)."
            )
            return 0, frozen_epochs + unfrozen_epochs
    return frozen_epochs, unfrozen_epochs


def _run_training_phases(trainer, model_out: Path, settings) -> None:
    """Frozen-encoder phase (when configured) followed by fine-tuning, with
    the reference's create/warm-start semantics."""
    frozen_epochs, unfrozen_epochs = resolve_training_phases(settings)
    patience = settings.patience
    if frozen_epochs > 0:
        trainer.train_model(model_out, frozen_epochs, patience,
                            create=True, frozen=True)
    if unfrozen_epochs > 0:
        trainer.train_model(model_out, unfrozen_epochs, patience,
                            create=frozen_epochs == 0, frozen=False)


def main():
    from volume_segmantics_tpu.utils.device import configure_platform

    configure_platform()
    logging.basicConfig(
        level=logging.INFO, format=cfg.LOGGING_FMT, datefmt=cfg.LOGGING_DATE_FMT
    )
    data_vols, label_vols, root = _parse_cli()
    settings = get_settings_data(
        root / cfg.SETTINGS_DIR / cfg.TRAIN_SETTINGS_FN, kind="training"
    )
    inputs, max_labels, label_codes, last_slicer = _slice_all_volumes(
        data_vols, label_vols, settings, root
    )
    # Pass the slicer's label codes through (as the dict form the trainer's
    # Union[int, dict] API accepts) so checkpoints record real label names;
    # the reference drops them here and always saves label_codes={}. Keys
    # are strings: the msgpack checkpoint format forbids int map keys.
    codes = (
        {str(i): code for i, code in enumerate(label_codes)}
        if label_codes
        else max_labels
    )
    trainer = VolSeg2dTrainer(inputs[0], inputs[1], codes, settings)
    model_out = _model_output_path(settings, root)
    _run_training_phases(trainer, model_out, settings)
    trainer.output_loss_fig(model_out)
    trainer.output_prediction_figure(model_out)
    last_slicer.clean_up_slices()


if __name__ == "__main__":
    main()
