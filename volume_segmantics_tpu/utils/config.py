"""Shared constants for the TPU-native Volume Segmantics rebuild.

Behavioral parity notes reference the upstream package
(DiamondLightSource/volume-segmantics): see
reference volume_segmantics/utilities/config.py:1-42 for the constants this
module mirrors. Values that were CUDA-specific are re-derived for TPU.
"""

# Parser argument names (reference utilities/config.py:4-8)
TRAIN_DATA_ARG = "data"
LABEL_DATA_ARG = "labels"
MODEL_PTH_ARG = "model"
PREDICT_DATA_ARG = "data"
DATA_DIR_ARG = "data_dir"

# Accepted file extensions (reference utilities/config.py:10-15)
TIFF_SUFFIXES = {".tiff", ".tif"}
HDF5_SUFFIXES = {".h5", ".hdf5", ".nxs"}
TRAIN_DATA_EXT = {*HDF5_SUFFIXES, *TIFF_SUFFIXES}
LABEL_DATA_EXT = {*HDF5_SUFFIXES, *TIFF_SUFFIXES}
# ".vstpu" is this framework's native msgpack checkpoint; ".pytorch"/".pth"
# are accepted for drop-in CLI compatibility with the reference.
MODEL_DATA_EXT = {".pytorch", ".pth", ".vstpu"}
PREDICT_DATA_EXT = {*HDF5_SUFFIXES, *TIFF_SUFFIXES}

# Logging format (reference utilities/config.py:18-19)
LOGGING_FMT = "%(asctime)s - %(levelname)s - %(message)s"
LOGGING_DATE_FMT = "%d-%b-%y %H:%M:%S"

# Settings yaml file locations (reference utilities/config.py:21-23)
SETTINGS_DIR = "volseg-settings"
TRAIN_SETTINGS_FN = "2d_model_train_settings.yaml"
PREDICTION_SETTINGS_FN = "2d_model_predict_settings.yaml"

TQDM_BAR_FORMAT = "{l_bar}{bar: 30}{r_bar}{bar: -30b}"

HDF5_COMPRESSION = "gzip"

# Batch sizing. The reference picks batch size from free CUDA memory
# (reference utilities/base_data_utils.py:104-122) with train batch 12 /
# predict batch 4 on a >8 GB GPU. On TPU, HBM is large (16 GB on v5e) and
# the MXU favours bigger batches, so defaults are raised; they remain
# settings-overridable via `batch_size` / `prediction_batch_size` keys.
BIG_HBM_THRESHOLD = 8  # HBM (GB) above which the big batch sizes are used
# Keep reference training semantics (LR finder, OneCycle) at the parity
# default; throughput scales with `batch_size` (measured on v5e at 256²,
# U-Net/R34, fused step incl. augmentation: 12 -> 475, 32 -> 723,
# 64 -> 921, 128 -> 1221 slices/s — scale the LR accordingly on short
# schedules; the LR finder adapts automatically).
BIG_TRAIN_BATCH = 12
# Training batch used by `performance_profile: throughput` (settings key,
# no reference equivalent): the largest batch in the measured sweep above,
# 2.6x the parity default's throughput on v5e. The LR finder re-derives the
# learning rate at the larger batch, so OneCycle schedules stay sane; for
# fixed-LR fine-tuning scale the LR with the batch yourself.
THROUGHPUT_TRAIN_BATCH = 128
PERFORMANCE_PROFILES = ("parity", "throughput")
# Measured fused-train-step throughputs (v5e, U-Net/R34, 256², bench.py
# round 4) quoted in the out-of-box tip `get_batch_size` logs when no
# profile/batch override is set — advisory text only, not used in any
# computation.
MEASURED_PARITY_SLICES_PER_S = 500
MEASURED_THROUGHPUT_SLICES_PER_S = 1600
# Minimum exponential-sweep steps for the LR-range finder. The reference
# sweeps `lr_find_epochs` EPOCHS (reference trainer :298-383) — ~50+ steps
# at its batch 12 — but at `performance_profile: throughput` (batch 128)
# one epoch is 4-5 steps and a 4-point sweep over [starting_lr, end_lr]
# mis-picks catastrophically (measured: LR 0.198 -> Dice 0.0). The finder
# raises its epoch count until the sweep has at least this many steps;
# parity-batch runs with normal loader lengths are unaffected.
MIN_LR_FIND_STEPS = 40
# Minimum optimizer/BatchNorm steps per training epoch under
# `performance_profile: throughput`: the profile clamps its large batch on
# small datasets so momentum-0.9 BN running statistics keep pace with the
# early model and epoch-granular early stopping stays meaningful (at 4-5
# steps/epoch on the tutorial volume the val loss — eval mode, lagging
# stats — pinned at ~1.0 while train loss fell, and patience killed the
# run; measured Dice 0.04 vs parity-class after the clamp). Explicit
# `batch_size` settings are never clamped.
MIN_TRAIN_STEPS_PER_EPOCH = 16
# Pure throughput: larger batches feed the MXU better. Measured on v5e,
# 256³ 12-way TTA: batch 32 -> 1.63 s, 64 -> 1.2 s, 128 -> 0.92 s, 256 no
# further gain; 512³ runs at batch 128 without memory pressure.
BIG_PRED_BATCH = 128
# Per-architecture first-contact prediction batch caps (keys: ModelType
# names). A VMEM-heavy decoder that exceeds the chip's scoped memory at
# BIG_PRED_BATCH would pay a full compile-fail-retrace per halving of the
# predictor's backoff, so such archs would start here at a batch known to
# compile first-try. Measured on v5e (tools/measure_batch_caps.py, 512²
# slices, resnet34): ALL 8 architectures compile and run first-try at
# batch 128 — including DeepLabV3/+ full 12-way with probs at 512³ — so
# the shipped table is empty; the halving backoff remains the safety net
# for larger slices/encoders, and an explicit `prediction_batch_size` in
# settings always bypasses the cap. (TPU-native analog of the reference's
# free-CUDA-memory heuristic, reference utilities/base_data_utils.py:104-122.)
PRED_BATCH_CAPS = {}
SMALL_BATCH = 2
IM_SIZE_DIVISOR = 32  # Image dims must be a multiple of this (model strides)
MODEL_INPUT_CHANNELS = 1  # Grayscale input images

DEFAULT_MIN_LR = 0.00075  # LR returned when the LR-finder heuristic fails
LR_DIVISOR = 3  # Divide the min-gradient learning rate by this factor

IMAGENET_MEAN = 0.449  # Single-channel ImageNet normalisation mean
IMAGENET_STD = 0.226  # Single-channel ImageNet normalisation std

# TPU-specific knobs (no reference equivalent)
COMPUTE_DTYPE = "bfloat16"  # MXU-native matmul/conv dtype; params stay fp32
PREFETCH_BATCHES = 2  # Host->device prefetch depth for the training pipeline
