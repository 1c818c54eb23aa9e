"""Batch iterators over in-memory slice arrays.

Replaces the reference's torch DataLoader + 4 worker subprocesses
(reference volume_segmantics/data/dataloaders.py:15-71). Because slices are
preprocessed into contiguous uint8 arrays once, batching is pure numpy
indexing — there is nothing for worker processes to do, and each batch is a
single host->device transfer. Augmentation runs on device.
"""

import logging
from types import SimpleNamespace
from typing import Tuple

import numpy as np

import volume_segmantics_tpu.utils.base_data_utils as utils
import volume_segmantics_tpu.utils.config as cfg
# get_2d_prediction_dataset / get_2d_validation_dataset are re-exported via
# __all__ for API discoverability alongside the reference factory names.
from volume_segmantics_tpu.data.datasets import (
    get_2d_prediction_dataset,  # noqa: F401
    get_2d_training_dataset,
    get_2d_validation_dataset,  # noqa: F401
)


class ArrayBatcher:
    """Iterates fixed-size (images, masks, n_valid) numpy batches.

    Always emits full `batch_size` batches so the jitted step compiles once:
    a short remainder batch is padded by wrapping around, with `n_valid`
    marking how many leading samples are real (loss/metrics mask the rest).
    """

    def __init__(self, images, masks, indices, batch_size, shuffle, drop_last):
        self.images = images
        self.masks = masks
        self.indices = np.asarray(indices, dtype=np.int64)
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng()

    def __len__(self):
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def __iter__(self):
        order = self.indices
        if self.shuffle:
            order = self._rng.permutation(order)
        bs = self.batch_size
        for b in range(len(self)):
            chunk = order[b * bs : (b + 1) * bs]
            n_valid = len(chunk)
            if n_valid < bs:
                # Tile so even an index set smaller than half the batch
                # fills it completely (the fixed-shape compile contract).
                reps = -(-(bs - n_valid) // len(order))
                pad = np.tile(order, reps)[: bs - n_valid]
                chunk = np.concatenate([chunk, pad])
            yield self.images[chunk], self.masks[chunk], n_valid


class PrefetchToDevice:
    """Wrap a batch iterator with a background thread that uploads batches
    to the device ahead of consumption (bounded depth).

    The trainer's step dispatch is async, so on a directly-attached TPU the
    upload is negligible — but over a slow host<->device link (this
    environment's tunnel measures ~35 MB/s) the per-batch upload blocks the
    feeding thread for tens of ms and halves epoch throughput. A depth-2
    prefetch overlaps batch k+1's upload with batch k's device compute.
    JAX transfers are thread-safe; loader exceptions propagate to the
    consumer."""

    _SENTINEL = object()

    def __init__(self, loader, place_fn, depth: int = 2):
        self.loader = loader
        self.place_fn = place_fn
        self.depth = int(depth)

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import queue
        import threading

        q = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def _put(item) -> bool:
            """Enqueue unless the consumer has gone away (early break)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.05)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for images, masks, n_valid in self.loader:
                    batch = (self.place_fn(images), self.place_fn(masks),
                             n_valid)
                    if not _put(batch):
                        return  # consumer stopped early; drop device refs
            except BaseException as exc:  # propagate into the consumer
                _put(exc)
                return
            _put(self._SENTINEL)

        threading.Thread(target=worker, daemon=True).start()
        try:
            while True:
                item = q.get()
                if item is self._SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            # Runs on normal exhaustion AND on the consumer breaking out
            # (GeneratorExit): unblock the worker so prefetched device
            # buffers are released instead of pinned forever.
            stop.set()


def _preprocess_slice_lists(data_slices, label_slices, settings):
    """Resize/pad in-memory slice lists to the square training size and
    stack them (the PNG-free fast path fed by
    TrainingDataSlicer.get_slice_arrays)."""
    import volume_segmantics_tpu.data.augmentations as augs

    pre = augs.get_train_preprocess_augs(settings.image_size)
    images, masks = [], []
    for img, msk in zip(data_slices, label_slices):
        sample = pre(image=np.asarray(img), mask=np.asarray(msk))
        images.append(sample["image"])
        masks.append(sample["mask"])
    return np.stack(images).astype(np.uint8), np.stack(masks).astype(np.uint8)


def get_2d_training_dataloaders(
    image_dir, label_dir, settings: SimpleNamespace
) -> Tuple[ArrayBatcher, ArrayBatcher]:
    """Train/validation batchers with a random permutation split at
    `training_set_proportion` (reference dataloaders.py:15-56).

    Accepts either PNG slice directories (reference workflow) or in-memory
    slice lists/arrays (the zero-disk fast path)."""
    training_set_prop = settings.training_set_proportion
    batch_size = utils.get_batch_size(settings)

    if isinstance(image_dir, (list, tuple, np.ndarray)):
        images, masks = _preprocess_slice_lists(image_dir, label_dir, settings)
    else:
        dataset = get_2d_training_dataset(image_dir, label_dir, settings)
        images, masks = dataset.stacked_arrays()
    dset_length = images.shape[0]
    indices = np.random.permutation(dset_length)
    split = int(dset_length * training_set_prop)
    train_idx, validate_idx = indices[:split], indices[split:]

    # `performance_profile: throughput` clamps its large batch so an epoch
    # keeps at least cfg.MIN_TRAIN_STEPS_PER_EPOCH optimizer/BatchNorm
    # steps on SMALL datasets: at 4-5 steps/epoch the momentum-0.9 running
    # statistics lag the fast-moving early model, validation (eval mode)
    # diverges from training, and epoch-granular patience stops the run
    # before it can learn (measured on the 256^3 tutorial volume: batch
    # 128 -> Dice 0.04, clamped batch -> parity-class Dice). Explicit
    # `batch_size` overrides are respected unclamped; large datasets are
    # unaffected.
    profile = getattr(settings, "performance_profile", None) or "parity"
    explicit = bool(getattr(settings, "batch_size", None))
    if profile == "throughput" and not explicit:
        cap = max(len(train_idx) // cfg.MIN_TRAIN_STEPS_PER_EPOCH,
                  cfg.BIG_TRAIN_BATCH)
        try:
            import jax

            n_dev = jax.device_count()
        except Exception:  # pragma: no cover
            n_dev = 1
        # Keep the data-parallel divisibility get_batch_size guarantees.
        cap = ((cap + n_dev - 1) // n_dev) * n_dev
        if batch_size > cap:
            logging.info(
                f"Clamping throughput-profile batch {batch_size} -> {cap} "
                f"so {len(train_idx)} training slices keep >= "
                f"{cfg.MIN_TRAIN_STEPS_PER_EPOCH} steps per epoch."
            )
            batch_size = cap
    if len(train_idx) == 0 or len(validate_idx) == 0:
        raise ValueError(
            f"Cannot split {dset_length} slices into non-empty training and "
            f"validation sets at training_set_proportion="
            f"{training_set_prop}; provide more slices or adjust the "
            "proportion."
        )

    training_batcher = ArrayBatcher(
        images, masks, train_idx, batch_size, shuffle=True, drop_last=True
    )
    validation_batcher = ArrayBatcher(
        images, masks, validate_idx, batch_size, shuffle=False, drop_last=False
    )
    return training_batcher, validation_batcher


class PredictionBatcher:
    """Yields fixed-size batches of already-padded volume slices."""

    def __init__(self, data_vol, batch_size):
        self.data_vol = data_vol
        self.batch_size = int(batch_size)

    def __len__(self):
        return int(np.ceil(self.data_vol.shape[0] / self.batch_size))

    def __iter__(self):
        n = self.data_vol.shape[0]
        bs = self.batch_size
        for b in range(len(self)):
            chunk = self.data_vol[b * bs : (b + 1) * bs]
            n_valid = chunk.shape[0]
            if n_valid < bs:
                reps = np.broadcast_to(
                    chunk[-1:], (bs - n_valid, *chunk.shape[1:])
                )
                chunk = np.concatenate([chunk, reps])
            yield chunk, n_valid


def get_2d_prediction_dataloader(
    data_vol: np.ndarray, settings: SimpleNamespace
) -> PredictionBatcher:
    """Prediction batcher (reference dataloaders.py:60-71). Padding to the
    stride divisor is done volume-at-once by the predictor."""
    batch_size = utils.get_batch_size(settings, prediction=True)
    return PredictionBatcher(data_vol, batch_size)


# Re-export for API discoverability alongside the reference factory names.
__all__ = [
    "ArrayBatcher",
    "PredictionBatcher",
    "get_2d_training_dataloaders",
    "get_2d_prediction_dataloader",
    "get_2d_prediction_dataset",
    "get_2d_validation_dataset",
]
