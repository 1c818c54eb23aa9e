import numpy as np

from volume_segmantics_tpu.data.dataloaders import (
    get_2d_prediction_dataloader,
    get_2d_training_dataloaders,
)


def test_training_split_sizes(image_dir, label_dir, training_settings):
    train_loader, val_loader = get_2d_training_dataloaders(
        image_dir, label_dir, training_settings
    )
    # 20 slices, 0.8 split; batch size is rounded up to a multiple of the
    # device count (8 virtual CPU devices in tests)
    bs = train_loader.batch_size
    assert bs % 8 == 0
    assert len(train_loader.indices) == 16
    assert len(val_loader.indices) == 4
    assert len(train_loader) == 16 // bs
    assert len(val_loader) == -(-4 // bs)


def test_training_batches(image_dir, label_dir, training_settings):
    train_loader, _ = get_2d_training_dataloaders(
        image_dir, label_dir, training_settings
    )
    batches = list(train_loader)
    assert len(batches) == len(train_loader)
    images, masks, n_valid = batches[0]
    bs = train_loader.batch_size
    assert images.shape == (bs, 64, 64)
    assert masks.shape == (bs, 64, 64)
    assert n_valid == bs


def test_remainder_batch_padded():
    from volume_segmantics_tpu.data.dataloaders import ArrayBatcher

    images = np.zeros((5, 8, 8), np.uint8)
    masks = np.zeros((5, 8, 8), np.uint8)
    b = ArrayBatcher(images, masks, np.arange(5), 2, shuffle=False, drop_last=False)
    batches = list(b)
    assert len(batches) == 3
    assert batches[-1][0].shape == (2, 8, 8)
    assert batches[-1][2] == 1  # only one valid sample in final batch


def test_prediction_dataloader(prediction_settings):
    vol = np.random.randint(256, size=(5, 32, 32)).astype(np.uint8)
    loader = get_2d_prediction_dataloader(vol, prediction_settings)
    batches = list(loader)
    assert sum(n for _, n in batches) == 5
    assert all(b.shape[0] == loader.batch_size for b, _ in batches)


def test_prefetch_to_device_order_and_len():
    from volume_segmantics_tpu.data.dataloaders import PrefetchToDevice

    batches = [(np.full((2, 4), i), np.full((2, 4), -i), 2) for i in range(7)]

    class Loader:
        def __len__(self):
            return len(batches)

        def __iter__(self):
            return iter(batches)

    placed = []
    pf = PrefetchToDevice(Loader(), lambda a: (placed.append(a.sum()), a)[1])
    out = list(pf)
    assert len(pf) == 7
    assert [int(o[0][0, 0]) for o in out] == list(range(7))
    assert [int(o[1][0, 0]) for o in out] == [0, -1, -2, -3, -4, -5, -6]
    assert len(placed) == 14  # place_fn ran for every array


def test_prefetch_to_device_propagates_exceptions():
    from volume_segmantics_tpu.data.dataloaders import PrefetchToDevice

    class Boom(Exception):
        pass

    def gen():
        yield (np.zeros((1,)), np.zeros((1,)), 1)
        raise Boom("loader died")

    class Loader:
        def __len__(self):
            return 2

        def __iter__(self):
            return gen()

    pf = PrefetchToDevice(Loader(), lambda a: a)
    it = iter(pf)
    next(it)
    import pytest as _pytest

    with _pytest.raises(Boom):
        next(it)


def test_tiny_index_set_fills_full_batch():
    """Wrap-around padding must fill the batch even when the index set is
    smaller than half the batch size (fixed-shape compile contract)."""
    from volume_segmantics_tpu.data.dataloaders import ArrayBatcher

    images = np.arange(3 * 4 * 4, dtype=np.uint8).reshape(3, 4, 4)
    masks = images.copy()
    b = ArrayBatcher(images, masks, np.arange(3), 16, shuffle=False,
                     drop_last=False)
    (imgs, msks, n_valid), = list(b)
    assert imgs.shape == (16, 4, 4)
    assert n_valid == 3
    # Pad entries cycle through the real samples.
    np.testing.assert_array_equal(imgs[3], images[0])
    np.testing.assert_array_equal(imgs[5], images[2])
    np.testing.assert_array_equal(imgs[15], images[0])


def test_prefetch_worker_stops_after_early_break():
    """Breaking out of a prefetched loop must release the worker thread
    (it previously parked on q.put forever, pinning device batches)."""
    import time

    from volume_segmantics_tpu.data.dataloaders import PrefetchToDevice

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield (np.full((1,), i), np.full((1,), i), 1)

    class Loader:
        def __len__(self):
            return 1000

        def __iter__(self):
            return gen()

    pf = PrefetchToDevice(Loader(), lambda a: a, depth=2)
    for item in pf:
        break  # early exit, as the LR finder does
    time.sleep(0.3)
    count_after_stop = len(produced)
    time.sleep(0.3)
    assert len(produced) == count_after_stop, "worker kept producing"
    assert count_after_stop < 10


def test_training_split_rejects_empty_split(tmp_path, training_settings):
    import pytest

    images = np.zeros((3, 16, 16), np.uint8)
    masks = np.zeros((3, 16, 16), np.uint8)
    old = training_settings.training_set_proportion
    training_settings.training_set_proportion = 1.0
    with pytest.raises(ValueError, match="non-empty"):
        get_2d_training_dataloaders(images, masks, training_settings)
    training_settings.training_set_proportion = old


def test_mismatched_slice_dirs_rejected(tmp_path):
    import imageio.v2 as iio
    import pytest

    from volume_segmantics_tpu.data.datasets import VolSeg2dDataset

    im_dir, lb_dir = tmp_path / "im", tmp_path / "lb"
    im_dir.mkdir(), lb_dir.mkdir()
    for i in range(3):
        iio.imwrite(im_dir / f"s{i}.png", np.zeros((8, 8), np.uint8))
    for i in range(2):
        iio.imwrite(lb_dir / f"s{i}.png", np.zeros((8, 8), np.uint8))
    with pytest.raises(ValueError, match="slice counts differ"):
        VolSeg2dDataset(im_dir, lb_dir)


def test_throughput_batch_clamped_on_small_datasets(training_settings, caplog):
    """`performance_profile: throughput` keeps >= MIN_TRAIN_STEPS_PER_EPOCH
    optimizer/BN steps per epoch on small datasets (at 4-5 steps/epoch the
    lagging BN running stats pinned validation loss at ~1.0 and patience
    killed the run — measured Dice 0.04 on the tutorial volume). Explicit
    batch_size settings are never clamped."""
    import copy
    import logging

    import volume_segmantics_tpu.utils.config as cfg

    n = 80  # small: 64 training slices after the 0.8 split
    images = np.zeros((n, 32, 32), np.uint8)
    masks = np.zeros((n, 32, 32), np.uint8)
    s = copy.deepcopy(training_settings)
    s.image_size = 32
    s.performance_profile = "throughput"
    if hasattr(s, "batch_size"):
        s.batch_size = None
    with caplog.at_level(logging.INFO):
        train_b, _ = get_2d_training_dataloaders(images, masks, s)
    import jax

    n_train = int(n * s.training_set_proportion)
    expected = max(n_train // cfg.MIN_TRAIN_STEPS_PER_EPOCH,
                   cfg.BIG_TRAIN_BATCH)
    d = jax.device_count()
    expected = ((expected + d - 1) // d) * d  # DP divisibility preserved
    assert train_b.batch_size == expected
    assert any("Clamping throughput-profile batch" in r.getMessage()
               for r in caplog.records)
    assert len(train_b) >= min(
        cfg.MIN_TRAIN_STEPS_PER_EPOCH, n_train // expected
    )

    # Explicit override wins unclamped.
    s2 = copy.deepcopy(s)
    s2.batch_size = cfg.THROUGHPUT_TRAIN_BATCH
    train_b2, _ = get_2d_training_dataloaders(images, masks, s2)
    assert train_b2.batch_size == cfg.THROUGHPUT_TRAIN_BATCH
