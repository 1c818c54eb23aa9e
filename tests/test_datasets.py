import numpy as np

from volume_segmantics_tpu.data.datasets import (
    get_2d_prediction_dataset,
    get_2d_training_dataset,
    get_2d_validation_dataset,
)


def test_training_dataset(image_dir, label_dir, training_settings):
    ds = get_2d_training_dataset(image_dir, label_dir, training_settings)
    assert len(ds) == 20
    image, mask = ds[0]
    assert image.shape == (1, 64, 64)
    assert mask.shape == (64, 64)
    assert image.dtype == np.float32


def test_validation_dataset(image_dir, label_dir, training_settings):
    ds = get_2d_validation_dataset(image_dir, label_dir, training_settings)
    image, mask = ds[3]
    assert image.shape == (1, 64, 64)


def test_stacked_arrays(image_dir, label_dir, training_settings):
    ds = get_2d_training_dataset(image_dir, label_dir, training_settings)
    images, masks = ds.stacked_arrays()
    assert images.shape == (20, 64, 64)
    assert masks.shape == (20, 64, 64)
    assert images.dtype == np.uint8


def test_natural_sort_order(image_dir, label_dir, training_settings):
    ds = get_2d_training_dataset(image_dir, label_dir, training_settings)
    names = [p.name for p in ds.images_fps]
    assert names[0] == "data_z_stack_0.png"
    assert names[10] == "data_z_stack_10.png"
    assert names[2] == "data_z_stack_2.png"


def test_prediction_dataset():
    vol = np.random.randint(256, size=(5, 61, 87)).astype(np.uint8)
    ds = get_2d_prediction_dataset(vol)
    assert len(ds) == 5
    image = ds[0]
    assert image.shape == (1, 64, 96)
    assert image.dtype == np.float32
