import numpy as np

from volume_segmantics_tpu.data.base_data_manager import BaseDataManager


def test_load_from_ndarray(rand_int_volume, training_settings):
    training_settings.clip_data = False
    mgr = BaseDataManager(rand_int_volume, training_settings)
    assert mgr.data_vol_shape == rand_int_volume.shape
    assert mgr.input_data_chunking is True


def test_load_from_hdf5(rand_int_hdf5_path, rand_int_volume, training_settings):
    training_settings.clip_data = False
    mgr = BaseDataManager(rand_int_hdf5_path, training_settings)
    assert np.array_equal(mgr.data_vol, rand_int_volume)


def test_load_from_tiff(rand_int_tiff_path, rand_int_volume, training_settings):
    training_settings.clip_data = False
    mgr = BaseDataManager(rand_int_tiff_path, training_settings)
    assert np.array_equal(mgr.data_vol, rand_int_volume)


def test_downsample_ceil_shape(rand_int_volume, training_settings):
    training_settings.clip_data = False
    training_settings.downsample = True
    mgr = BaseDataManager(rand_int_volume, training_settings)
    expected = tuple(int(np.ceil(s / 2)) for s in rand_int_volume.shape)
    assert mgr.data_vol_shape == expected


def test_clip_produces_uint8(rand_float_volume, training_settings):
    training_settings.clip_data = True
    mgr = BaseDataManager(rand_float_volume, training_settings)
    assert mgr.data_vol.dtype == np.uint8


def test_nan_removed(rand_float_nan_volume, training_settings):
    training_settings.clip_data = False
    mgr = BaseDataManager(rand_float_nan_volume, training_settings)
    assert not np.isnan(mgr.data_vol).any()
