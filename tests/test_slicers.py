import numpy as np
import pytest

from volume_segmantics_tpu.data.slicers import TrainingDataSlicer
from volume_segmantics_tpu.utils.base_data_utils import Axis


@pytest.fixture()
def slicer_settings(training_settings):
    training_settings.clip_data = False
    return training_settings


def _make_slicer(data, labels, settings):
    return TrainingDataSlicer(data, labels, settings)


class TestLabelPreprocessing:
    def test_multilabel_flag(self, rand_int_volume, rand_label_volume, slicer_settings):
        slicer = _make_slicer(rand_int_volume, rand_label_volume, slicer_settings)
        assert slicer.multilabel == (len(np.unique(rand_label_volume)) > 2)

    def test_label_fixing_nonzero_start(
        self, rand_int_volume, rand_label_volume_no_zeros, slicer_settings
    ):
        slicer = _make_slicer(
            rand_int_volume, rand_label_volume_no_zeros.copy(), slicer_settings
        )
        fixed = np.unique(slicer.seg_vol)
        assert fixed[0] == 0
        assert np.array_equal(fixed, np.arange(len(fixed)))

    def test_label_fixing_binary_255(
        self, rand_int_volume, rand_binary_label_volume, slicer_settings
    ):
        vol = rand_binary_label_volume
        data = np.random.randint(256, size=vol.shape)
        slicer = _make_slicer(data, vol.copy(), slicer_settings)
        assert set(np.unique(slicer.seg_vol)) <= {0, 1}

    def test_codes(self, rand_int_volume, rand_label_volume, slicer_settings):
        slicer = _make_slicer(rand_int_volume, rand_label_volume, slicer_settings)
        assert len(slicer.codes) == slicer.num_seg_classes


class TestSliceOutput:
    @pytest.mark.parametrize("source", ["ndarray", "hdf5", "tiff"])
    def test_slice_counts_all_axes(
        self,
        source,
        tmp_path,
        rand_int_volume,
        rand_label_volume,
        rand_int_hdf5_path,
        rand_label_hdf5_path,
        rand_int_tiff_path,
        rand_label_tiff_path,
        slicer_settings,
    ):
        data = {
            "ndarray": (rand_int_volume, rand_label_volume),
            "hdf5": (rand_int_hdf5_path, rand_label_hdf5_path),
            "tiff": (rand_int_tiff_path, rand_label_tiff_path),
        }[source]
        slicer = _make_slicer(data[0], data[1], slicer_settings)
        d_dir, s_dir = tmp_path / "d", tmp_path / "s"
        slicer.output_data_slices(d_dir, "data0")
        slicer.output_label_slices(s_dir, "seg0")
        expected = sum(rand_int_volume.shape)
        assert len(list(d_dir.glob("*.png"))) == expected
        assert len(list(s_dir.glob("*.png"))) == expected
        slicer.clean_up_slices()
        assert not d_dir.exists()
        assert not s_dir.exists()

    def test_single_axis_count(
        self, tmp_path, rand_int_volume, rand_label_volume, slicer_settings
    ):
        slicer_settings.training_axes = "Y"
        slicer = _make_slicer(rand_int_volume, rand_label_volume, slicer_settings)
        d_dir = tmp_path / "d"
        slicer.output_data_slices(d_dir, "data0")
        assert len(list(d_dir.glob("*.png"))) == rand_int_volume.shape[1]

    def test_binary_squash_in_pngs(
        self, tmp_path, rand_binary_label_volume, slicer_settings
    ):
        import imageio

        data = np.random.randint(256, size=rand_binary_label_volume.shape)
        slicer = _make_slicer(data, rand_binary_label_volume.copy(), slicer_settings)
        s_dir = tmp_path / "s"
        slicer.output_label_slices(s_dir, "seg0")
        one_png = sorted(s_dir.glob("*.png"))[0]
        arr = imageio.imread(one_png)
        assert set(np.unique(arr)) <= {0, 1}

    def test_in_memory_slices(
        self, rand_int_volume, rand_label_volume, slicer_settings
    ):
        slicer = _make_slicer(rand_int_volume, rand_label_volume, slicer_settings)
        data_slices, label_slices = slicer.get_slice_arrays()
        assert len(data_slices) == sum(rand_int_volume.shape)
        assert len(label_slices) == len(data_slices)
        assert data_slices[0].shape == rand_int_volume.shape[1:]

    def test_downsample_keeps_data_label_alignment(self, slicer_settings):
        """With downsample=True the label volume is reduced alongside the
        data volume (the reference silently pairs half-res data with
        full-res labels); slice counts and shapes must match."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 255, (13, 18, 22)).astype(np.uint8)
        labels = (data > 128).astype(np.uint8)
        slicer_settings.downsample = True
        # Downsampling emits float64 block means; clip restores uint8 (the
        # reference pairing of these settings).
        slicer_settings.clip_data = True
        try:
            slicer = _make_slicer(data, labels, slicer_settings)
            assert slicer.data_vol.shape == (7, 9, 11)
            assert slicer.seg_vol.shape == slicer.data_vol.shape
            data_slices, label_slices = slicer.get_slice_arrays()
            assert len(data_slices) == len(label_slices) == 7 + 9 + 11
            for d, l in zip(data_slices, label_slices):
                assert d.shape == l.shape
        finally:
            slicer_settings.downsample = False
            slicer_settings.clip_data = False

    def test_mismatched_label_shape_rejected(self, slicer_settings):
        import pytest

        data = np.zeros((8, 10, 12), np.uint8)
        labels = np.zeros((8, 10, 11), np.uint8)
        with pytest.raises(ValueError, match="does not match"):
            _make_slicer(data, labels, slicer_settings)
