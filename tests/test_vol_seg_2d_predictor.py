"""Predictor integration tests (reference tests/test_vol_seg_2d_predictor.py
equivalent: asserts dtypes uint8 labels / float16 probs / 4D one-hot)."""

import numpy as np
import pytest

from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
    VolSeg2dPredictor,
)
from volume_segmantics_tpu.utils.base_data_utils import Axis


@pytest.fixture()
def data_vol():
    return np.random.randint(256, size=(12, 34, 21)).astype(np.uint8)


@pytest.mark.slow
class TestPredictor:
    def test_single_axis(self, predictor, data_vol):
        labels, probs = predictor._predict_single_axis(data_vol)
        assert labels.shape == data_vol.shape
        assert labels.dtype == np.uint8
        assert probs.shape == data_vol.shape
        assert probs.dtype == np.float16

    def test_single_axis_y(self, predictor, data_vol):
        labels, probs = predictor._predict_single_axis(data_vol, axis=Axis.Y)
        assert labels.shape == data_vol.shape
        assert probs.dtype == np.float16

    def test_3_ways(self, predictor, data_vol):
        labels, probs = predictor._predict_3_ways_max_probs(data_vol)
        assert labels.shape == data_vol.shape
        assert labels.dtype == np.uint8
        assert probs.dtype == np.float16

    def test_12_ways(self, predictor, data_vol):
        labels, probs = predictor._predict_12_ways_max_probs(data_vol)
        assert labels.shape == data_vol.shape
        assert labels.dtype == np.uint8
        assert probs.dtype == np.float16

    def test_one_hot_single(self, predictor, data_vol):
        oh = predictor._predict_single_axis_to_one_hot(data_vol)
        assert oh.shape == (predictor.num_labels, *data_vol.shape)
        assert oh.dtype == np.uint8
        assert oh.max() <= 1

    def test_one_hot_3_ways(self, predictor, data_vol):
        oh = predictor._predict_3_ways_one_hot(data_vol)
        assert oh.shape == (predictor.num_labels, *data_vol.shape)
        assert oh.sum(axis=0).max() == 3

    def test_merge_semantics(self, predictor):
        # ties go to the earlier sweep; higher prob wins
        l0 = np.zeros((2, 2, 2), np.uint8)
        l1 = np.ones((2, 2, 2), np.uint8)
        p0 = np.full((2, 2, 2), 0.5, np.float16)
        p1 = np.full((2, 2, 2), 0.5, np.float16)
        p1[0] = 0.9
        labels, probs = predictor._merge_pair(l0, p0, l1, p1)
        labels, probs = np.asarray(labels), np.asarray(probs)
        assert (labels[0] == 1).all()  # higher prob wins
        assert (labels[1] == 0).all()  # tie keeps the first sweep
        assert (probs[0] == np.float16(0.9)).all()


@pytest.mark.parametrize("bits,maxval", [(1, 2), (2, 4), (4, 16)])
def test_label_bit_packing_roundtrip(bits, maxval):
    """On-device packing + host unpacking must be lossless for every
    supported class count and non-aligned widths."""
    import jax.numpy as jnp

    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        _pack_u8_trace,
        _unpack_u8_host,
    )

    rng = np.random.default_rng(bits)
    for shape in [(3, 5, 17), (2, 4, 8), (4, 7, 31, 3)]:
        arr = rng.integers(0, maxval, shape).astype(np.uint8)
        packed = np.asarray(_pack_u8_trace(jnp.asarray(arr), bits))
        out = _unpack_u8_host(packed, bits, shape[-1])
        assert np.array_equal(out, arr)


@pytest.mark.slow
class TestBatchBackoff:
    """Device-memory backoff: a sweep whose compile exhausts device memory
    (e.g. DeepLabV3+'s VMEM-heavy decoder fusions at the throughput batch)
    must retry at half the batch until it fits, then return correct output."""

    def test_backoff_halves_batch_and_recovers(
        self, predictor, data_vol, monkeypatch
    ):
        import jax

        reference, _ = predictor._predict_single_axis(data_vol)
        predictor._clear_sweep_cache()
        predictor.batch_size = 64
        real_get_jitted = predictor._get_jitted
        oom_until_batch = 16
        compile_attempts = []

        def fake_get_jitted(kind, shape, fn):
            real = real_get_jitted(kind, shape, fn)

            def wrapper(*args):
                if not kind.startswith("axis_"):
                    return real(*args)
                compile_attempts.append(predictor.batch_size)
                if predictor.batch_size > oom_until_batch:
                    raise jax.errors.JaxRuntimeError(
                        "RESOURCE_EXHAUSTED: Allocation (size=174620672) "
                        "would exceed memory (size=134217728)"
                    )
                return real(*args)

            return wrapper

        monkeypatch.setattr(predictor, "_get_jitted", fake_get_jitted)
        labels, _ = predictor._predict_single_axis(data_vol)
        assert compile_attempts == [64, 32, 16]
        assert predictor.batch_size == 16
        assert np.array_equal(labels, reference)

    def test_non_memory_error_propagates(self, predictor, data_vol, monkeypatch):
        import jax

        predictor._clear_sweep_cache()

        def fake_get_jitted(kind, shape, fn):
            def wrapper(*args):
                raise jax.errors.JaxRuntimeError("INVALID_ARGUMENT: shape oops")

            return wrapper

        monkeypatch.setattr(predictor, "_get_jitted", fake_get_jitted)
        start = predictor.batch_size
        with pytest.raises(jax.errors.JaxRuntimeError, match="INVALID_ARGUMENT"):
            predictor._predict_single_axis(data_vol)
        assert predictor.batch_size == start


@pytest.mark.slow
def test_per_arch_prediction_batch_cap(tmp_path, prediction_settings,
                                       monkeypatch):
    """VMEM-heavy decoders start at their preset batch cap
    (cfg.PRED_BATCH_CAPS) instead of compile-fail-halving from
    BIG_PRED_BATCH; an explicit settings override bypasses the cap."""
    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    struc = {
        "type": ModelType.DEEPLABV3_PLUS,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    ckpt = tmp_path / "dlv3p.pytorch"
    save_checkpoint(ckpt, bundle.variables, struc, label_codes={})

    # Pretend the auto-heuristic picked the big batch (the CPU test backend
    # reports no memory stats, which yields SMALL_BATCH otherwise).
    import volume_segmantics_tpu.utils.base_data_utils as utils

    monkeypatch.delattr(prediction_settings, "prediction_batch_size",
                        raising=False)
    monkeypatch.setattr(utils, "_device_hbm_gb", lambda: 16.0)
    # The shipped table is empty on current hardware (every arch measured
    # compiling first-try at BIG_PRED_BATCH); pin a cap to test the
    # mechanism that protects future VMEM-heavy (arch, shape) cases.
    monkeypatch.setitem(cfg.PRED_BATCH_CAPS, "DEEPLABV3_PLUS", 32)
    p = VolSeg2dPredictor(ckpt, prediction_settings)
    assert p.batch_size == cfg.PRED_BATCH_CAPS["DEEPLABV3_PLUS"]

    # Explicit user override wins over the cap.
    prediction_settings.prediction_batch_size = 48
    p2 = VolSeg2dPredictor(ckpt, prediction_settings)
    assert p2.batch_size == 48


@pytest.mark.slow
class TestTwelveWayDedup:
    """The deduplicated 8-sweep 12-way paths must be BIT-identical to the
    straightforward 4x3-rotation computation (the reference's semantics,
    kept as *_via_rotations): max-prob merging with strict-> ties and
    weighted one-hot voting."""

    @pytest.fixture()
    def vol(self):
        rng = np.random.default_rng(11)
        return rng.integers(0, 255, (10, 18, 14)).astype(np.uint8)

    def test_max_probs_equal(self, predictor, vol):
        lab_new, prob_new = predictor._predict_12_ways_max_probs(vol)
        lab_old, prob_old = predictor._predict_12_ways_max_probs_via_rotations(
            vol
        )
        assert np.array_equal(lab_new, lab_old)
        assert np.array_equal(prob_new, prob_old)

    def test_max_probs_equal_no_probs(self, predictor, vol):
        lab_new, p = predictor._predict_12_ways_max_probs(
            vol, output_probs=False
        )
        assert p is None
        lab_old, _ = predictor._predict_12_ways_max_probs_via_rotations(
            vol, output_probs=False
        )
        assert np.array_equal(lab_new, lab_old)

    def test_one_hot_equal(self, predictor, vol):
        votes_new = predictor._predict_12_ways_one_hot(vol)
        votes_old = predictor._predict_12_ways_one_hot_via_rotations(vol)
        assert np.array_equal(votes_new, votes_old)
        assert votes_new.sum(axis=0).min() == 12

    def test_slab_pipelined_path_equal(self, predictor, vol, monkeypatch):
        """Force the slab-pipelined upload on a tiny volume and pin
        equality with the single-upload path."""
        monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1)
        monkeypatch.setattr(type(predictor), "OVERLAP_SLABS", 4)
        lab_slab, prob_slab = predictor._predict_12_ways_max_probs(vol)
        votes_slab = predictor._predict_12_ways_one_hot(vol)
        monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1 << 60)
        lab_one, prob_one = predictor._predict_12_ways_max_probs(vol)
        votes_one = predictor._predict_12_ways_one_hot(vol)
        assert np.array_equal(lab_slab, lab_one)
        assert np.array_equal(prob_slab, prob_one)
        assert np.array_equal(votes_slab, votes_one)


@pytest.mark.slow
def test_3_way_slab_pipelined_equal(predictor, monkeypatch):
    """Slab-pipelined MEDIUM quality (z per-slab + fused y/x/merge program)
    must match the single fused three-way program bit-for-bit, for both
    max-prob and one-hot outputs."""
    rng = np.random.default_rng(21)
    vol = rng.integers(0, 255, (10, 18, 14)).astype(np.uint8)
    monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1)
    monkeypatch.setattr(type(predictor), "OVERLAP_SLABS", 4)
    lab_slab, prob_slab = predictor._predict_3_ways_max_probs(vol)
    votes_slab = predictor._predict_3_ways_one_hot(vol)
    monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1 << 60)
    lab_one, prob_one = predictor._predict_3_ways_max_probs(vol)
    votes_one = predictor._predict_3_ways_one_hot(vol)
    assert np.array_equal(lab_slab, lab_one)
    assert np.array_equal(prob_slab, prob_one)
    assert np.array_equal(votes_slab, votes_one)
    assert votes_slab.sum(axis=0).min() == 3


@pytest.mark.slow
def test_single_axis_slab_pipelined_equal(predictor, monkeypatch):
    """Slab-pipelined LOW quality (per-slab sweep + download) matches the
    single-upload path bit-for-bit; non-Z axes fall through unchanged."""
    rng = np.random.default_rng(31)
    vol = rng.integers(0, 255, (10, 18, 14)).astype(np.uint8)
    monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1)
    monkeypatch.setattr(type(predictor), "OVERLAP_SLABS", 4)
    lab_slab, prob_slab = predictor._predict_single_axis(vol)
    monkeypatch.setattr(type(predictor), "OVERLAP_MIN_BYTES", 1 << 60)
    lab_one, prob_one = predictor._predict_single_axis(vol)
    assert np.array_equal(lab_slab, lab_one)
    assert np.array_equal(prob_slab, prob_one)
