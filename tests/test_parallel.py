"""Parallel-layer tests on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from volume_segmantics_tpu.parallel.mesh import get_mesh, replicate, shard_batch


def test_mesh_has_8_devices():
    mesh = get_mesh()
    assert mesh.devices.size == 8


def test_shard_and_replicate_roundtrip():
    mesh = get_mesh()
    batch = np.arange(8 * 4 * 4, dtype=np.uint8).reshape(8, 4, 4)
    sharded = shard_batch(batch, mesh)
    assert np.array_equal(np.asarray(sharded), batch)
    tree = {"w": np.ones((3, 3), np.float32)}
    rep = replicate(tree, mesh)
    assert np.array_equal(np.asarray(rep["w"]), tree["w"])


@pytest.mark.slow
def test_sharded_prediction_matches_single_device(model_path, prediction_settings):
    """Slice-axis sharding must not change results (no halos, pointwise
    merge)."""
    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        VolSeg2dPredictor,
    )

    vol = np.random.default_rng(0).integers(0, 255, (16, 32, 32)).astype(np.uint8)
    prediction_settings.prediction_batch_size = 8
    prediction_settings.data_parallel = True
    sharded = VolSeg2dPredictor(model_path, prediction_settings)
    assert sharded.n_dev == 8
    l_dp, p_dp = sharded._predict_single_axis(vol)

    prediction_settings.data_parallel = False
    single = VolSeg2dPredictor(model_path, prediction_settings)
    assert single.n_dev == 1
    l_1, p_1 = single._predict_single_axis(vol)

    assert np.array_equal(l_dp, l_1)
    # probs may differ by a float16 ulp: different local batch sizes change
    # conv accumulation order
    assert np.allclose(
        p_dp.astype(np.float32), p_1.astype(np.float32), atol=2e-3
    )
