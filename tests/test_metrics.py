"""Metric property tests mirroring reference tests/test_pytorch3dunet_metrics.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

from volume_segmantics_tpu.data import metrics


@pytest.fixture()
def probs_and_targets():
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=(2, 3, 16, 16)), jnp.float32)
    probs = jax.nn.softmax(logits, axis=1)
    idx = rng.integers(3, size=(2, 16, 16))
    targets = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    return probs, targets


def test_dice_coefficient_range(probs_and_targets):
    probs, targets = probs_and_targets
    score = float(metrics.dice_coefficient(probs, targets))
    assert 0.0 <= score <= 1.0


def test_dice_coefficient_perfect():
    idx = np.random.randint(3, size=(2, 8, 8))
    onehot = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    assert np.isclose(float(metrics.dice_coefficient(onehot, onehot)), 1.0, atol=1e-4)


def test_mean_iou_range(probs_and_targets):
    probs, targets = probs_and_targets
    score = float(metrics.mean_iou(probs, targets))
    assert 0.0 <= score <= 1.0


def test_mean_iou_perfect():
    idx = np.random.randint(3, size=(2, 8, 8))
    onehot = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    # slightly soften to simulate probabilities with correct argmax
    probs = onehot * 0.9 + 0.05
    assert np.isclose(float(metrics.mean_iou(probs, onehot)), 1.0, atol=1e-5)


def test_psnr_and_mse():
    a = jnp.array(np.random.rand(8, 8), jnp.float32)
    assert float(metrics.mse(a, a)) == 0.0
    b = a + 0.1
    assert float(metrics.mse(a, b)) > 0
    assert np.isfinite(float(metrics.psnr(b, a)))


def test_metric_dispatch():
    assert metrics.get_eval_metric_fn(SimpleNamespace(eval_metric="MeanIoU")) is metrics.mean_iou
    assert (
        metrics.get_eval_metric_fn(SimpleNamespace(eval_metric="DiceCoefficient"))
        is metrics.dice_coefficient
    )
    with pytest.raises(SystemExit):
        metrics.get_eval_metric_fn(SimpleNamespace(eval_metric="Nope"))
