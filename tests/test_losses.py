"""Loss property tests mirroring reference tests/test_pytorch3dunet_losses.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from types import SimpleNamespace

from volume_segmantics_tpu.data import losses


@pytest.fixture()
def logits_and_targets():
    rng = np.random.default_rng(0)
    logits = jnp.array(rng.normal(size=(2, 3, 16, 16)), jnp.float32)
    idx = rng.integers(3, size=(2, 16, 16))
    targets = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    return logits, targets


def test_flatten_shape(logits_and_targets):
    logits, _ = logits_and_targets
    out = losses.flatten(logits)
    assert out.shape == (3, 2 * 16 * 16)


def test_per_channel_dice_perfect():
    idx = np.random.randint(3, size=(2, 8, 8))
    onehot = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    dice = losses.compute_per_channel_dice(onehot, onehot)
    assert np.allclose(np.asarray(dice), 1.0, atol=1e-4)


def test_dice_loss_range(logits_and_targets):
    logits, targets = logits_and_targets
    loss = losses.dice_loss(logits, targets)
    assert 0.0 <= float(loss) <= 1.0


def test_dice_loss_perfect_is_small():
    idx = np.random.randint(3, size=(2, 8, 8))
    onehot = jax.nn.one_hot(idx, 3, axis=1, dtype=jnp.float32)
    loss = losses.dice_loss(onehot, onehot, normalization="none")
    assert float(loss) < 1e-3


def test_generalized_dice_range(logits_and_targets):
    logits, targets = logits_and_targets
    loss = losses.generalized_dice_loss(logits, targets)
    assert 0.0 <= float(loss) <= 1.0


def test_bce_matches_manual():
    logits = jnp.array([[0.5, -1.0], [2.0, 0.0]], jnp.float32)
    targets = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    expected = np.mean(
        np.maximum(np.asarray(logits), 0)
        - np.asarray(logits) * np.asarray(targets)
        + np.log1p(np.exp(-np.abs(np.asarray(logits))))
    )
    assert np.isclose(float(losses.bce_with_logits_loss(logits, targets)), expected)


def test_cross_entropy_uniform():
    logits = jnp.zeros((2, 4, 8, 8), jnp.float32)
    idx = jnp.array(np.random.randint(4, size=(2, 8, 8)))
    loss = losses.cross_entropy_loss(logits, idx)
    assert np.isclose(float(loss), np.log(4), atol=1e-5)


def test_bce_dice_combination(logits_and_targets):
    logits, targets = logits_and_targets
    combo = losses.bce_dice_loss(logits, targets, 0.75, 0.25)
    bce = losses.bce_with_logits_loss(logits, targets)
    dice = losses.dice_loss(logits, targets)
    assert np.isclose(float(combo), 0.75 * float(bce) + 0.25 * float(dice), atol=1e-6)


def test_gradients_flow(logits_and_targets):
    logits, targets = logits_and_targets
    for fn in (
        lambda l: losses.dice_loss(l, targets),
        lambda l: losses.bce_with_logits_loss(l, targets),
        lambda l: losses.generalized_dice_loss(l, targets),
    ):
        g = jax.grad(fn)(logits)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_get_loss_fn_dispatch(logits_and_targets):
    logits, targets = logits_and_targets
    for name in (
        "DiceLoss", "BCEDiceLoss", "BCELoss", "CrossEntropyLoss",
        "GeneralizedDiceLoss",
    ):
        s = SimpleNamespace(loss_criterion=name, alpha=0.75, beta=0.25)
        fn = losses.get_loss_fn(s)
        val = float(fn(logits, targets))
        assert np.isfinite(val)


def test_get_loss_fn_bad_name_exits():
    with pytest.raises(SystemExit):
        losses.get_loss_fn(SimpleNamespace(loss_criterion="Nope"))
