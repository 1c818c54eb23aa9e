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


class TestSampleWeights:
    """Padded-batch masking: a batch padded with junk samples plus a 0/1
    sample_weights vector must reproduce the pad-free loss exactly
    (consumed by the validation loop; see parallel/train.py
    build_dp_eval_step)."""

    def _batches(self, n_valid=5, pad=3, classes=3, size=8, seed=0):
        rng = np.random.default_rng(seed)
        logits = rng.normal(size=(n_valid + pad, classes, size, size)).astype(
            np.float32
        )
        idx = rng.integers(0, classes, (n_valid + pad, size, size))
        targets = np.eye(classes, dtype=np.float32)[idx].transpose(0, 3, 1, 2)
        w = np.zeros((n_valid + pad,), np.float32)
        w[:n_valid] = 1.0
        return jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(w), n_valid

    @pytest.mark.parametrize(
        "name", ["DiceLoss", "BCEDiceLoss", "BCELoss", "CrossEntropyLoss",
                 "GeneralizedDiceLoss"]
    )
    def test_masked_equals_padfree(self, name):
        logits, targets, w, n_valid = self._batches()
        s = SimpleNamespace(loss_criterion=name, alpha=0.75, beta=0.25)
        fn = losses.get_loss_fn(s)
        masked = float(fn(logits, targets, sample_weights=w))
        padfree = float(fn(logits[:n_valid], targets[:n_valid]))
        assert np.isclose(masked, padfree, rtol=1e-5), (name, masked, padfree)

    def test_metrics_masked_equal_padfree(self):
        from volume_segmantics_tpu.data import metrics

        logits, targets, w, n_valid = self._batches()
        probs = jax.nn.softmax(logits, axis=1)
        for fn in (metrics.mean_iou, metrics.dice_coefficient):
            masked = float(fn(probs, targets, sample_weights=w))
            padfree = float(fn(probs[:n_valid], targets[:n_valid]))
            assert np.isclose(masked, padfree, rtol=1e-5)

    def test_weighted_epoch_average_invariant_to_batch_size(self):
        """VERDICT r1 #5: with per-sample-decomposable losses, the
        n_valid-weighted epoch average must not depend on the batch-size
        remainder (21 samples, bs 8 vs bs 7 vs bs 21)."""
        rng = np.random.default_rng(1)
        n, classes, size = 21, 3, 8
        logits = rng.normal(size=(n, classes, size, size)).astype(np.float32)
        idx = rng.integers(0, classes, (n, size, size))
        targets = np.eye(classes, dtype=np.float32)[idx].transpose(0, 3, 1, 2)
        fn = losses.get_loss_fn(
            SimpleNamespace(loss_criterion="CrossEntropyLoss")
        )

        def epoch_avg(bs):
            vals, weights = [], []
            for b in range(int(np.ceil(n / bs))):
                chunk = np.arange(b * bs, min((b + 1) * bs, n))
                n_valid = len(chunk)
                if n_valid < bs:  # wrap-pad like ArrayBatcher
                    chunk = np.concatenate([chunk, np.arange(bs - n_valid)])
                w = (np.arange(bs) < n_valid).astype(np.float32)
                vals.append(float(fn(
                    jnp.asarray(logits[chunk]), jnp.asarray(targets[chunk]),
                    sample_weights=jnp.asarray(w),
                )))
                weights.append(n_valid)
            return float(np.average(vals, weights=weights))

        ref = epoch_avg(21)
        assert np.isclose(epoch_avg(8), ref, rtol=1e-5)
        assert np.isclose(epoch_avg(7), ref, rtol=1e-5)


def test_generalized_dice_sample_weights_mask_padding():
    """Padded samples must be exactly invisible — including through the
    single-channel (p, 1-p) expansion, where zeroing the inputs BEFORE the
    expansion would turn pads into weight-1 background voxels."""
    rng = np.random.default_rng(8)
    real = rng.normal(size=(3, 1, 8, 8)).astype(np.float32)
    real_t = (rng.random((3, 1, 8, 8)) > 0.5).astype(np.float32)
    pad = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    pad_t = np.ones((2, 1, 8, 8), np.float32)

    unpadded = losses.generalized_dice_loss(
        jnp.asarray(real), jnp.asarray(real_t)
    )
    padded = losses.generalized_dice_loss(
        jnp.asarray(np.concatenate([real, pad])),
        jnp.asarray(np.concatenate([real_t, pad_t])),
        sample_weights=jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0]),
    )
    np.testing.assert_allclose(float(padded), float(unpadded), rtol=1e-5)
