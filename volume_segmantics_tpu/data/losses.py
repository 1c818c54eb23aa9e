"""Segmentation losses as pure JAX functions.

Functional re-implementations of the losses the reference vendors from
pytorch-3dunet (reference volume_segmantics/data/pytorch3dunet_losses.py:15-351)
chosen via the `loss_criterion` setting (reference
model/operations/vol_seg_2d_trainer.py:124-148).

Conventions: `input` is raw logits shaped (N, C, *spatial); `target` is a
one-hot float tensor of the same shape. Everything is jit/grad friendly.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def flatten(tensor: jnp.ndarray) -> jnp.ndarray:
    """(N, C, *spatial) -> (C, N * prod(spatial)) — channel-major flatten
    (reference pytorch3dunet_losses.py:265-277)."""
    c = tensor.shape[1]
    axis_order = (1, 0) + tuple(range(2, tensor.ndim))
    return jnp.transpose(tensor, axis_order).reshape(c, -1)


def _apply_sample_weights(input, target, sample_weights):
    """Zero padded samples in both tensors; with 0/1 weights every sum-based
    reduction then matches the pad-free computation exactly."""
    if sample_weights is None:
        return input, target
    w = sample_weights.astype(input.dtype).reshape(
        (-1,) + (1,) * (input.ndim - 1)
    )
    return input * w, target * w


def compute_per_channel_dice(
    input: jnp.ndarray,
    target: jnp.ndarray,
    epsilon: float = 1e-6,
    weight=None,
    sample_weights=None,
) -> jnp.ndarray:
    """Per-channel Dice with the V-Net squared denominator
    (reference pytorch3dunet_losses.py:15-41). `input` must already be a
    probability map. `sample_weights` (N,) masks padded batch entries."""
    assert input.shape == target.shape, "'input' and 'target' must have the same shape"
    input, target = _apply_sample_weights(input, target, sample_weights)
    input = flatten(input)
    target = flatten(target).astype(input.dtype)
    intersect = (input * target).sum(-1)
    if weight is not None:
        intersect = weight * intersect
    denominator = (input * input).sum(-1) + (target * target).sum(-1)
    return 2 * (intersect / jnp.clip(denominator, min=epsilon))


def _normalize(input: jnp.ndarray, normalization: str) -> jnp.ndarray:
    if normalization == "sigmoid":
        return jax.nn.sigmoid(input)
    if normalization == "softmax":
        return jax.nn.softmax(input, axis=1)
    return input


def dice_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    weight=None,
    normalization: str = "sigmoid",
    sample_weights=None,
) -> jnp.ndarray:
    """DiceLoss (reference pytorch3dunet_losses.py:125-135): 1 - mean
    per-channel Dice of the normalized logits."""
    assert normalization in ("sigmoid", "softmax", "none")
    probs = _normalize(input, normalization)
    per_channel = compute_per_channel_dice(
        probs, target, weight=weight, sample_weights=sample_weights
    )
    return 1.0 - jnp.mean(per_channel)


def generalized_dice_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    normalization: str = "sigmoid",
    epsilon: float = 1e-6,
    sample_weights=None,
) -> jnp.ndarray:
    """Generalized Dice Loss with inverse-volume class weighting
    (reference pytorch3dunet_losses.py:138-170)."""
    probs = _normalize(input, normalization)
    assert probs.shape == target.shape
    n_samples = probs.shape[0]
    probs = flatten(probs)
    target = flatten(target).astype(probs.dtype)
    if probs.shape[0] == 1:
        probs = jnp.concatenate((probs, 1 - probs), axis=0)
        target = jnp.concatenate((target, 1 - target), axis=0)
    if sample_weights is not None:
        # Mask AFTER the single-channel (p, 1-p) expansion: zeroing the
        # inputs first would turn padded voxels into weight-1 "background"
        # (1 - 0 = 1) in both tensors, biasing intersect/denominator/w_l.
        # flatten() is (C, N-major * spatial), so each sample's weight
        # repeats over its spatial block.
        flat_w = jnp.repeat(
            sample_weights.astype(probs.dtype),
            probs.shape[-1] // n_samples,
        )
        probs = probs * flat_w
        target = target * flat_w
    w_l = target.sum(-1)
    w_l = 1.0 / jnp.clip(w_l * w_l, min=epsilon)
    w_l = jax.lax.stop_gradient(w_l)
    intersect = (probs * target).sum(-1) * w_l
    denominator = jnp.clip(((probs + target).sum(-1) * w_l), min=epsilon)
    dice = 2 * (intersect.sum() / denominator.sum())
    return 1.0 - jnp.mean(dice)


def bce_with_logits_loss(
    input: jnp.ndarray, target: jnp.ndarray, sample_weights=None
) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch nn.BCEWithLogitsLoss
    equivalent, used by reference trainer :136-138)."""
    target = target.astype(input.dtype)
    # log-sum-exp stable form: max(x,0) - x*y + log(1 + exp(-|x|))
    neg_abs = -jnp.abs(input)
    loss = jnp.clip(input, min=0) - input * target + jnp.log1p(jnp.exp(neg_abs))
    if sample_weights is None:
        return jnp.mean(loss)
    w = sample_weights.astype(loss.dtype).reshape(
        (-1,) + (1,) * (loss.ndim - 1)
    )
    per_sample_elems = loss[0].size
    return (loss * w).sum() / jnp.clip(
        w.sum() * per_sample_elems, min=1e-12
    )


def bce_dice_loss(
    input: jnp.ndarray, target: jnp.ndarray, alpha: float, beta: float,
    sample_weights=None,
) -> jnp.ndarray:
    """alpha * BCE + beta * Dice (reference pytorch3dunet_losses.py:173-184)."""
    return alpha * bce_with_logits_loss(
        input, target, sample_weights=sample_weights
    ) + beta * dice_loss(input, target, sample_weights=sample_weights)


def cross_entropy_loss(
    input: jnp.ndarray, target_indices: jnp.ndarray, sample_weights=None
) -> jnp.ndarray:
    """Mean categorical cross-entropy over the channel axis. `target_indices`
    is an integer class map shaped (N, *spatial) (torch nn.CrossEntropyLoss
    equivalent, used by reference trainer :139-141 with argmaxed targets)."""
    log_probs = jax.nn.log_softmax(input, axis=1)
    onehot = jax.nn.one_hot(target_indices, input.shape[1], axis=1, dtype=log_probs.dtype)
    per_pixel = -jnp.sum(onehot * log_probs, axis=1)
    if sample_weights is None:
        return jnp.mean(per_pixel)
    w = sample_weights.astype(per_pixel.dtype).reshape(
        (-1,) + (1,) * (per_pixel.ndim - 1)
    )
    return (per_pixel * w).sum() / jnp.clip(
        w.sum() * per_pixel[0].size, min=1e-12
    )


def weighted_cross_entropy_loss(
    input: jnp.ndarray, target_indices: jnp.ndarray
) -> jnp.ndarray:
    """WCE from https://arxiv.org/pdf/1707.03237.pdf
    (reference pytorch3dunet_losses.py:187-207)."""
    probs = jax.nn.softmax(input, axis=1)
    flattened = flatten(probs)
    class_weights = jax.lax.stop_gradient(
        (1.0 - flattened).sum(-1) / flattened.sum(-1)
    )
    log_probs = jax.nn.log_softmax(input, axis=1)
    onehot = jax.nn.one_hot(target_indices, input.shape[1], axis=1, dtype=log_probs.dtype)
    w = class_weights.reshape((1, -1) + (1,) * (input.ndim - 2))
    # torch F.cross_entropy(weight=w) normalizes by the summed weights of
    # the participating targets
    per_pixel = -jnp.sum(w * onehot * log_probs, axis=1)
    weight_map = jnp.sum(w * onehot, axis=1)
    return per_pixel.sum() / jnp.clip(weight_map.sum(), min=1e-12)


def pixel_wise_cross_entropy_loss(
    input: jnp.ndarray,
    target_indices: jnp.ndarray,
    weights: jnp.ndarray,
    class_weights=None,
) -> jnp.ndarray:
    """Per-pixel weighted cross-entropy (reference
    pytorch3dunet_losses.py:210-242). `weights` matches `target_indices`
    shape; `class_weights` is a per-class vector (defaults to ones)."""
    log_probs = jax.nn.log_softmax(input, axis=1)
    n_classes = input.shape[1]
    onehot = jax.nn.one_hot(target_indices, n_classes, axis=1, dtype=log_probs.dtype)
    w = jnp.expand_dims(weights, 1).astype(log_probs.dtype)
    w = jnp.broadcast_to(w, input.shape)
    if class_weights is None:
        class_weights = jnp.ones((n_classes,), log_probs.dtype)
    cw = jnp.reshape(class_weights, (1, -1) + (1,) * (input.ndim - 2))
    result = -(cw * w) * onehot * log_probs
    return jnp.mean(result)


def weighted_smooth_l1_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    threshold: float,
    initial_weight: float,
    apply_below_threshold: bool = True,
) -> jnp.ndarray:
    """Smooth-L1 with extra weight on targets below/above a threshold
    (reference pytorch3dunet_losses.py:245-262)."""
    diff = input - target
    abs_diff = jnp.abs(diff)
    l1 = jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5)
    mask = target < threshold if apply_below_threshold else target >= threshold
    l1 = jnp.where(mask, l1 * initial_weight, l1)
    return jnp.mean(l1)


def mse_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((input - target) ** 2)


def l1_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(input - target))


def smooth_l1_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    diff = input - target
    abs_diff = jnp.abs(diff)
    return jnp.mean(jnp.where(abs_diff < 1.0, 0.5 * diff * diff, abs_diff - 0.5))


def masked_loss(loss_fn: Callable, ignore_index) -> Callable:
    """Wrapper zeroing input/target where target equals `ignore_index`
    (reference pytorch3dunet_losses.py:44-64)."""
    assert ignore_index is not None, "ignore_index cannot be None"

    def wrapped(input, target):
        mask = (target != ignore_index).astype(input.dtype)
        mask = jax.lax.stop_gradient(mask)
        return loss_fn(input * mask, target * mask)

    return wrapped


def skip_last_target_channel(loss_fn: Callable, squeeze_channel: bool = False) -> Callable:
    """Wrapper removing the last target channel
    (reference pytorch3dunet_losses.py:67-86)."""

    def wrapped(input, target):
        assert target.shape[1] > 1, (
            "Target tensor has a singleton channel dimension, cannot remove channel"
        )
        target = target[:, :-1, ...]
        if squeeze_channel:
            target = jnp.squeeze(target, axis=1)
        return loss_fn(input, target)

    return wrapped


def get_loss_criterion(config: dict) -> Callable:
    """Config-driven loss factory mirroring reference
    pytorch3dunet_losses.py:280-351 (`config['loss']` holds `name` plus
    loss-specific options; ignore_index wraps non-CE losses in masking)."""
    assert "loss" in config, "Could not find loss function configuration"
    loss_config = dict(config["loss"])
    name = loss_config.pop("name")
    ignore_index = loss_config.pop("ignore_index", None)
    skip_last_target = loss_config.pop("skip_last_target", False)
    weight = loss_config.pop("weight", None)
    if weight is not None:
        weight = jnp.asarray(weight)

    if name == "BCEWithLogitsLoss":
        loss = bce_with_logits_loss
    elif name == "BCEDiceLoss":
        alpha = loss_config.get("alphs", 1.0)  # sic: reference key name
        beta = loss_config.get("beta", 1.0)
        loss = lambda i, t: bce_dice_loss(i, t, alpha, beta)
    elif name == "CrossEntropyLoss":
        loss = lambda i, t: cross_entropy_loss(i, t)
    elif name == "WeightedCrossEntropyLoss":
        loss = weighted_cross_entropy_loss
    elif name == "PixelWiseCrossEntropyLoss":
        loss = lambda i, t, w: pixel_wise_cross_entropy_loss(
            i, t, w, class_weights=weight
        )
    elif name == "GeneralizedDiceLoss":
        normalization = loss_config.get("normalization", "sigmoid")
        loss = lambda i, t: generalized_dice_loss(i, t, normalization=normalization)
    elif name == "DiceLoss":
        normalization = loss_config.get("normalization", "sigmoid")
        loss = lambda i, t: dice_loss(i, t, weight=weight, normalization=normalization)
    elif name == "MSELoss":
        loss = mse_loss
    elif name == "SmoothL1Loss":
        loss = smooth_l1_loss
    elif name == "L1Loss":
        loss = l1_loss
    elif name == "WeightedSmoothL1Loss":
        loss = lambda i, t: weighted_smooth_l1_loss(
            i,
            t,
            threshold=loss_config["threshold"],
            initial_weight=loss_config["initial_weight"],
            apply_below_threshold=loss_config.get("apply_below_threshold", True),
        )
    else:
        raise RuntimeError(f"Unsupported loss function: '{name}'")

    if not (
        ignore_index is None
        or name in ["CrossEntropyLoss", "WeightedCrossEntropyLoss"]
    ):
        loss = masked_loss(loss, ignore_index)
    if skip_last_target:
        loss = skip_last_target_channel(
            loss, loss_config.get("squeeze_channel", False)
        )
    return loss


def get_loss_fn(settings) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Resolve the `loss_criterion` setting to a (logits, one_hot_targets) ->
    scalar function (reference trainer :124-148 dispatch). CrossEntropyLoss
    consumes argmaxed targets like the reference trainer does (:425-428)."""
    import logging
    import sys

    name = settings.loss_criterion
    if name == "BCEDiceLoss":
        alpha, beta = settings.alpha, settings.beta
        logging.info(
            f"Using combined BCE and Dice loss with weighting of {alpha}*BCE "
            f"and {beta}*Dice"
        )
        return lambda logits, tgt, sample_weights=None: bce_dice_loss(
            logits, tgt, alpha, beta, sample_weights=sample_weights
        )
    if name == "DiceLoss":
        logging.info("Using DiceLoss")
        return lambda logits, tgt, sample_weights=None: dice_loss(
            logits, tgt, normalization="none", sample_weights=sample_weights
        )
    if name == "BCELoss":
        logging.info("Using BCELoss")
        return bce_with_logits_loss
    if name == "CrossEntropyLoss":
        logging.info("Using CrossEntropyLoss")
        return lambda logits, tgt, sample_weights=None: cross_entropy_loss(
            logits, jnp.argmax(tgt, axis=1), sample_weights=sample_weights
        )
    if name == "GeneralizedDiceLoss":
        logging.info("Using GeneralizedDiceLoss")
        return generalized_dice_loss
    logging.error("No loss criterion specified, exiting")
    sys.exit(1)
