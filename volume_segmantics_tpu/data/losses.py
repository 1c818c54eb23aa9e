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


def compute_per_channel_dice(
    input: jnp.ndarray,
    target: jnp.ndarray,
    epsilon: float = 1e-6,
    weight=None,
) -> jnp.ndarray:
    """Per-channel Dice with the V-Net squared denominator
    (reference pytorch3dunet_losses.py:15-41). `input` must already be a
    probability map."""
    assert input.shape == target.shape, "'input' and 'target' must have the same shape"
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
) -> jnp.ndarray:
    """DiceLoss (reference pytorch3dunet_losses.py:125-135): 1 - mean
    per-channel Dice of the normalized logits."""
    assert normalization in ("sigmoid", "softmax", "none")
    probs = _normalize(input, normalization)
    per_channel = compute_per_channel_dice(probs, target, weight=weight)
    return 1.0 - jnp.mean(per_channel)


def generalized_dice_loss(
    input: jnp.ndarray,
    target: jnp.ndarray,
    normalization: str = "sigmoid",
    epsilon: float = 1e-6,
) -> jnp.ndarray:
    """Generalized Dice Loss with inverse-volume class weighting
    (reference pytorch3dunet_losses.py:138-170)."""
    probs = _normalize(input, normalization)
    assert probs.shape == target.shape
    probs = flatten(probs)
    target = flatten(target).astype(probs.dtype)
    if probs.shape[0] == 1:
        probs = jnp.concatenate((probs, 1 - probs), axis=0)
        target = jnp.concatenate((target, 1 - target), axis=0)
    w_l = target.sum(-1)
    w_l = 1.0 / jnp.clip(w_l * w_l, min=epsilon)
    w_l = jax.lax.stop_gradient(w_l)
    intersect = (probs * target).sum(-1) * w_l
    denominator = jnp.clip(((probs + target).sum(-1) * w_l), min=epsilon)
    dice = 2 * (intersect.sum() / denominator.sum())
    return 1.0 - jnp.mean(dice)


def bce_with_logits_loss(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy on logits (torch nn.BCEWithLogitsLoss
    equivalent, used by reference trainer :136-138)."""
    target = target.astype(input.dtype)
    # log-sum-exp stable form: max(x,0) - x*y + log(1 + exp(-|x|))
    neg_abs = -jnp.abs(input)
    loss = jnp.clip(input, min=0) - input * target + jnp.log1p(jnp.exp(neg_abs))
    return jnp.mean(loss)


def bce_dice_loss(
    input: jnp.ndarray, target: jnp.ndarray, alpha: float, beta: float
) -> jnp.ndarray:
    """alpha * BCE + beta * Dice (reference pytorch3dunet_losses.py:173-184)."""
    return alpha * bce_with_logits_loss(input, target) + beta * dice_loss(
        input, target
    )


def cross_entropy_loss(input: jnp.ndarray, target_indices: jnp.ndarray) -> jnp.ndarray:
    """Mean categorical cross-entropy over the channel axis. `target_indices`
    is an integer class map shaped (N, *spatial) (torch nn.CrossEntropyLoss
    equivalent, used by reference trainer :139-141 with argmaxed targets)."""
    log_probs = jax.nn.log_softmax(input, axis=1)
    onehot = jax.nn.one_hot(target_indices, input.shape[1], axis=1, dtype=log_probs.dtype)
    return -jnp.mean(jnp.sum(onehot * log_probs, axis=1))


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
        return lambda logits, tgt: bce_dice_loss(logits, tgt, alpha, beta)
    if name == "DiceLoss":
        logging.info("Using DiceLoss")
        return lambda logits, tgt: dice_loss(logits, tgt, normalization="none")
    if name == "BCELoss":
        logging.info("Using BCELoss")
        return bce_with_logits_loss
    if name == "CrossEntropyLoss":
        logging.info("Using CrossEntropyLoss")
        return lambda logits, tgt: cross_entropy_loss(logits, jnp.argmax(tgt, axis=1))
    if name == "GeneralizedDiceLoss":
        logging.info("Using GeneralizedDiceLoss")
        return generalized_dice_loss
    logging.error("No loss criterion specified, exiting")
    sys.exit(1)
