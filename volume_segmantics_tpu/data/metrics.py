"""Evaluation metrics as pure JAX functions.

Re-implementations of the metrics the reference vendors from pytorch-3dunet
(reference volume_segmantics/data/pytorch3dunet_metrics.py:17-150), selected
via the `eval_metric` setting (reference trainer :150-161).

Conventions: `input` is a probability tensor (N, C, *spatial); `target` is a
one-hot tensor of the same shape.
"""

from typing import Callable

import jax
import jax.numpy as jnp

from volume_segmantics_tpu.data.losses import compute_per_channel_dice


def dice_coefficient(
    input: jnp.ndarray, target: jnp.ndarray, epsilon: float = 1e-6,
    sample_weights=None,
) -> jnp.ndarray:
    """Mean per-channel Dice (reference pytorch3dunet_metrics.py:17-31).
    `sample_weights` (N,) of 0/1 excludes padded batch entries exactly."""
    return jnp.mean(
        compute_per_channel_dice(
            input, target, epsilon=epsilon, sample_weights=sample_weights
        )
    )


def _binarize_predictions(input: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """One-hot of the argmax channel; threshold at 0.5 for single channel
    (reference pytorch3dunet_metrics.py:89-100). input: (C, *spatial)."""
    if n_classes == 1:
        return (input > 0.5).astype(jnp.uint8)
    max_index = jnp.argmax(input, axis=0)
    return jax.nn.one_hot(max_index, n_classes, axis=0, dtype=jnp.uint8)


def _jaccard_index(prediction: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """IoU of two binary maps (reference pytorch3dunet_metrics.py:102-106)."""
    intersection = jnp.sum((prediction & target).astype(jnp.float32))
    union = jnp.sum((prediction | target).astype(jnp.float32))
    return intersection / jnp.clip(union, min=1e-8)


def mean_iou(
    input: jnp.ndarray, target: jnp.ndarray, sample_weights=None
) -> jnp.ndarray:
    """Per-class binarized IoU averaged over classes then the batch
    (reference pytorch3dunet_metrics.py:34-106). Accepts (N, C, *spatial)
    probabilities and one-hot targets (vectorized over N via vmap rather
    than the reference's python loops). `sample_weights` (N,) of 0/1
    excludes padded batch entries from the batch average."""
    n_classes = input.shape[1]

    def per_sample(probs, tgt):
        binary_pred = _binarize_predictions(probs, n_classes)
        tgt = tgt.astype(jnp.uint8)
        per_channel = jax.vmap(_jaccard_index)(binary_pred, tgt)
        return jnp.mean(per_channel)

    per_sample_iou = jax.vmap(per_sample)(input, target)
    if sample_weights is None:
        return jnp.mean(per_sample_iou)
    w = sample_weights.astype(per_sample_iou.dtype)
    return (per_sample_iou * w).sum() / jnp.clip(w.sum(), min=1e-12)


def psnr(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio (reference pytorch3dunet_metrics.py:109-119).
    Data range follows skimage: max(target) - min(target)."""
    data_range = jnp.max(target) - jnp.min(target)
    err = jnp.mean((input.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10((data_range**2) / err)


def mse(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Mean squared error (reference pytorch3dunet_metrics.py:122-132)."""
    return jnp.mean((input.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def expand_as_one_hot(
    input: jnp.ndarray, C: int, ignore_index=None
) -> jnp.ndarray:
    """(N, *spatial) label map -> (N, C, *spatial) one-hot, keeping
    `ignore_index` values in place (reference
    utilities/pytorch3dunet_utils.py:12-44)."""
    input = input.astype(jnp.int32)
    if ignore_index is not None:
        mask = input == ignore_index
        clean = jnp.where(mask, 0, input)
        result = jax.nn.one_hot(clean, C, axis=1, dtype=jnp.float32)
        mask_exp = jnp.broadcast_to(jnp.expand_dims(mask, 1), result.shape)
        return jnp.where(mask_exp, float(ignore_index), result)
    return jax.nn.one_hot(input, C, axis=1, dtype=jnp.float32)


def convert_to_numpy(*inputs):
    """Device arrays -> numpy ndarrays (reference
    utilities/pytorch3dunet_utils.py:47-62)."""
    import numpy as np

    return (np.asarray(i) for i in inputs)


def get_evaluation_metric(config: dict) -> Callable:
    """Config-driven metric factory mirroring reference
    pytorch3dunet_metrics.py:135-150."""
    assert "eval_metric" in config, "Could not find evaluation metric configuration"
    metric_config = dict(config["eval_metric"])
    name = metric_config.pop("name")
    registry = {
        "DiceCoefficient": dice_coefficient,
        "MeanIoU": mean_iou,
        "PSNR": psnr,
        "MSE": mse,
    }
    if name not in registry:
        raise RuntimeError(f"Unsupported evaluation metric: '{name}'")
    return registry[name]


def get_eval_metric_fn(settings) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Resolve the `eval_metric` setting (reference trainer :150-161)."""
    import logging
    import sys

    if settings.eval_metric == "MeanIoU":
        logging.info("Using MeanIoU")
        return mean_iou
    if settings.eval_metric == "DiceCoefficient":
        logging.info("Using DiceCoefficient")
        return dice_coefficient
    logging.error("No evaluation metric specified, exiting")
    sys.exit(1)
