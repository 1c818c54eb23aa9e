"""ImageNet-pretrained encoder weight loading.

The reference relies on smp's ImageNet-pretrained encoders
(reference README.md:11, volseg-settings/2d_model_train_settings.yaml
`encoder_weights: imagenet`). This environment has no network egress, so
pretrained weights are loaded from a local cache of converted files:
`$VOLSEG_TPU_WEIGHTS_DIR/<encoder_name>.vstpu`, each a msgpack blob
{"params": ..., "batch_stats": ...} holding the encoder subtree in this
framework's naming (produced by tools/convert_torch_encoder.py). When the
cache is missing the model falls back to random init with a warning, which
preserves behaviour-with-degraded-accuracy rather than failing.
"""

import logging
import os
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np
from flax import serialization

WEIGHTS_DIR_ENV = "VOLSEG_TPU_WEIGHTS_DIR"


def _weights_path(encoder_name: str) -> Optional[Path]:
    root = os.environ.get(WEIGHTS_DIR_ENV)
    if not root:
        return None
    path = Path(root) / f"{encoder_name}.vstpu"
    return path if path.exists() else None


def pretrained_weights_available(encoder_name: str) -> bool:
    """True when a converted ImageNet weight file for `encoder_name` exists
    in the $VOLSEG_TPU_WEIGHTS_DIR cache (cheap: no model build, no load)."""
    return _weights_path(encoder_name) is not None


def _adapt_first_conv(kernel: np.ndarray, in_channels: int) -> np.ndarray:
    """Adapt an HWIO kernel pretrained on 3-channel input to `in_channels`
    by summing over the input-channel axis (the smp patch_first_conv
    strategy for grayscale)."""
    if kernel.shape[2] == in_channels:
        return kernel
    if in_channels == 1:
        return kernel.sum(axis=2, keepdims=True)
    # Tile and rescale for other channel counts
    reps = int(np.ceil(in_channels / kernel.shape[2]))
    tiled = np.tile(kernel, (1, 1, reps, 1))[:, :, :in_channels, :]
    return tiled * (kernel.shape[2] / in_channels)


def _first_conv_path(params: Dict[str, Any]):
    """Locate the first convolution kernel inside an encoder params tree."""
    for name in ("stem_conv", "conv_stem", "stem_conv1"):
        node = params.get(name)
        if node is None:
            continue
        if "conv" in node and "kernel" in node["conv"]:
            return (name, "conv", "kernel")
        if "kernel" in node:
            return (name, "kernel")
    return None


def load_pretrained_encoder(
    variables: Dict[str, Any], encoder_name: str, in_channels: int
) -> Dict[str, Any]:
    """Merge cached pretrained encoder weights into initialised variables.
    Returns variables unchanged (with a warning) when no cache is found."""
    path = _weights_path(encoder_name)
    if path is None:
        logging.warning(
            f"No pretrained weights for encoder '{encoder_name}' found in "
            f"${WEIGHTS_DIR_ENV}; using random initialisation. Convert torch "
            "weights with tools/convert_torch_encoder.py to enable them."
        )
        return variables, False
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    enc_params = blob["params"]
    enc_stats = blob.get("batch_stats", {})

    fc = _first_conv_path(enc_params)
    if fc is not None:
        node = enc_params
        for p in fc[:-1]:
            node = node[p]
        node[fc[-1]] = _adapt_first_conv(np.asarray(node[fc[-1]]), in_channels)

    merged = dict(variables)
    merged["params"] = dict(variables["params"])
    merged["params"]["encoder"] = serialization.from_state_dict(
        variables["params"]["encoder"], enc_params
    )
    if enc_stats and "batch_stats" in variables:
        merged["batch_stats"] = dict(variables["batch_stats"])
        merged["batch_stats"]["encoder"] = serialization.from_state_dict(
            variables["batch_stats"]["encoder"], enc_stats
        )
    logging.info(f"Loaded pretrained '{encoder_name}' encoder weights from {path}.")
    return merged, True
