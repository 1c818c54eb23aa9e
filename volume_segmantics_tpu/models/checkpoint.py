"""Self-describing single-file checkpoints (msgpack) + torch interop.

The checkpoint is the model-exchange format, carrying the same five keys the
reference saves via torch.save (reference utilities/early_stopping.py:50-63):
model_state_dict, model_struc_dict, optimizer_state_dict, loss_val,
label_codes — so a file fully describes how to rebuild the model
(reference model/model_2d.py:42-57 load contract).

Native format: a flax msgpack blob with a leading magic header. Files
written by the PyTorch reference (zip archives) are detected and converted
on load when the torch CPU wheel is available.
"""

import logging
import zipfile
from pathlib import Path
from typing import Any, Dict

import numpy as np
from flax import serialization

from volume_segmantics_tpu.utils.base_data_utils import ModelType

MAGIC = b"VSTPU1\x00\x00"


def _enum_to_str(struc: dict) -> dict:
    out = dict(struc)
    t = out.get("type")
    if isinstance(t, ModelType):
        out["type"] = t.name
    return out


def _str_to_enum(struc: dict) -> dict:
    out = dict(struc)
    t = out.get("type")
    if isinstance(t, str):
        out["type"] = ModelType[t]
    return out


def save_checkpoint(
    path,
    model_state: Dict[str, Any],
    model_struc_dict: dict,
    optimizer_state: Any = None,
    loss_val: float = float("inf"),
    label_codes: Any = None,
    extra: Any = None,
) -> None:
    """Write a single-file checkpoint. `model_state` is
    {"params": ..., "batch_stats": ...} of numpy/jax arrays. `extra` carries
    optional training-resume state (epoch counters etc.)."""
    import jax

    to_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
    blob = {
        "model_state_dict": to_np(serialization.to_state_dict(model_state)),
        "model_struc_dict": _enum_to_str(model_struc_dict),
        "optimizer_state_dict": (
            to_np(serialization.to_state_dict(optimizer_state))
            if optimizer_state is not None
            else {}
        ),
        "loss_val": float(loss_val),
        "label_codes": label_codes if label_codes is not None else {},
    }
    if isinstance(label_codes, dict) and any(
        not isinstance(k, str) for k in label_codes
    ):
        # msgpack (strict_map_key) rejects non-string map keys at LOAD time;
        # fail now with an actionable message instead of corrupting later.
        raise ValueError(
            "label_codes dict keys must be strings for the msgpack "
            "checkpoint format (e.g. {'0': 'label_val_0'})."
        )
    if extra is not None:
        blob["extra"] = extra
    data = serialization.msgpack_serialize(blob)
    path = Path(path)
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(data)
    logging.info(f"Saved checkpoint to {path}.")


def is_native_checkpoint(path) -> bool:
    with open(path, "rb") as f:
        return f.read(len(MAGIC)) == MAGIC


def load_checkpoint(path) -> Dict[str, Any]:
    """Load a checkpoint dict. Dispatches on format: native msgpack or a
    torch-saved reference checkpoint (converted via torch_convert)."""
    path = Path(path)
    if is_native_checkpoint(path):
        with open(path, "rb") as f:
            f.read(len(MAGIC))
            blob = serialization.msgpack_restore(f.read())
        blob["model_struc_dict"] = _str_to_enum(blob["model_struc_dict"])
        return blob
    if zipfile.is_zipfile(path):
        from volume_segmantics_tpu.models.torch_convert import (
            load_torch_checkpoint,
        )

        logging.info(f"{path} looks like a PyTorch checkpoint; converting.")
        return load_torch_checkpoint(path)
    raise ValueError(f"Unrecognized checkpoint format: {path}")
