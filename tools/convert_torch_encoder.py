#!/usr/bin/env python
"""Convert a torchvision/timm-format encoder state_dict to this framework's
pretrained-weights cache format.

Usage:
    python tools/convert_torch_encoder.py resnet34 /path/to/resnet34.pth \
        [--out-dir $VOLSEG_TPU_WEIGHTS_DIR]

Writes <out-dir>/<encoder_name>.vstpu, a msgpack blob
{"params": ..., "batch_stats": ...} holding the encoder subtree in this
framework's Flax naming. Supported: every encoder in the model registry —
resnet34 / resnet50 / resnext50_32x4d (torchvision naming),
efficientnet-b3 / efficientnet-b4 and timm-resnest50d / timm-resnest101e
(timm naming). Run once on a machine with the torch weights; the trainer
then picks them up whenever `encoder_weights: imagenet` is set.
(tests/test_torch_convert.py::test_pretrained_pipeline_end_to_end drives
this tool for all seven encoders.)
"""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from flax import serialization

from volume_segmantics_tpu.models.torch_convert import convert_encoder_state_dict


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("encoder_name", help="e.g. resnet34")
    parser.add_argument("state_dict_path", help=".pth file with torch weights")
    parser.add_argument(
        "--out-dir",
        default=os.environ.get("VOLSEG_TPU_WEIGHTS_DIR", "."),
    )
    args = parser.parse_args()

    import torch

    sd = torch.load(args.state_dict_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    sd = {k: np.asarray(v) for k, v in sd.items() if hasattr(v, "numpy") or isinstance(v, np.ndarray)}

    # torchvision/timm names have no 'encoder.' prefix; add it for the
    # shared converters.
    sd = {f"encoder.{k}": v for k, v in sd.items()}
    name = args.encoder_name.replace("timm-", "")
    enc_params, enc_stats = convert_encoder_state_dict(sd, name)
    blob = {"params": enc_params, "batch_stats": enc_stats}

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    out_path = out_dir / f"{args.encoder_name}.vstpu"
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(blob))
    n = sum(np.asarray(x).size for x in _leaves(enc_params))
    print(f"Wrote {out_path} ({n} encoder parameters).")


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


if __name__ == "__main__":
    main()
