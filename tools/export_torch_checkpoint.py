#!/usr/bin/env python
"""Convert a native (msgpack) checkpoint to the reference's torch format.

The exported file carries the reference's exact 5-key schema with smp-named
torch tensors (reference utilities/early_stopping.py:50-63), so the
reference CLI and SuRVoS2 (reference README.md:78-80) can consume models
trained with this framework.

Usage: python tools/export_torch_checkpoint.py model.pytorch [out.pytorch]
"""

import argparse
import logging
from pathlib import Path


def main():
    logging.basicConfig(level=logging.INFO)
    parser = argparse.ArgumentParser(
        description="Export a native checkpoint as a reference-format "
        "(torch.save) checkpoint."
    )
    parser.add_argument("src", help="native .pytorch checkpoint (msgpack)")
    parser.add_argument(
        "out",
        nargs="?",
        default=None,
        help="output path (default: <src>_torch.pytorch)",
    )
    args = parser.parse_args()

    from volume_segmantics_tpu.models.torch_export import export_checkpoint_file

    src = Path(args.src)
    out = Path(args.out) if args.out else src.with_name(
        f"{src.stem}_torch{src.suffix}"
    )
    export_checkpoint_file(src, out)
    print(f"Exported {out}")


if __name__ == "__main__":
    main()
