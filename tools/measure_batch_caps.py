#!/usr/bin/env python
"""Measure per-architecture prediction batch caps on the attached device.

For each architecture (resnet34 encoder, the reference default) and slice
shape, finds the largest batch in {128, 64, 32, 16, 8} whose single-axis
sweep COMPILES AND RUNS without device memory exhaustion, and times it.
The winning caps feed cfg.PRED_BATCH_CAPS (utils/config.py) so first
contact with a VMEM-heavy decoder never pays the compile-fail-retrace
backoff loop.

Usage:  python tools/measure_batch_caps.py [--side 512] [--archs ...]
"""

import argparse
import logging
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

logging.basicConfig(level=logging.WARNING)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", type=int, default=512)
    ap.add_argument(
        "--archs", nargs="+",
        default=["U_Net", "U_Net_Plus_Plus", "FPN", "DeepLabV3",
                 "DeepLabV3_Plus", "MA_Net", "Linknet", "PAN"],
    )
    ap.add_argument("--batches", nargs="+", type=int,
                    default=[128, 64, 32, 16, 8])
    args = ap.parse_args()

    import jax
    from types import SimpleNamespace

    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        VolSeg2dPredictor,
    )
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.utils.base_data_utils import Axis, ModelType

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    # A thin slab with the target slice shape: compile cost scales with the
    # program, VMEM pressure with (batch, H, W) — the slab depth only needs
    # to cover one batch.
    results = {}
    for arch in args.archs:
        struc = {
            "type": ModelType[arch.upper()],
            "encoder_name": "resnet34",
            "encoder_weights": None,
            "in_channels": cfg.MODEL_INPUT_CHANNELS,
            "classes": 2,
        }
        try:
            bundle = create_model_on_device(0, struc)
        except Exception as e:
            print(f"{arch}: model build failed: {e}", file=sys.stderr)
            continue
        with tempfile.TemporaryDirectory() as td:
            ckpt = Path(td) / "m.pytorch"
            save_checkpoint(ckpt, bundle.variables, struc, label_codes={})
            for batch in args.batches:
                settings = SimpleNamespace(
                    clip_data=False, st_dev_factor=2.575, downsample=False,
                    data_hdf5_path="/data", cuda_device=0, one_hot=False,
                    output_probs=False, prediction_batch_size=batch,
                    quality="low", prediction_axis="Z",
                )
                predictor = VolSeg2dPredictor(ckpt, settings)
                # Disable the slab-pipelined upload: it would cap the
                # effective batch at depth/OVERLAP_SLABS and this tool
                # would report a batch that never actually compiled.
                predictor.OVERLAP_MIN_BYTES = 1 << 60
                vol = rng.integers(
                    0, 255, (batch, args.side, args.side)
                ).astype(np.uint8)
                try:
                    t0 = time.perf_counter()
                    predictor._predict_single_axis(
                        vol, output_probs=False, axis=Axis.Z
                    )
                    dt = time.perf_counter() - t0
                    # The predictor's OOM backoff halves batch_size instead
                    # of raising; a shrunken batch means this size failed.
                    if predictor.batch_size != batch:
                        print(
                            f"{arch}: batch {batch} exhausted memory "
                            f"(backed off to {predictor.batch_size})",
                            file=sys.stderr,
                        )
                        continue
                    t0 = time.perf_counter()
                    predictor._predict_single_axis(
                        vol, output_probs=False, axis=Axis.Z
                    )
                    run = time.perf_counter() - t0
                    print(
                        f"{arch}: batch {batch} OK at {args.side}^2 "
                        f"(compile+run {dt:.1f}s, run {run:.2f}s, "
                        f"{batch / run:.0f} slices/s)",
                        file=sys.stderr,
                    )
                    results[arch] = batch
                    break
                except Exception as e:
                    msg = str(e).splitlines()[0][:120]
                    print(f"{arch}: batch {batch} failed: {msg}",
                          file=sys.stderr)
        del bundle

    print("\nMeasured caps (feed into cfg.PRED_BATCH_CAPS for entries below "
          f"BIG_PRED_BATCH={cfg.BIG_PRED_BATCH}):")
    for arch, batch in results.items():
        print(f"  {ModelType[arch.upper()].name!r}: {batch},")


if __name__ == "__main__":
    main()
