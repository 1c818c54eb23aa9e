#!/usr/bin/env python
"""Headline benchmark: HIGH-quality (12-way TTA) prediction of a 256^3
volume with U-Net + ResNet-34 — the BASELINE.md north-star target of
< 10 s wall-clock on one TPU v5e chip.

Prints one JSON line:
{"metric": ..., "value": seconds, "unit": "s", "vs_baseline": 10/seconds}

vs_baseline > 1 means faster than the 10 s target.
"""

import json
import logging
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

logging.basicConfig(level=logging.WARNING)

TARGET_SECONDS = 10.0
VOL_SIDE = 256


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from types import SimpleNamespace

    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        VolSeg2dPredictor,
    )
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    platform = jax.devices()[0].platform
    print(f"# devices: {jax.devices()} (platform={platform})", file=sys.stderr)

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "bench_model.pytorch"
        save_checkpoint(ckpt, bundle.variables, struc, label_codes={})
        settings = SimpleNamespace(
            clip_data=False,
            st_dev_factor=2.575,
            downsample=False,
            data_hdf5_path="/data",
            cuda_device=0,
            one_hot=False,
            output_probs=False,
            quality="high",
            prediction_axis="Z",
        )
        predictor = VolSeg2dPredictor(ckpt, settings)

        rng = np.random.default_rng(0)
        vol = rng.integers(0, 255, (VOL_SIDE, VOL_SIDE, VOL_SIDE)).astype(np.uint8)

        # Warm-up: compile the sweep + merges (cached for the timed run).
        # One retry guards against transient device-tunnel hiccups.
        for attempt in range(2):
            try:
                print("# warm-up (compile)...", file=sys.stderr)
                t0 = time.perf_counter()
                predictor._predict_12_ways_max_probs(vol)
                warm = time.perf_counter() - t0
                print(f"# warm-up took {warm:.2f}s", file=sys.stderr)

                # Best of two timed runs: the device tunnel's
                # latency/bandwidth fluctuates run to run.
                elapsed = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    labels, probs = predictor._predict_12_ways_max_probs(vol)
                    elapsed = min(elapsed, time.perf_counter() - t0)
                break
            except Exception as e:  # pragma: no cover - transient device issue
                if attempt == 1:
                    raise
                print(f"# attempt failed ({e}); retrying in 30s", file=sys.stderr)
                time.sleep(30)
        assert labels.shape == vol.shape and labels.dtype == np.uint8

    print(
        json.dumps(
            {
                "metric": "unet_resnet34_12way_tta_predict_256cube_wallclock",
                "value": round(elapsed, 3),
                "unit": "s",
                "vs_baseline": round(TARGET_SECONDS / elapsed, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
