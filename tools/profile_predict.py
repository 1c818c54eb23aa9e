#!/usr/bin/env python
"""Break down 12-way TTA prediction wall-clock by stage and slice size.

Times, on the attached device, for 256^3 and 512^3 volumes:
  - single-axis sweep (compute only, device-blocked)
  - fused 3-way program
  - full 12-way (incl. label fetch)
  - label fetch alone
so the 512-cube inefficiency (VERDICT round 1, weak #2) can be located.

Usage: python tools/profile_predict.py [--sizes 256 512] [--batch 32]
"""

import argparse
import sys
import tempfile
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def block(x):
    import jax

    jax.block_until_ready(x)
    return x


def timeit(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        block(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", type=int, default=[256, 512])
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    import jax

    from volume_segmantics_tpu.utils.device import compilation_cache_dir

    jax.config.update("jax_compilation_cache_dir", compilation_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import volume_segmantics_tpu.utils.config as cfg
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
        VolSeg2dPredictor,
    )
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.utils.base_data_utils import Axis, ModelType

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    with tempfile.TemporaryDirectory() as td:
        ckpt = Path(td) / "m.pytorch"
        save_checkpoint(ckpt, bundle.variables, struc, label_codes={})
        settings = SimpleNamespace(
            clip_data=False, st_dev_factor=2.575, downsample=False,
            cuda_device=0, one_hot=False, output_probs=False,
        )
        if args.batch:
            settings.prediction_batch_size = args.batch
        p = VolSeg2dPredictor(ckpt, settings)
        print(f"batch_size={p.batch_size}", file=sys.stderr)
        rng = np.random.default_rng(0)
        for side in args.sizes:
            vol = rng.integers(0, 255, (side,) * 3).astype(np.uint8)
            vol_dev = block(jnp.asarray(vol))
            vox = side ** 3

            # single-axis sweep, device-resident
            block(p._sweep_axis_device(vol_dev, Axis.Z))  # compile
            t_axis = timeit(lambda: p._sweep_axis_device(vol_dev, Axis.Z))

            # fused three-way
            block(p._predict_3_ways_device(vol_dev))  # compile
            t_3way = timeit(lambda: p._predict_3_ways_device(vol_dev))

            # label fetch (packed download)
            labels_d, _ = p._predict_3_ways_device(vol_dev)
            block(labels_d)
            t_fetch = timeit(lambda: p._fetch_labels(labels_d), n=3)

            # full 12-way wall-clock
            p._predict_12_ways_max_probs(vol, output_probs=False)  # warm
            t0 = time.perf_counter()
            p._predict_12_ways_max_probs(vol, output_probs=False)
            t_12 = time.perf_counter() - t0

            print(
                f"size={side}^3  axis={t_axis:.3f}s ({vox/t_axis/1e6:.0f} Mvox/s)  "
                f"3way={t_3way:.3f}s ({3*vox/t_3way/1e6:.0f} Mvox/s-sweep)  "
                f"12way={t_12:.3f}s ({12*vox/t_12/1e6:.0f} Mvox/s-sweep)  "
                f"fetch={t_fetch:.3f}s"
            )


if __name__ == "__main__":
    main()
