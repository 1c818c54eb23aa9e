#!/usr/bin/env python
"""Generate the synthetic "vessels" tutorial dataset.

The reference ships a 256^3 vessel segmentation tutorial
(reference training_data/README.md). This environment cannot redistribute
that data, so this script synthesises a comparable workload: a volume of
random-walk tubular structures over a noisy background, plus its binary
label volume, written as gzip HDF5 at /data.

Usage:
    python tools/make_tutorial_data.py [--side 256] [--out-dir training_data]
"""

import argparse
from pathlib import Path

import numpy as np


def make_vessel_volume(side: int, n_vessels: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    labels = np.zeros((side, side, side), dtype=np.uint8)
    for _ in range(n_vessels):
        pos = rng.uniform(side * 0.1, side * 0.9, 3)
        direction = rng.normal(size=3)
        direction /= np.linalg.norm(direction)
        radius = rng.uniform(2.0, side / 40)
        steps = int(side * 1.5)
        step_len = 2.0
        for _ in range(steps):
            direction += rng.normal(scale=0.15, size=3)
            direction /= np.linalg.norm(direction)
            pos = pos + direction * step_len
            if (pos < radius).any() or (pos > side - radius).any():
                break
            z0, y0, x0 = pos.astype(int)
            r = int(np.ceil(radius)) + 1
            zs, ys, xs = (
                slice(max(z0 - r, 0), min(z0 + r + 1, side)),
                slice(max(y0 - r, 0), min(y0 + r + 1, side)),
                slice(max(x0 - r, 0), min(x0 + r + 1, side)),
            )
            # Local coordinate vectors per sphere: O(r^3) memory instead of
            # three full side^3 int64 meshgrids (~3 GB at side=512).
            zc = np.arange(zs.start, zs.stop)
            yc = np.arange(ys.start, ys.stop)
            xc = np.arange(xs.start, xs.stop)
            d2 = (
                (zc[:, None, None] - pos[0]) ** 2
                + (yc[None, :, None] - pos[1]) ** 2
                + (xc[None, None, :] - pos[2]) ** 2
            )
            labels[zs, ys, xs] |= (d2 <= radius**2).astype(np.uint8)
    # Image: bright vessels on noisy, slowly varying background
    background = rng.normal(90, 18, labels.shape)
    lowfreq = np.cumsum(rng.normal(0, 0.2, side))
    background += lowfreq[:, None, None] + lowfreq[None, :, None]
    vessels = np.where(labels > 0, rng.normal(170, 12, labels.shape), background)
    data = np.clip(vessels, 0, 255).astype(np.uint8)
    return data, labels


def main():
    import h5py

    parser = argparse.ArgumentParser()
    parser.add_argument("--side", type=int, default=256)
    parser.add_argument("--n-vessels", type=int, default=40)
    parser.add_argument("--out-dir", default="training_data")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    data, labels = make_vessel_volume(args.side, args.n_vessels, args.seed)
    for name, arr in [
        (f"vessels_{args.side}cube_DATA.h5", data),
        (f"vessels_{args.side}cube_LABELS.h5", labels),
    ]:
        with h5py.File(out / name, "w") as f:
            f.create_dataset("/data", data=arr, chunks=(32, 32, 32), compression="gzip")
        print(f"wrote {out / name} ({arr.shape}, {np.unique(arr).size} distinct values)")


if __name__ == "__main__":
    main()
