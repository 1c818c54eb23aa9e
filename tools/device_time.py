"""Tunnel-proof device timing: run N chained iterations of a function as
ONE jitted lax.scan program returning a scalar, and time the scalar's
download. Immune to (a) per-dispatch overhead, (b) block_until_ready not
actually blocking on the axon tunnel (observed 2026-08-20), and (c) a
congested downlink inflating per-iteration downloads — only one tiny
scalar crosses the link per timing window.

Usage: python tools/device_time.py [batch] [stage ...]
Stages: augment coords warp clahe intensity
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volume_segmantics_tpu.ops import augment as aug
from volume_segmantics_tpu.ops.clahe import clahe_batch_fused
from volume_segmantics_tpu.ops.warp import warp_batch_u8_mxu


def scan_time(step, keys, iters=30, windows=3):
    """step(key) -> array; chained via a carried f32 scalar folded into the
    key so iterations serialize. Returns best seconds/iter."""

    @jax.jit
    def run(keys):
        def body(carry, k):
            k = jax.random.fold_in(k, carry.astype(jnp.int32) & 0x7FFFFF)
            out = step(k)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.ravel()[0].astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0), keys)
        return carry

    out = run(keys[:iters])
    _ = float(out)  # compile + one full window
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        _ = float(run(keys[:iters]))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stages = sys.argv[2:] or ["augment", "coords", "warp", "clahe", "intensity"]
    size = 256
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, size, size), dtype=np.uint8))
    msks = jnp.asarray(rng.integers(0, 2, (batch, size, size), dtype=np.uint8))
    imgs_f = imgs.astype(jnp.float32) / 255.0
    keys = jax.random.split(jax.random.PRNGKey(0), 100)

    def coords_of(k):
        ks = jax.random.split(k, batch)
        k_geo, _ = jax.vmap(jax.random.split, out_axes=1)(ks)
        return jax.vmap(lambda kk: aug._geometric_coords(kk, size))(k_geo)

    defs = {
        "augment": lambda k: aug.augment_batch_u8(k, imgs, msks, size),
        "coords": coords_of,
        "warp": lambda k: warp_batch_u8_mxu(imgs, msks, coords_of(k)),
        "clahe": lambda k: clahe_batch_fused(
            imgs_f,
            jax.random.uniform(k, (batch,), minval=1.0, maxval=4.0),
            jax.random.bernoulli(k, 0.5, (batch,)),
        ),
        "intensity": lambda k: jax.vmap(aug._intensity)(
            jax.random.split(k, batch), imgs_f
        ),
    }
    for name in stages:
        dt = scan_time(defs[name], keys)
        print(f"{name:10s} {dt*1e3:8.2f} ms  ({batch/dt:9.1f} slices/s)")


if __name__ == "__main__":
    main()
