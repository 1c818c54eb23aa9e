"""Capture a jax.profiler trace of augment_batch_u8 (and the coords stage
alone) and print the xplane path for tools/xplane_ops.py.

Usage: python tools/trace_augment.py [batch] [coords|full]
"""

import glob
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volume_segmantics_tpu.ops import augment as aug


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    mode = sys.argv[2] if len(sys.argv) > 2 else "full"
    size = 256
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, size, size), dtype=np.uint8))
    msks = jnp.asarray(rng.integers(0, 2, (batch, size, size), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    if mode == "coords":
        def coords_only(k):
            keys = jax.random.split(k, batch)
            k_geo, _ = jax.vmap(jax.random.split, out_axes=1)(keys)
            return jax.vmap(lambda kk: aug._geometric_coords(kk, size))(k_geo)

        fn = jax.jit(coords_only)
        args = (key,)
    else:
        fn = jax.jit(lambda k, i, m: aug.augment_batch_u8(k, i, m, size))
        args = (key, imgs, msks)

    for _ in range(3):
        out = fn(*args)
    jax.block_until_ready(out)
    logdir = tempfile.mkdtemp(prefix=f"trace_aug_{mode}_")
    with jax.profiler.trace(logdir):
        for _ in range(10):
            out = fn(*args)
        jax.block_until_ready(out)
    for p in glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True):
        print(p)


if __name__ == "__main__":
    main()
