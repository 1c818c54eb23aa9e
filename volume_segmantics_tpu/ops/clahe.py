"""Contrast-Limited Adaptive Histogram Equalization on device (pure JAX).

The reference applies OpenCV CLAHE through albumentations on the host
(reference data/augmentations.py:98, A.CLAHE(p=0.5)). Here the whole
operation — per-tile histograms, clip/redistribute, CDF LUTs, and bilinear
LUT blending — runs inside the jitted train step, vectorized over the batch.

Histograms are built with a segment-sum over (tile_id * 256 + bin) indices,
which XLA lowers to an efficient scatter-add on TPU.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("grid_h", "grid_w"))
def clahe(
    img: jnp.ndarray,
    clip_limit: jnp.ndarray,
    grid_h: int = 8,
    grid_w: int = 8,
) -> jnp.ndarray:
    """CLAHE on a float image in [0, 1] of shape (H, W) with H % grid_h == 0
    and W % grid_w == 0. `clip_limit` is the OpenCV-style relative clip limit
    (a traced scalar, typically drawn from U(1, 4)). Returns float in [0, 1].
    """
    h, w = img.shape
    th, tw = h // grid_h, w // grid_w
    tile_area = th * tw
    n_tiles = grid_h * grid_w
    n_bins = 256

    bins = jnp.clip(jnp.round(img * 255.0), 0, 255).astype(jnp.int32)

    # Per-tile histogram via segment-sum over (tile_id * 256 + bin).
    tile_row = jnp.arange(h, dtype=jnp.int32) // th
    tile_col = jnp.arange(w, dtype=jnp.int32) // tw
    tile_id = tile_row[:, None] * grid_w + tile_col[None, :]
    seg_ids = (tile_id * n_bins + bins).reshape(-1)
    hist = jax.ops.segment_sum(
        jnp.ones((h * w,), dtype=jnp.float32),
        seg_ids,
        num_segments=n_tiles * n_bins,
    ).reshape(n_tiles, n_bins)

    # Clip histogram and redistribute the excess uniformly (standard CLAHE).
    limit = jnp.maximum(clip_limit * tile_area / n_bins, 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)
    clipped = clipped + excess / n_bins

    # Per-tile LUT from the CDF (OpenCV scaling: (n_bins - 1) / tile_area).
    cdf = jnp.cumsum(clipped, axis=1)
    luts = jnp.round(cdf * ((n_bins - 1) / tile_area))
    luts = jnp.clip(luts, 0, 255).reshape(grid_h, grid_w, n_bins)

    # Bilinear blend of the four surrounding tiles' LUT outputs.
    ty = (jnp.arange(h, dtype=jnp.float32) + 0.5) / th - 0.5
    tx = (jnp.arange(w, dtype=jnp.float32) + 0.5) / tw - 0.5
    ty0 = jnp.clip(jnp.floor(ty).astype(jnp.int32), 0, grid_h - 1)
    tx0 = jnp.clip(jnp.floor(tx).astype(jnp.int32), 0, grid_w - 1)
    ty1 = jnp.clip(ty0 + 1, 0, grid_h - 1)
    tx1 = jnp.clip(tx0 + 1, 0, grid_w - 1)
    wy = jnp.clip(ty - jnp.floor(ty), 0.0, 1.0)[:, None]
    wx = jnp.clip(tx - jnp.floor(tx), 0.0, 1.0)[None, :]

    ty0g = jnp.broadcast_to(ty0[:, None], (h, w))
    ty1g = jnp.broadcast_to(ty1[:, None], (h, w))
    tx0g = jnp.broadcast_to(tx0[None, :], (h, w))
    tx1g = jnp.broadcast_to(tx1[None, :], (h, w))

    v00 = luts[ty0g, tx0g, bins]
    v01 = luts[ty0g, tx1g, bins]
    v10 = luts[ty1g, tx0g, bins]
    v11 = luts[ty1g, tx1g, bins]

    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    out = top * (1 - wy) + bot * wy
    return out / 255.0
