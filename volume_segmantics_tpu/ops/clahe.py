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
import numpy as np


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


# ---------------------------------------------------------------------------
# Fully-fused Pallas kernel (TPU fast path for the augmentation pipeline)
# ---------------------------------------------------------------------------
#
# The XLA formulation above materialises a (P, 256) one-hot (32 MB bf16 at
# 256²) and a (P, 64) gather matrix (16 MB f32) in HBM per image — at train
# batch 128 that HBM traffic, not FLOPs, dominated the cost (~15.6 ms of the
# 104 ms fused train step, measured on v5e). The kernel below runs the whole
# operation per sample inside VMEM: histogram, OpenCV clip/redistribute, CDF
# (as an exact lower-triangular f32 matmul instead of cumsum), and the
# bilinear tile blend evaluated band-by-band, so HBM sees only the image in
# and the image out (0.5 MB/sample). It also takes a per-sample `apply`
# flag: albumentations draws CLAHE with p=0.5, and skipped samples cost one
# VMEM copy instead of a full discarded CLAHE (the XLA path computes then
# `where`-discards).
#
# Numerics: counts, clip/redistribute quantities and LUT values are exact
# small integers in float32, identical to the XLA path; only the final
# f32 blend order differs (explicit x-then-y instead of einsum's internal
# order), which is ~1e-7 relative — far inside the ≤1 gray level pin of
# tests/test_cv2_parity.py.


def _clahe_kernel_body(S: int, grid_h: int, grid_w: int):
    th, tw = S // grid_h, S // grid_w
    tile_area = th * tw
    n_tiles = grid_h * grid_w
    n_bins = 256
    band_h = th // 2  # half-tile row bands: tile-row pair fixed per band
    n_bands = S // band_h

    def kernel(img_ref, clip_ref, flag_ref, wx_ref, tril_ref, out_ref,
               luts_ref):
        import jax.experimental.pallas as pl

        @pl.when(flag_ref[0, 0, 0] == 0)
        def _passthrough():
            out_ref[...] = img_ref[...]

        @pl.when(flag_ref[0, 0, 0] != 0)
        def _clahe():
            iota_b = jax.lax.broadcasted_iota(
                jnp.int32, (1, 1, n_bins), 2
            ).astype(jnp.float32)

            def read_bins(row_start, rows):
                """Rows [row_start, row_start+rows) as f32 bin values."""
                block = img_ref[pl.dslice(0, 1), pl.dslice(row_start, rows), :][0]
                return jnp.clip(jnp.round(block * 255.0), 0, 255)

            # --- per-tile histograms -> luts_ref as (grid_h, grid_w, B) ---
            def strip_body(ty, carry):
                strip = read_bins(ty * th, th)  # (th, S)
                cmp = (strip[:, :, None] == iota_b).astype(jnp.bfloat16)
                # counts per column: sum over the th rows (exact: <= th)
                col_counts = jnp.sum(cmp, axis=0)  # (S, B) bf16
                # segment-sum columns into grid_w tiles (exact in f32)
                seg = jnp.sum(
                    col_counts.reshape(grid_w, tw, n_bins).astype(
                        jnp.float32
                    ),
                    axis=1,
                )  # (grid_w, B)
                luts_ref[pl.dslice(ty, 1), :, :] = seg[None]
                return carry

            jax.lax.fori_loop(0, grid_h, strip_body, 0, unroll=False)

            # --- OpenCV clip/redistribute + CDF -> LUTs (in place) ---
            hist = luts_ref[...].reshape(n_tiles, n_bins)
            clip_limit = clip_ref[0, 0, 0]
            limit = jnp.maximum(
                jnp.floor(clip_limit * tile_area / n_bins), 1.0
            )
            clipped = jnp.minimum(hist, limit)
            excess = jnp.sum(hist - clipped, axis=1, keepdims=True)
            redist = jnp.floor(excess / n_bins)
            residual = excess - redist * n_bins
            step = jnp.maximum(
                jnp.floor(n_bins / jnp.maximum(residual, 1.0)), 1.0
            )
            bin_idx = jax.lax.broadcasted_iota(
                jnp.int32, (n_tiles, n_bins), 1
            ).astype(jnp.float32)
            gets_one = (jnp.mod(bin_idx, step) == 0.0) & (
                bin_idx / step < residual
            )
            clipped = clipped + redist + gets_one.astype(jnp.float32)
            cdf = jax.lax.dot_general(
                clipped,
                tril_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # exact integer counts
            luts = jnp.clip(
                jnp.rint(cdf * ((n_bins - 1) / tile_area)), 0, 255
            )
            luts_ref[...] = luts.reshape(grid_h, grid_w, n_bins)

            # --- bilinear tile blend, one half-tile row band at a time.
            # Per band the two relevant tile rows are fixed, so the
            # per-pixel 4-LUT lookup is ONE bf16 one-hot matmul
            # (band_h*S, B) @ (B, 2*grid_w) on the MXU (LUT values <= 255
            # are exact in bf16; each one-hot row has a single 1), followed
            # by a small VPU weight blend. ~15% faster than reducing
            # oh * table on the VPU (measured at b128/256²). ---
            wx = wx_ref[...]  # (S, grid_w) static column weights
            wx2 = jnp.concatenate([wx, wx], axis=1)  # (S, 2*grid_w)

            def band_body(r, carry):
                ty0f = jnp.floor((r * band_h - th // 2) / th).astype(
                    jnp.int32
                )
                ty0 = jnp.clip(ty0f, 0, grid_h - 1)
                ty1 = jnp.clip(ty0f + 1, 0, grid_h - 1)
                l0 = luts_ref[pl.dslice(ty0, 1), :, :][0]  # (grid_w, B)
                l1 = luts_ref[pl.dslice(ty1, 1), :, :][0]
                ll = jnp.concatenate([l0, l1], axis=0)  # (2*grid_w, B)
                band = read_bins(r * band_h, band_h)  # (band_h, S)
                oh = (band[:, :, None] == iota_b).astype(jnp.bfloat16)
                g = jax.lax.dot_general(
                    oh.reshape(band_h * S, n_bins),
                    ll.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ).reshape(band_h, S, 2 * grid_w)  # g[y,x,(t,j)] = L[t,j,bin]
                yy = jax.lax.broadcasted_iota(
                    jnp.int32, (band_h, 1, 1), 0
                ).astype(jnp.float32) + jnp.float32(r * band_h)
                t = (yy - th * 0.5) / th
                frac = t - jnp.floor(t)
                wy2 = jnp.concatenate(
                    [
                        jnp.broadcast_to(1.0 - frac, (band_h, 1, grid_w)),
                        jnp.broadcast_to(frac, (band_h, 1, grid_w)),
                    ],
                    axis=2,
                )  # (band_h, 1, 2*grid_w)
                out = jnp.sum(g * (wy2 * wx2[None]), axis=2)
                out_ref[
                    pl.dslice(0, 1), pl.dslice(r * band_h, band_h), :
                ] = (out / 255.0)[None]
                return carry

            jax.lax.fori_loop(0, n_bands, band_body, 0, unroll=False)

    return kernel


def _clahe_wx(S: int, grid_w: int) -> np.ndarray:
    """Static (S, grid_w) column blend weights (OpenCV semantics: fraction
    before clamping, both neighbour indices clamped independently)."""
    tw = S // grid_w
    t = np.arange(S, dtype=np.float64) / tw - 0.5
    t0f = np.floor(t)
    frac = (t - t0f).astype(np.float32)
    t0 = np.clip(t0f.astype(np.int64), 0, grid_w - 1)
    t1 = np.clip(t0f.astype(np.int64) + 1, 0, grid_w - 1)
    w = np.zeros((S, grid_w), np.float32)
    w[np.arange(S), t0] += 1.0 - frac
    w[np.arange(S), t1] += frac
    return w


def clahe_batch_fused(
    imgs: jnp.ndarray,
    clips: jnp.ndarray,
    apply: jnp.ndarray,
    grid_h: int = 8,
    grid_w: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched CLAHE via the fused Pallas kernel.

    Args:
        imgs: (N, S, S) float32 in [0, 1]; S % 16 == 0 with an 8x8 grid.
        clips: (N,) float32 clip limits (OpenCV-relative, typically U(1, 4)).
        apply: (N,) bool/int — samples with 0 pass through untouched.
        interpret: run in Pallas interpreter mode (CPU-testable).

    Returns (N, S, S) float32; matches `clahe` per sample to f32 blend
    rounding (~1e-7), and `imgs` exactly where apply == 0.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w = imgs.shape
    assert h == w, "square CLAHE tiles expected"
    S = h
    assert S % (2 * grid_h) == 0 and S % grid_w == 0
    kernel = _clahe_kernel_body(S, grid_h, grid_w)
    wx = jnp.asarray(_clahe_wx(S, grid_w))
    tril = jnp.asarray(
        np.tril(np.ones((256, 256), np.float32), k=0).T
    )  # tril.T[b, ob] = 1 where b <= ob
    clips2 = clips.reshape(n, 1, 1).astype(jnp.float32)
    flags2 = apply.reshape(n, 1, 1).astype(jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, S, S), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((S, grid_w), lambda i: (0, 0)),
            pl.BlockSpec((256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, S, S), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, S, S), jnp.float32),
        scratch_shapes=[pltpu.VMEM((grid_h, grid_w, 256), jnp.float32)],
        interpret=interpret,
    )(imgs.astype(jnp.float32), clips2, flags2, wx, tril)
    return out
