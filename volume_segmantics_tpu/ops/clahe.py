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


def _clahe_lut_kernel_body(S: int, grid_h: int, grid_w: int):
    """Per-sample LUT construction in the warp kernel's proven orientation:
    pixels pre-flattened on the LANE axis by XLA (the wrapper passes
    (n, 1, S*S)), bins on the SUBLANE axis, so the one-hot is a plain
    2-D broadcast compare — no 3-D intermediates or in-kernel relayouts.
    Histogram counts accumulate with static lane slices (int8, counts
    <= tile rows); clip/redistribute and the CDF tril matmul keep bins on
    sublanes throughout (dot_general contracts dim 0 of both operands, the
    native MXU form). LUTs are emitted TRANSPOSED as (1, B, n_tiles) so the
    blend kernel can consume them without a transpose."""
    th, tw = S // grid_h, S // grid_w
    tile_area = th * tw
    n_tiles = grid_h * grid_w
    n_bins = 256

    def kernel(img_ref, clip_ref, flag_ref, tril_ref, luts_ref):
        import jax.experimental.pallas as pl

        @pl.when(flag_ref[0, 0, 0] != 0)
        def _build_luts():
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (n_bins, th * S), 0
            ).astype(jnp.float32)

            # --- per-tile histograms -> hist (B, n_tiles), bins on
            # sublanes. Counts are exact small integers throughout: the
            # one-hot is bf16 (Mosaic has no int8 adds), row sums <= th
            # are exact in bf16, tile sums <= tile_area move to f32. ---
            def strip_hist(ty):
                px = img_ref[0, pl.dslice(0, 1), pl.dslice(ty * th * S, th * S)]
                bins = jnp.clip(jnp.round(px * 255.0), 0, 255)  # (1, th*S)
                oh = (bins == sub).astype(jnp.bfloat16)  # (B, th*S)
                acc = oh[:, 0:S]
                for r in range(1, th):
                    acc = acc + oh[:, r * S:(r + 1) * S]
                cols = [
                    jnp.sum(
                        acc[:, j * tw:(j + 1) * tw].astype(jnp.float32),
                        axis=1,
                        keepdims=True,
                    )
                    for j in range(grid_w)
                ]
                return jnp.concatenate(cols, axis=1)  # (B, grid_w)

            hist = jnp.concatenate(
                [strip_hist(ty) for ty in range(grid_h)], axis=1
            )  # (B, n_tiles), tile index = ty * grid_w + j

            # --- OpenCV clip/redistribute + CDF, bins on sublanes ---
            clip_limit = clip_ref[0, 0, 0]
            limit = jnp.maximum(
                jnp.floor(clip_limit * tile_area / n_bins), 1.0
            )
            clipped = jnp.minimum(hist, limit)
            excess = jnp.sum(hist - clipped, axis=0, keepdims=True)  # (1, T)
            redist = jnp.floor(excess / n_bins)
            residual = excess - redist * n_bins
            step = jnp.maximum(
                jnp.floor(n_bins / jnp.maximum(residual, 1.0)), 1.0
            )
            bin_idx = jax.lax.broadcasted_iota(
                jnp.int32, (n_bins, n_tiles), 0
            ).astype(jnp.float32)
            gets_one = (jnp.mod(bin_idx, step) == 0.0) & (
                bin_idx / step < residual
            )
            clipped = clipped + redist + gets_one.astype(jnp.float32)
            # cdf[b, t] = sum_{b' <= b} clipped[b', t]: contract dim 0 of
            # tril.T (the wrapper's tril input) with dim 0 of clipped.
            cdf = jax.lax.dot_general(
                tril_ref[...],
                clipped,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, T) exact integer counts
            luts = jnp.clip(
                jnp.rint(cdf * ((n_bins - 1) / tile_area)), 0, 255
            )
            luts_ref[...] = luts[None]  # (1, B, n_tiles)

    return kernel


def _clahe_blend_kernel_body(S: int, grid_h: int, grid_w: int):
    """Bilinear tile blend, one half-tile row band per grid step (tile-row
    pair fixed per band), pixels on lanes / bins on sublanes like the LUT
    kernel. The per-pixel 4-LUT lookup is ONE int8 dot in the native
    contract-dim0 orientation: lut columns (B, 2*grid_w) x one-hot
    (B, band_h*S) -> (2*grid_w, band_h*S) — LUT values are exact small
    integers shifted to [-128, 127], so the int32 accumulation (one nonzero
    term per column) reproduces them bit-for-bit. The y/x blend weights
    arrive as a static precomputed (n_bands, 2*grid_w, band_h*S) input.
    Grid order is (band, sample) so the weight block stays resident across
    the inner sample sweep."""
    th = S // grid_h
    band_h = th // 2
    n_bins = 256

    del th, band_h  # tile geometry is absorbed into the static weights

    def kernel(img_ref, flag_ref, luts_ref, w_ref, out_ref):
        import jax.experimental.pallas as pl

        @pl.when(flag_ref[0, 0, 0] == 0)
        def _passthrough():
            out_ref[...] = img_ref[...]

        @pl.when(flag_ref[0, 0, 0] != 0)
        def _blend():
            p = w_ref.shape[2]
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (n_bins, p), 0
            ).astype(jnp.float32)
            px = img_ref[0, pl.dslice(0, 1), :]  # (1, band_h*S)
            bins = jnp.clip(jnp.round(px * 255.0), 0, 255)
            oh = (bins == sub).astype(jnp.int8)  # (B, band_h*S)
            lli = (luts_ref[0] - 128.0).astype(jnp.int8)  # (B, n_tiles)
            g = (
                jax.lax.dot_general(
                    lli,
                    oh,
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                + 128
            ).astype(jnp.float32)  # (n_tiles, band_h*S)
            out = jnp.sum(g * w_ref[0], axis=0, keepdims=True)
            out_ref[...] = (out / 255.0)[None]

    return kernel


def _clahe_blend_weights(S: int, grid_h: int, grid_w: int) -> np.ndarray:
    """Static (n_bands, n_tiles, band_h*S) blend weights: W[r, t, p] is
    tile t's bilinear weight for flattened band pixel p = y_in_band * S + x
    (<= 4 nonzero tiles per pixel; zero-weight tiles contribute exactly 0
    to the kernel's sum). Same f32 arithmetic as the in-kernel math it
    replaces (OpenCV convention: fraction before clamping, neighbour tile
    indices clamped independently so edge tiles absorb the full weight)."""
    th, tw = S // grid_h, S // grid_w
    band_h = th // 2
    n_bands = S // band_h
    wx = _clahe_wx(S, grid_w)  # (S, grid_w) f32
    W = np.zeros((n_bands, grid_h * grid_w, band_h * S), np.float32)
    for r in range(n_bands):
        yy = (np.arange(band_h) + r * band_h).astype(np.float32)
        t = (yy - np.float32(th * 0.5)) / np.float32(th)
        frac = (t - np.floor(t)).astype(np.float32)  # (band_h,)
        ty0f = int(np.floor((r * band_h - th // 2) / th))
        ty0 = min(max(ty0f, 0), grid_h - 1)
        ty1 = min(max(ty0f + 1, 0), grid_h - 1)
        wy0 = (np.float32(1.0) - frac)[:, None]  # weight for tile row ty0
        wy1 = frac[:, None]
        for j in range(grid_w):
            W[r, ty0 * grid_w + j] += (wy0 * wx[None, :, j]).reshape(-1)
            W[r, ty1 * grid_w + j] += (wy1 * wx[None, :, j]).reshape(-1)
    return W


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
    th = S // grid_h
    band_h = th // 2
    n_bands = S // band_h
    n_tiles = grid_h * grid_w
    # Pixels ride the LANE axis (warp-kernel orientation): flatten rows
    # outside the kernel so no in-kernel relayouts are needed.
    imgs_flat = imgs.astype(jnp.float32).reshape(n, 1, S * S)
    clips2 = clips.reshape(n, 1, 1).astype(jnp.float32)
    flags2 = apply.reshape(n, 1, 1).astype(jnp.float32)
    tril = jnp.asarray(
        np.tril(np.ones((256, 256), np.float32), k=0).T
    )  # tril.T[b', b] = 1 where b' <= b

    luts = pl.pallas_call(
        _clahe_lut_kernel_body(S, grid_h, grid_w),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, S * S), lambda i: (i, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, 1, 1), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((256, 256), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 256, n_tiles), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, 256, n_tiles), jnp.float32),
        interpret=interpret,
    )(imgs_flat, clips2, flags2, tril)

    W = jnp.asarray(_clahe_blend_weights(S, grid_h, grid_w))
    # Grid order (band, sample): the weight block for a band stays resident
    # across the whole inner sample sweep.
    out = pl.pallas_call(
        _clahe_blend_kernel_body(S, grid_h, grid_w),
        grid=(n_bands, n),
        in_specs=[
            pl.BlockSpec((1, 1, band_h * S), lambda r, i: (i, 0, r)),
            pl.BlockSpec(
                (1, 1, 1), lambda r, i: (i, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 256, n_tiles), lambda r, i: (i, 0, 0)),
            pl.BlockSpec((1, n_tiles, band_h * S), lambda r, i: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, band_h * S), lambda r, i: (i, 0, r)),
        out_shape=jax.ShapeDtypeStruct((n, 1, S * S), jnp.float32),
        interpret=interpret,
    )(imgs_flat, flags2, luts, W)
    return out.reshape(n, S, S)
