"""Device-side image resampling primitives (pure JAX, jit/vmap friendly).

These power the on-device augmentation pipeline: every geometric transform
(crop-resize, flips/rotations, elastic/grid/optical distortion) is expressed
as a source-coordinate field and realised with a single bilinear (image) or
nearest (mask) gather. This replaces the reference's host-side
albumentations/OpenCV remap calls (reference data/augmentations.py:12-110)
with one fused XLA gather per sample.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def reflect101_index(idx: jnp.ndarray, size: int) -> jnp.ndarray:
    """Map (possibly out-of-range) integer indices into [0, size) using
    OpenCV BORDER_REFLECT_101 semantics (edge pixel not repeated):
    -1 -> 1, size -> size - 2."""
    if size == 1:
        return jnp.zeros_like(idx)
    period = 2 * (size - 1)
    idx = jnp.abs(idx)
    idx = idx % period
    return jnp.where(idx >= size, period - idx, idx)


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` (H, W) at float `coords` (2, H', W') = (y, x) source
    positions, with reflect-101 borders. Returns (H', W') in img dtype
    promoted to float32."""
    h, w = img.shape
    y, x = coords[0], coords[1]
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    wy = (y - y0).astype(jnp.float32)
    wx = (x - x0).astype(jnp.float32)
    y0r = reflect101_index(y0, h)
    y1r = reflect101_index(y0 + 1, h)
    x0r = reflect101_index(x0, w)
    x1r = reflect101_index(x0 + 1, w)
    # One flat 1-D gather for all four taps: faster on TPU than 2-D
    # advanced indexing or four separate takes.
    flat = img.astype(jnp.float32).reshape(-1)
    idx = jnp.stack(
        [y0r * w + x0r, y0r * w + x1r, y1r * w + x0r, y1r * w + x1r]
    )
    v = jnp.take(flat, idx)
    top = v[0] * (1 - wx) + v[1] * wx
    bot = v[2] * (1 - wx) + v[3] * wx
    return top * (1 - wy) + bot * wy


def warp_pair_u8(img_u8: jnp.ndarray, mask_u8: jnp.ndarray,
                 coords: jnp.ndarray):
    """Bilinear-sample a uint8 image and nearest-sample its uint8 label mask
    at the same float `coords` (2, H', W') with ONE 4-tap gather.

    Values are packed as img*256 + mask into int32 so both arrays ride the
    same gather (the random-access gather is the augmentation pipeline's
    dominant cost on TPU — ~40 ms/batch of the 64 ms train step — and this
    trims its element count by the mask's fifth tap). The nearest-neighbour
    mask pick selects among the four bilinear taps by the interpolation
    fractions, which equals rounding except exactly at frac = 0.5 (where
    jnp.round's half-to-even may differ — immaterial for augmentation).

    Returns (img float32 in [0, 1], mask uint8)."""
    h, w = img_u8.shape
    packed = (img_u8.astype(jnp.int32) << 8) | mask_u8.astype(jnp.int32)
    y, x = coords[0], coords[1]
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    wy = (y - y0).astype(jnp.float32)
    wx = (x - x0).astype(jnp.float32)
    y0r = reflect101_index(y0, h)
    y1r = reflect101_index(y0 + 1, h)
    x0r = reflect101_index(x0, w)
    x1r = reflect101_index(x0 + 1, w)
    flat = packed.reshape(-1)
    idx = jnp.stack(
        [y0r * w + x0r, y0r * w + x1r, y1r * w + x0r, y1r * w + x1r]
    )
    v = jnp.take(flat, idx)  # (4, H', W') int32
    img_taps = (v >> 8).astype(jnp.float32)
    top = img_taps[0] * (1 - wx) + img_taps[1] * wx
    bot = img_taps[2] * (1 - wx) + img_taps[3] * wx
    img_out = (top * (1 - wy) + bot * wy) / 255.0
    mask_taps = (v & 255).astype(jnp.uint8)
    tap = (wy > 0.5).astype(jnp.int32) * 2 + (wx > 0.5).astype(jnp.int32)
    mask_out = jnp.take_along_axis(mask_taps, tap[None], axis=0)[0]
    return img_out, mask_out


def _warp_kernel_body(S: int, R: int, sep_enabled: bool):
    """Pallas TPU kernel: bilinear image + nearest mask warp as one-hot MXU
    matmuls, bit-identical to `warp_pair_u8`. Blocks are R whole output rows
    (P_BLK = R*S pixels).

    TPU's general gather lowering runs at ~70M elements/s — it was ~60% of
    the whole fused train step (115 ms of 190 ms at batch 32/256²,
    measured). Per output block of P_BLK pixels this kernel instead builds
    (S, P_BLK) one-hot row selectors on the VPU and contracts them with the
    image on the MXU: every one-hot row has exactly one 1, so the dot has a
    single nonzero term — no accumulation error. The dots run on the INT8
    MXU path (v5e: 2x the bf16 rate): pixel payloads are shifted to
    [-128, 127], the one-hots are 0/1 int8, and the int32 accumulation is
    exact, so the +128 shift-back reproduces the uint8 taps bit-for-bit.
    All intermediates live in VMEM; the image block stays resident across
    the P-blocks of one sample. Measured 4.2x over the XLA gather
    (147 -> 35 ms for a 32x256² batch on v5e); int8 a further 1.33x over
    the bf16 dots (22.5 -> 16.8 ms for a 128x256² batch).

    SEPARABLE FAST PATH (`sep_enabled`, requires S % 128 == 0 so the
    per-row stores stay lane-aligned): every geometric stage except
    elastic/optical distortion composes to an axis-separable field —
    y_src = f(row), x_src = g(col), possibly with the roles swapped by
    transpose/rot90 (~2/3 of training samples at the reference's p draws).
    For those samples the wrapper ships per-axis tap indices/fractions
    (A/WA per-block rows, B per-sample cols) and the gather collapses to
    two chained tiny int8 dots per tap — (S,R)x(S,S) then (R,S)x(S,S),
    ~100x fewer MACs and ~20x less VPU selector work than the general
    block. The f32 tap blend below follows `warp_pair_u8`'s exact operation
    order (x-lerp then y-lerp, integer taps), so the result stays
    bit-identical. Branch selection is per sample via `pl.when` on a
    prefetched flag, like the fused CLAHE kernel.

    Orientation note: everything is row-major — coordinate vectors ride as
    (1, P_BLK) lane vectors, one-hots as (S, P_BLK) with the source index on
    the SUBLANE axis, and `dot_general` contracts dim 0 of both operands —
    so no in-kernel transposes/relayouts are needed.
    """
    P_BLK = R * S
    WIN_ROWS = 128
    win_enabled = sep_enabled and S > WIN_ROWS
    dn00 = (((0,), (0,)), ((), ()))  # contract dim0 x dim0
    dn10 = (((1,), (0,)), ((), ()))  # contract dim1 x dim0

    def kernel(yx_ref, img_ref, msk_ref, flag_ref, win_ref, a_ref, wa_ref,
               b_ref, out_ref):
        img = img_ref[0]                       # (S, S) int8, payload - 128
        msk = msk_ref[0]
        period = jnp.float32(2 * (S - 1))

        def general(widx, base):
            """General (non-separable) block. `widx` is the candidate
            source-row count — S for the full branch, WIN_ROWS for the
            Y-WINDOWED branch: the wrapper proves this block's reflected y
            taps span < WIN_ROWS rows (true for nearly every elastic /
            optical block — the fields are smooth) and ships the 32-aligned
            window `base`, so the y one-hot construction and the int8 dots
            shrink by S/WIN_ROWS while staying bit-exact (the x side and
            all blend math are untouched)."""
            y = yx_ref[0, 0, 0:1, :]           # (1, P_BLK) f32
            x = yx_ref[0, 0, 1:2, :]
            y0 = jnp.floor(y)
            x0 = jnp.floor(x)
            wy = y - y0
            wx = x - x0

            def refl(v):
                # reflect101_index on exact integer-valued floats
                v = jnp.abs(v)
                v = v - jnp.floor(v / period) * period
                return jnp.where(v >= S, period - v, v)

            y0r = refl(y0).astype(jnp.int32)
            y1r = refl(y0 + 1.0).astype(jnp.int32)
            x0r = refl(x0).astype(jnp.int32)
            x1r = refl(x0 + 1.0).astype(jnp.int32)
            ym = jnp.where(wy > 0.5, y1r, y0r)
            xm = jnp.where(wx > 0.5, x1r, x0r)
            sub = jax.lax.broadcasted_iota(jnp.int32, (S, P_BLK), 0)
            if widx == S:
                sub_y, imgw, mskw = sub, img, msk
            else:
                sub_y = jax.lax.broadcasted_iota(
                    jnp.int32, (widx, P_BLK), 0
                )
                base_al = pl.multiple_of(base, 32)
                imgw = img_ref[0, pl.dslice(base_al, widx), :]
                mskw = msk_ref[0, pl.dslice(base_al, widx), :]
                y0r = y0r - base
                y1r = y1r - base
                ym = ym - base
            oh0 = (y0r == sub_y).astype(jnp.int8)
            oh1 = (y1r == sub_y).astype(jnp.int8)
            ohm = (ym == sub_y).astype(jnp.int8)
            # Each one-hot column sums to 1, so adding 128 undoes the
            # payload shift exactly in int32.
            rows0 = (jax.lax.dot_general(imgw, oh0, dn00,
                                         preferred_element_type=jnp.int32)
                     + 128).astype(jnp.float32)
            rows1 = (jax.lax.dot_general(imgw, oh1, dn00,
                                         preferred_element_type=jnp.int32)
                     + 128).astype(jnp.float32)
            rowsm_i = jax.lax.dot_general(mskw, ohm, dn00,
                                          preferred_element_type=jnp.int32)
            # x0r != x1r always (reflect-101 is injective on consecutive
            # indices), so the two one-hot weight terms are exclusive and a
            # nested select equals the old where(...)+where(...) sum while
            # saving one (S, P_BLK) VPU add pass.
            wsel = jnp.where(x0r == sub, 1.0 - wx,
                             jnp.where(x1r == sub, wx, 0.0))
            top = jnp.sum(rows0 * wsel, axis=0, keepdims=True)
            bot = jnp.sum(rows1 * wsel, axis=0, keepdims=True)
            img_out = top * (1.0 - wy) + bot * wy
            # Mask column pick stays in int32: exactly one selected term per
            # column, so the +128 shift-back moves to the (1, P_BLK) result
            # and the big-array int32->f32 convert disappears.
            mval = (jnp.sum(jnp.where(xm == sub, rowsm_i, 0), axis=0,
                            keepdims=True) + 128).astype(jnp.float32)
            out_ref[0, 0] = jnp.concatenate([img_out, mval], axis=0)

        if not sep_enabled:
            general(S, 0)
            return

        flag = flag_ref[0, 0, 0]
        if win_enabled:
            use_w = win_ref[0, 0, 0, 0]
            pl.when((flag == 0) & (use_w == 0))(lambda: general(S, 0))
            pl.when((flag == 0) & (use_w != 0))(
                lambda: general(WIN_ROWS, win_ref[0, 0, 0, 1])
            )
        else:
            pl.when(flag == 0)(lambda: general(S, 0))

        def sep_taps():
            """Shared one-hot construction for both separable orientations.

            a_* select along the block-varying axis (R entries, this
            block's output rows), b_* along the shared axis (S entries).
            Indices arrive pre-reflected as exact integer-valued f32."""
            ia = jax.lax.broadcasted_iota(jnp.int32, (S, R), 0)
            ib = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)

            def oh(ref_row, iota):
                return (ref_row.astype(jnp.int32) == iota).astype(jnp.int8)

            oh_a0 = oh(a_ref[0, 0, 0:1, :], ia)                   # (S, R)
            oh_a1 = oh(a_ref[0, 0, 1:2, :], ia)
            oh_am = oh(a_ref[0, 0, 2:3, :], ia)
            oh_b0 = oh(b_ref[0, 0:1, :], ib)                      # (S, S)
            oh_b1 = oh(b_ref[0, 1:2, :], ib)
            oh_bm = oh(b_ref[0, 2:3, :], ib)
            wa = wa_ref[0, 0]                                     # (R, 1)
            wb = b_ref[0, 3:4, :]                                 # (1, S)
            return oh_a0, oh_a1, oh_am, oh_b0, oh_b1, oh_bm, wa, wb

        def dot_i8(lhs, rhs, dn):
            return jax.lax.dot_general(
                lhs, rhs, dn, preferred_element_type=jnp.int32
            )

        def store(img_out, mval):
            # Per-row lane-window stores (offsets r*S are 128-aligned for
            # sep-enabled sizes), avoiding an (R, S) -> (1, P_BLK) reshape
            # Mosaic can't do for free.
            for r in range(R):
                out_ref[0, 0, 0:1, r * S:(r + 1) * S] = img_out[r:r + 1, :]
                out_ref[0, 0, 1:2, r * S:(r + 1) * S] = mval[r:r + 1, :]

        @pl.when(flag == 1)
        def _sep_noswap():
            # y_src = f(row) (a side), x_src = g(col) (b side)
            oh_a0, oh_a1, oh_am, oh_b0, oh_b1, oh_bm, wa, wb = sep_taps()
            rows0 = dot_i8(oh_a0, img, dn00).astype(jnp.int8)  # (R, S)
            rows1 = dot_i8(oh_a1, img, dn00).astype(jnp.int8)
            rowsm = dot_i8(oh_am, msk, dn00).astype(jnp.int8)
            t00 = (dot_i8(rows0, oh_b0, dn10) + 128).astype(jnp.float32)
            t01 = (dot_i8(rows0, oh_b1, dn10) + 128).astype(jnp.float32)
            t10 = (dot_i8(rows1, oh_b0, dn10) + 128).astype(jnp.float32)
            t11 = (dot_i8(rows1, oh_b1, dn10) + 128).astype(jnp.float32)
            tm = (dot_i8(rowsm, oh_bm, dn10) + 128).astype(jnp.float32)
            top = t00 * (1.0 - wb) + t01 * wb        # x-lerp, wx = wb
            bot = t10 * (1.0 - wb) + t11 * wb
            store(top * (1.0 - wa) + bot * wa, tm)   # y-lerp, wy = wa

        @pl.when(flag == 2)
        def _sep_swap():
            # y_src = f(col) (b side), x_src = g(row) (a side)
            oh_a0, oh_a1, oh_am, oh_b0, oh_b1, oh_bm, wa, wb = sep_taps()
            cols0 = dot_i8(img, oh_a0, dn10).astype(jnp.int8)  # (S, R)
            cols1 = dot_i8(img, oh_a1, dn10).astype(jnp.int8)
            colsm = dot_i8(msk, oh_am, dn10).astype(jnp.int8)
            s00 = (dot_i8(cols0, oh_b0, dn00) + 128).astype(jnp.float32)
            s01 = (dot_i8(cols0, oh_b1, dn00) + 128).astype(jnp.float32)
            s10 = (dot_i8(cols1, oh_b0, dn00) + 128).astype(jnp.float32)
            s11 = (dot_i8(cols1, oh_b1, dn00) + 128).astype(jnp.float32)
            sm = (dot_i8(colsm, oh_bm, dn00) + 128).astype(jnp.float32)
            top = s00 * (1.0 - wa) + s10 * wa        # x-lerp, wx = wa
            bot = s01 * (1.0 - wa) + s11 * wa
            store(top * (1.0 - wb) + bot * wb, sm)   # y-lerp, wy = wb

    return kernel


def _rows_per_block(S: int) -> int:
    """Largest divisor R of S with R*S <= 4096 pixels per block (4096
    measured ~10% faster than 1024 at 128x256² on v5e — fewer grid steps;
    Mosaic keeps the larger intermediates resident). Whole-row blocks also
    make every 32-aligned size work (the old flat min(4096, S*S) blocking
    required S*S % 4096 == 0, which e.g. S=96 fails)."""
    cap = max(4096 // S, 1)
    for r in range(min(cap, S), 0, -1):
        if S % r == 0:
            return r
    return 1


def _separable_tap_inputs(coords: jnp.ndarray, S: int, R: int):
    """Detect axis-separable coordinate fields and precompute per-axis tap
    indices/fractions for the kernel's fast path.

    A field is separable when y_src depends only on the output row and
    x_src only on the output column (flag 1), or the transposed form
    (flag 2) — true for every composition of crop/flip/rot90/transpose/
    grid-distortion, i.e. all samples without elastic/optical distortion.
    Detection is exact equality against broadcast rows/columns, so a true
    flag IMPLIES the separable math reproduces the full field exactly.

    Returns (flags (n,1,1) int32, A (n,NB,3,R) f32 [a0r,a1r,am rows],
    WA (n,NB,R,1) f32, B (n,4,S) f32 [b0r,b1r,bm,wb rows])."""
    n = coords.shape[0]
    NB = S // R
    c0, c1 = coords[:, 0], coords[:, 1]
    sep1 = jnp.all(c0 == c0[:, :, :1], axis=(1, 2)) & jnp.all(
        c1 == c1[:, :1, :], axis=(1, 2)
    )
    sep2 = jnp.all(c0 == c0[:, :1, :], axis=(1, 2)) & jnp.all(
        c1 == c1[:, :, :1], axis=(1, 2)
    )
    swap = sep2 & ~sep1
    flags = jnp.where(
        sep1 | sep2, jnp.where(swap, 2, 1), 0
    ).astype(jnp.int32)[:, None, None]
    # Per-output-row map (y_src normally, x_src when swapped) and
    # per-output-column map (x_src normally, y_src when swapped).
    a_vals = jnp.where(swap[:, None], c1[:, :, 0], c0[:, :, 0])  # (n, S)
    b_vals = jnp.where(swap[:, None], c0[:, 0, :], c1[:, 0, :])  # (n, S)
    period = jnp.float32(2 * (S - 1))

    def refl(v):
        # Same float reflect-101 as the kernel's general path.
        v = jnp.abs(v)
        v = v - jnp.floor(v / period) * period
        return jnp.where(v >= S, period - v, v)

    def taps(vals):
        lo = jnp.floor(vals)
        frac = vals - lo
        t0 = refl(lo)
        t1 = refl(lo + 1.0)
        tm = jnp.where(frac > 0.5, t1, t0)
        return t0, t1, tm, frac

    a0, a1, am, wa = taps(a_vals)
    b0, b1, bm, wb = taps(b_vals)
    A = jnp.stack([a0, a1, am], 1).reshape(n, 3, NB, R).transpose(0, 2, 1, 3)
    WA = wa.reshape(n, NB, R, 1)
    B = jnp.stack([b0, b1, bm, wb], 1)
    return flags, A, WA, B


def warp_batch_u8_mxu(imgs_u8: jnp.ndarray, msks_u8: jnp.ndarray,
                      coords: jnp.ndarray, interpret: bool = False):
    """Batch warp via the one-hot MXU Pallas kernel: (N, S, S) uint8 images
    + masks and (N, 2, S, S) float source coords -> (images float32 in
    [0, 1], masks uint8). Bit-identical to vmapped `warp_pair_u8`
    (pinned by tests/test_ops.py). Samples whose coordinate field is
    axis-separable (no elastic/optical distortion — ~2/3 at training-time
    p draws) take a ~100x-cheaper two-stage tap path selected per sample
    in-kernel. `interpret=True` runs the kernel in interpreter mode
    (CPU-testable)."""
    n, h, w = imgs_u8.shape
    assert h == w, "square augmentation tiles expected"
    S = h
    R = _rows_per_block(S)
    P_BLK = R * S
    NB = (S * S) // P_BLK
    # Per-row stores in the separable branches need r*S lane offsets
    # 128-aligned; other sizes compile the general branch only.
    sep_enabled = S % 128 == 0
    yx = coords.reshape(n, 2, NB, P_BLK).transpose(0, 2, 1, 3)
    if sep_enabled:
        flags, A, WA, B = _separable_tap_inputs(coords, S, R)
    else:
        flags = jnp.zeros((n, 1, 1), jnp.int32)
        A = jnp.zeros((n, NB, 3, R), jnp.float32)
        WA = jnp.zeros((n, NB, R, 1), jnp.float32)
        B = jnp.zeros((n, 4, S), jnp.float32)
    win_rows = 128
    if sep_enabled and S > win_rows:
        # Per-(sample, block) y-tap window for the kernel's windowed general
        # branch: same f32 reflect math as the kernel, so the bound is
        # exact. base is 32-aligned (sublane-tile-aligned dynamic slices).
        period = jnp.float32(2 * (S - 1))

        def refl(v):
            v = jnp.abs(v)
            v = v - jnp.floor(v / period) * period
            return jnp.where(v >= S, period - v, v)

        y0 = jnp.floor(coords[:, 0])
        t0 = refl(y0)
        t1 = refl(y0 + 1.0)
        lo = jnp.minimum(t0, t1).reshape(n, NB, P_BLK).min(-1)  # (n, NB)
        hi = jnp.maximum(t0, t1).reshape(n, NB, P_BLK).max(-1)
        base = jnp.clip(
            (jnp.floor(lo / 32.0) * 32.0), 0.0, float(S - win_rows)
        )
        usable = (hi - base) <= (win_rows - 1)
        win = jnp.stack(
            [usable.astype(jnp.int32), base.astype(jnp.int32)], axis=-1
        ).reshape(n, NB, 1, 2)
    else:
        win = jnp.zeros((n, NB, 1, 2), jnp.int32)
    kernel = _warp_kernel_body(S, R, sep_enabled)
    out = pl.pallas_call(
        kernel,
        grid=(n, NB),
        in_specs=[
            pl.BlockSpec((1, 1, 2, P_BLK), lambda b, p: (b, p, 0, 0)),
            pl.BlockSpec((1, S, S), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, S, S), lambda b, p: (b, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda b, p: (b, 0, 0)),
            pl.BlockSpec(
                (1, 1, 1, 2), lambda b, p: (b, p, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec((1, 1, 3, R), lambda b, p: (b, p, 0, 0)),
            pl.BlockSpec((1, 1, R, 1), lambda b, p: (b, p, 0, 0)),
            pl.BlockSpec((1, 4, S), lambda b, p: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 2, P_BLK), lambda b, p: (b, p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, NB, 2, P_BLK), jnp.float32),
        interpret=interpret,
    )(
        yx,
        (imgs_u8.astype(jnp.int32) - 128).astype(jnp.int8),
        (msks_u8.astype(jnp.int32) - 128).astype(jnp.int8),
        flags,
        win,
        A,
        WA,
        B,
    )
    img_out = out[:, :, 0, :].reshape(n, h, w) / 255.0
    msk_out = out[:, :, 1, :].reshape(n, h, w).astype(jnp.uint8)
    return img_out, msk_out


def nearest_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbour sampling (for label masks) with reflect-101 borders."""
    h, w = img.shape
    y = jnp.round(coords[0]).astype(jnp.int32)
    x = jnp.round(coords[1]).astype(jnp.int32)
    y = reflect101_index(y, h)
    x = reflect101_index(x, w)
    return jnp.take(img.reshape(-1), y * w + x)


def identity_coords(height: int, width: int) -> jnp.ndarray:
    """(2, H, W) float32 field of output pixel coordinates (y, x)."""
    ys = jnp.arange(height, dtype=jnp.float32)[:, None]
    xs = jnp.arange(width, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(ys, (height, width))
    x = jnp.broadcast_to(xs, (height, width))
    return jnp.stack([y, x])


def gaussian_blur_2d(field: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur of a (H, W) float field, truncated at 4 sigma.
    Used to smooth elastic-transform displacement noise."""
    radius = max(int(4.0 * sigma + 0.5), 1)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    kernel = jnp.exp(-0.5 * (offs / sigma) ** 2)
    kernel = kernel / kernel.sum()
    import jax.lax as lax

    def conv1d(arr, axis):
        k = kernel.reshape((1, 1, -1, 1) if axis == 0 else (1, 1, 1, -1))
        x = arr[None, None, :, :]
        pad = [(radius, radius), (0, 0)] if axis == 0 else [(0, 0), (radius, radius)]
        out = lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding=pad,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return out[0, 0]

    out = conv1d(field, axis=0)
    out = conv1d(out, axis=1)
    return out
