"""On-device training augmentation pipeline (pure JAX, fused into train step).

Re-creates, parameter-for-parameter, the albumentations stack the reference
applies on the host with 4 dataloader workers (reference
data/augmentations.py:68-101):

    RandomSizedCrop(min_max_height=(S/2, S), (S, S), p=0.5)
    VerticalFlip(p=0.5)
    RandomRotate90(p=0.5)
    Transpose(p=0.5)
    OneOf([ElasticTransform(alpha=120, sigma=8.4, alpha_affine=4.8),
           GridDistortion(num_steps=5, distort_limit=0.3),
           OpticalDistortion(distort_limit=1, shift_limit=0.5)], p=0.5)
    CLAHE(clip_limit=(1, 4), tile_grid=(8, 8), p=0.5)
    OneOf([RandomBrightnessContrast(0.2, 0.2),
           RandomGamma((80, 120))], p=0.5)

TPU-first design: all geometric transforms are composed into a single
source-coordinate field and realised with ONE bilinear gather per image
(nearest for the mask); intensity ops are pointwise; CLAHE runs as a
segment-sum histogram kernel. The whole pipeline is vmapped over the batch
and jitted together with the forward/backward pass, so augmentation runs on
the MXU/VPU instead of host CPUs.
"""

from functools import partial

import jax
import jax.numpy as jnp

from volume_segmantics_tpu.ops.clahe import clahe
from volume_segmantics_tpu.ops.warp import (
    bilinear_sample,
    gaussian_blur_2d,
    identity_coords,
    nearest_sample,
    warp_pair_u8,
)

# Albumentations parameters (reference data/augmentations.py:77-100)
ELASTIC_ALPHA = 120.0
ELASTIC_SIGMA = 120 * 0.07
ELASTIC_ALPHA_AFFINE = 120 * 0.04
GRID_NUM_STEPS = 5
GRID_DISTORT_LIMIT = 0.3
OPTICAL_DISTORT_LIMIT = 1.0
OPTICAL_SHIFT_LIMIT = 0.5
CLAHE_CLIP_RANGE = (1.0, 4.0)
BRIGHTNESS_LIMIT = 0.2
CONTRAST_LIMIT = 0.2
GAMMA_RANGE = (0.8, 1.2)


def _crop_resize_coords(rng, coords, size):
    """RandomSizedCrop source mapping: square crop of side c ~ U[S/2, S]
    at a uniform location, resized back to (S, S) (cv2.resize convention:
    src = (dst + 0.5) * scale - 0.5)."""
    k_side, k_y, k_x = jax.random.split(rng, 3)
    c = jax.random.randint(k_side, (), size // 2, size + 1)
    h_start = jax.random.uniform(k_y, ())
    w_start = jax.random.uniform(k_x, ())
    top = jnp.floor((size - c) * h_start).astype(jnp.float32)
    left = jnp.floor((size - c) * w_start).astype(jnp.float32)
    scale = c.astype(jnp.float32) / size
    y = (coords[0] + 0.5) * scale - 0.5 + top
    x = (coords[1] + 0.5) * scale - 0.5 + left
    return jnp.stack([y, x])


def _rot90_inverse_coords(coords, k, size):
    """Map output coords of np.rot90(img, k) back to input coords."""
    s = float(size - 1)
    y, x = coords[0], coords[1]
    branches = [
        lambda: jnp.stack([y, x]),
        lambda: jnp.stack([x, s - y]),
        lambda: jnp.stack([s - y, s - x]),
        lambda: jnp.stack([s - x, y]),
    ]
    return jax.lax.switch(k, branches)


def _smooth_noise_field(rng, size):
    """Gaussian-smoothed uniform noise, computed at 1/4 resolution and
    bilinearly upsampled. sigma=8.4 wipes out all structure finer than
    ~8 px, so generating at size/4 with sigma/4 produces a statistically
    equivalent field at ~1/16 the blur cost."""
    factor = 4
    small = size // factor
    noise = jax.random.uniform(rng, (small, small), minval=-1.0, maxval=1.0)
    # Blurred white noise has std ~ 1/(2*sigma*sqrt(pi)); at sigma/factor the
    # field comes out `factor`x stronger, so rescale to match the full-res
    # amplitude albumentations would produce.
    blurred = gaussian_blur_2d(noise, ELASTIC_SIGMA / factor) / factor
    # Bilinear upsample as two matmuls against identity-resize weights
    # (exact jax.image.resize semantics, constant-folded): resize's gather
    # lowering is the slow path on TPU, and this runs per sample inside the
    # fused train step.
    w_up = jax.image.resize(
        jnp.eye(small, dtype=jnp.float32), (size, small), method="bilinear"
    )
    return w_up @ blurred @ w_up.T


def _elastic_coords(rng, coords, size):
    """ElasticTransform: smoothed random displacement plus a small random
    affine (reference augmentations.py:90-92 parameters)."""
    k_dx, k_dy, k_aff = jax.random.split(rng, 3)
    dx = _smooth_noise_field(k_dx, size) * ELASTIC_ALPHA
    dy = _smooth_noise_field(k_dy, size) * ELASTIC_ALPHA
    displaced = jnp.stack([coords[0] + dy, coords[1] + dx])

    # Random affine from perturbing 3 control points of a centred square
    # (albumentations' alpha_affine behaviour).
    center = size // 2
    ss = size // 3
    pts1 = jnp.array(
        [
            [center + ss, center + ss],
            [center + ss, center - ss],
            [center - ss, center - ss],
        ],
        dtype=jnp.float32,
    )
    pts2 = pts1 + jax.random.uniform(
        k_aff, (3, 2), minval=-ELASTIC_ALPHA_AFFINE, maxval=ELASTIC_ALPHA_AFFINE
    )
    # Solve the 2x3 affine mapping pts2 -> pts1 (dst -> src form):
    # [y', x'] = [y x 1] @ sol with A = [pts2 | 1]. Closed-form adjugate
    # solve + pointwise application instead of jnp.linalg.solve + a
    # (S*S, 3) @ (3, 2) matmul: the LU custom-call and the reshape/matmul
    # were unfusable barriers splitting the whole coordinate pipeline into
    # ~8 separate full-field HBM passes (profiled 3.4 ms/step at batch
    # 128); pointwise form lets XLA fuse the entire post-distortion chain.
    # Values agree with the LU path to f32 reassociation (~1 ulp).
    a0, a1 = pts2[:, 0], pts2[:, 1]
    det = (
        a0[0] * (a1[1] - a1[2])
        + a0[1] * (a1[2] - a1[0])
        + a0[2] * (a1[0] - a1[1])
    )
    inv_det = 1.0 / det
    # adj(A) for A = [a0 | a1 | 1] (transposed cofactors), rows:
    r0 = jnp.stack([a1[1] - a1[2], a1[2] - a1[0], a1[0] - a1[1]])
    r1 = jnp.stack([a0[2] - a0[1], a0[0] - a0[2], a0[1] - a0[0]])
    r2 = jnp.stack(
        [
            a0[1] * a1[2] - a1[1] * a0[2],
            a1[0] * a0[2] - a0[0] * a1[2],
            a0[0] * a1[1] - a1[0] * a0[1],
        ]
    )
    inv_a = jnp.stack([r0, r1, r2]) * inv_det  # (3, 3) = A^-1
    sol = inv_a @ pts1  # (3, 2) tiny static matmul, constant-folded shape
    y, x = displaced[0], displaced[1]
    mapped_y = y * sol[0, 0] + x * sol[1, 0] + sol[2, 0]
    mapped_x = y * sol[0, 1] + x * sol[1, 1] + sol[2, 1]
    return jnp.stack([mapped_y, mapped_x])


def grid_cell_count(size: int) -> int:
    """Number of grid-distortion cells along one axis (incl. partial cell)."""
    return len(range(0, size, size // GRID_NUM_STEPS))


def grid_axis_map(factors, v, size):
    """Piecewise-linear GridDistortion map evaluated directly on coordinate
    field `v` (albumentations semantics: per-cell slope `factors[i]`
    = 1 + U(-limit, limit), partial last cell pinned to the image edge).
    Direct evaluation over the <= 6 static cells — no table + searchsorted
    interp (slow on TPU). Matches albumentations' np.linspace construction
    exactly (tests/test_cv2_parity.py pins it)."""
    step = size // GRID_NUM_STEPS
    starts = list(range(0, size, step))
    out = jnp.zeros_like(v)
    prev = jnp.float32(0.0)
    for i, start in enumerate(starts):
        end = min(start + step, size)
        n = end - start
        partial_cell = start + step > size
        cur = jnp.float32(size) if partial_cell else prev + step * factors[i]
        slope = (cur - prev) / max(n - 1, 1)
        seg = prev + (v - start) * (slope if n > 1 else 0.0)
        in_cell = (v >= start) & (v < end)
        out = jnp.where(in_cell, seg, out)
        prev = cur
    return out


def _grid_coords(rng, coords, size):
    """GridDistortion of the IDENTITY field (`coords` is identity at the
    distortion stage — asserted implicitly by `_geometric_coords`'s
    composition order). The map is axis-separable, so it is evaluated on
    two (S,) axis vectors and broadcast — bit-identical values to running
    `grid_axis_map` over the full field (same elementwise function on the
    same per-row/per-column values) at 1/S the VPU work."""
    k_y, k_x = jax.random.split(rng)
    n_cells = grid_cell_count(size)

    def draw(k):
        return 1.0 + jax.random.uniform(
            k, (n_cells,), minval=-GRID_DISTORT_LIMIT, maxval=GRID_DISTORT_LIMIT
        )

    axis = jnp.arange(size, dtype=jnp.float32)
    y = grid_axis_map(draw(k_y), axis, size)
    x = grid_axis_map(draw(k_x), axis, size)
    return jnp.stack([
        jnp.broadcast_to(y[:, None], (size, size)),
        jnp.broadcast_to(x[None, :], (size, size)),
    ])


def optical_field(k, dx, dy, coords, size):
    """Radial lens distortion source-coordinate field: the map
    cv2.initUndistortRectifyMap produces for camera matrix
    [[f,0,cx],[0,f,cy],[0,0,1]] (f = size, cx = size/2 + dx, cy = size/2 + dy)
    with distortion coefficients (k, k, 0, 0), as albumentations'
    OpticalDistortion builds it. Pinned against cv2 in
    tests/test_cv2_parity.py."""
    f = jnp.float32(size)
    cx = size * 0.5 + dx
    cy = size * 0.5 + dy
    xn = (coords[1] - cx) / f
    yn = (coords[0] - cy) / f
    r2 = xn * xn + yn * yn
    radial = 1.0 + k * r2 + k * r2 * r2
    x = f * xn * radial + cx
    y = f * yn * radial + cy
    return jnp.stack([y, x])


def _optical_coords(rng, coords, size):
    """OpticalDistortion parameter draw (reference augmentations.py:94:
    distort_limit=1, shift_limit=0.5; albumentations rounds the shift)."""
    k_k, k_dx, k_dy = jax.random.split(rng, 3)
    k = jax.random.uniform(
        k_k, (), minval=-OPTICAL_DISTORT_LIMIT, maxval=OPTICAL_DISTORT_LIMIT
    )
    dx = jnp.round(
        jax.random.uniform(k_dx, (), minval=-OPTICAL_SHIFT_LIMIT, maxval=OPTICAL_SHIFT_LIMIT)
    )
    dy = jnp.round(
        jax.random.uniform(k_dy, (), minval=-OPTICAL_SHIFT_LIMIT, maxval=OPTICAL_SHIFT_LIMIT)
    )
    return optical_field(k, dx, dy, coords, size)


def _distortion_coords(rng, coords, size):
    """OneOf{elastic, grid, optical} drawn PER SAMPLE, matching
    albumentations' per-call OneOf semantics (reference
    augmentations.py:88-97). All three fields are computed and selected with
    nested wheres — under vmap a lax.switch would compute all branches
    anyway, and the fields are pointwise/VPU work that is negligible next to
    the fused forward+backward pass."""
    k_branch, k_e, k_g, k_o = jax.random.split(rng, 4)
    branch = jax.random.randint(k_branch, (), 0, 3)
    elastic = _elastic_coords(k_e, coords, size)
    grid = _grid_coords(k_g, coords, size)
    optical = _optical_coords(k_o, coords, size)
    return jnp.where(
        branch == 0, elastic, jnp.where(branch == 1, grid, optical)
    )


def _post_distortion_affine(keys, size):
    """Compose transpose -> rot90 -> flip -> crop (each p = 0.5, identical
    PRNG draws to the old stagewise form) into ONE value-affine map
    v' = M @ v + b on the (y, x) source-coordinate values.

    Every stage is affine in the coordinate VALUES — transpose swaps the
    planes, rot90/flip are signed permutations plus a (size-1) offset, crop
    is a uniform scale plus offset — so the four stagewise full-field
    `where` passes collapse to 2x2 scalar matrix algebra plus a single
    fused elementwise application in `_geometric_coords` (measured: the
    coords stage was 4.05 ms of the 78 ms b128 train step before this).
    Because each M is a signed permutation-and-scale matrix, the
    axis-separability the warp kernel's fast path detects is preserved.
    Values match the stagewise chain up to one fewer f32 rounding per
    stage (single-stage draws are bit-identical)."""
    s = float(size - 1)
    eye = jnp.eye(2, dtype=jnp.float32)

    # Transpose, p = 0.5 (inverse of transpose is itself: swap (y, x))
    do_transpose = jax.random.bernoulli(keys[3], 0.5)
    M = jnp.where(do_transpose, jnp.array([[0.0, 1.0], [1.0, 0.0]]), eye)
    b = jnp.zeros(2, jnp.float32)

    # RandomRotate90, p = 0.5, factor ~ U{0..3}
    # (value maps of _rot90_inverse_coords' four branches)
    do_rot = jax.random.bernoulli(keys[4], 0.5)
    k_rot = jax.random.randint(keys[5], (), 0, 4)
    rot_ms = jnp.array(
        [
            [[1.0, 0.0], [0.0, 1.0]],
            [[0.0, 1.0], [-1.0, 0.0]],
            [[-1.0, 0.0], [0.0, -1.0]],
            [[0.0, -1.0], [1.0, 0.0]],
        ]
    )
    rot_bs = jnp.array([[0.0, 0.0], [0.0, s], [s, s], [s, 0.0]])
    mr = jnp.where(do_rot, rot_ms[k_rot], eye)
    M = mr @ M
    b = mr @ b + jnp.where(do_rot, rot_bs[k_rot], 0.0)

    # VerticalFlip, p = 0.5 (self-inverse): y' = s - y
    do_flip = jax.random.bernoulli(keys[6], 0.5)
    mf = jnp.where(do_flip, jnp.array([[-1.0, 0.0], [0.0, 1.0]]), eye)
    M = mf @ M
    b = mf @ b + jnp.where(do_flip, jnp.array([s, 0.0]), 0.0)

    # RandomSizedCrop, p = 0.5 (same parameter draws as _crop_resize_coords)
    do_crop = jax.random.bernoulli(keys[7], 0.5)
    k_side, k_y, k_x = jax.random.split(keys[8], 3)
    c = jax.random.randint(k_side, (), size // 2, size + 1)
    h_start = jax.random.uniform(k_y, ())
    w_start = jax.random.uniform(k_x, ())
    top = jnp.floor((size - c) * h_start).astype(jnp.float32)
    left = jnp.floor((size - c) * w_start).astype(jnp.float32)
    scale = c.astype(jnp.float32) / size
    sc = jnp.where(do_crop, scale, 1.0)
    bc = jnp.where(
        do_crop,
        jnp.stack([0.5 * scale - 0.5 + top, 0.5 * scale - 0.5 + left]),
        jnp.zeros(2),
    )
    return sc * M, sc * b + bc


def _geometric_coords(rng, size):
    """Compose every geometric augmentation into one (2, S, S) source field.

    Output -> source composition order is the reverse of the image-space
    pipeline order (crop, flip, rot90, transpose, distortion). The
    distortion stage (elastic / grid / optical, OneOf p = 0.5) produces the
    only genuinely 2-D fields; everything downstream is value-affine and is
    applied as a single composed map (see _post_distortion_affine)."""
    keys = jax.random.split(rng, 10)
    coords = identity_coords(size, size)

    # Apply OneOf distortion with p = 0.5
    do_distort = jax.random.bernoulli(keys[0], 0.5)
    distorted = _distortion_coords(keys[1], coords, size)
    coords = jnp.where(do_distort, distorted, coords)

    M, b = _post_distortion_affine(keys, size)
    y = M[0, 0] * coords[0] + M[0, 1] * coords[1] + b[0]
    x = M[1, 0] * coords[0] + M[1, 1] * coords[1] + b[1]
    return jnp.stack([y, x])


def _intensity_params(rng):
    """Draw every intensity-stage random parameter for one sample. Split out
    of `_intensity` so the batched TPU path (fused-CLAHE kernel) consumes
    the PRNG stream identically to the per-sample path."""
    keys = jax.random.split(rng, 7)
    do_clahe = jax.random.bernoulli(keys[0], 0.5)
    clip = jax.random.uniform(
        keys[1], (), minval=CLAHE_CLIP_RANGE[0], maxval=CLAHE_CLIP_RANGE[1]
    )
    do_bcg = jax.random.bernoulli(keys[2], 0.5)
    branch = jax.random.randint(keys[3], (), 0, 2)
    alpha = 1.0 + jax.random.uniform(
        keys[4], (), minval=-CONTRAST_LIMIT, maxval=CONTRAST_LIMIT
    )
    beta = jax.random.uniform(
        keys[6], (), minval=-BRIGHTNESS_LIMIT, maxval=BRIGHTNESS_LIMIT
    )
    gamma = jax.random.uniform(
        keys[5], (), minval=GAMMA_RANGE[0], maxval=GAMMA_RANGE[1]
    )
    return do_clahe, clip, do_bcg, branch, alpha, beta, gamma


def _apply_bc_gamma(do_bcg, branch, alpha, beta, gamma, img):
    """OneOf{brightness/contrast, gamma} (p=0.5) on a float image in [0, 1]."""
    bc = jnp.clip(img * alpha + beta, 0.0, 1.0)
    gm = jnp.power(jnp.clip(img, 1e-7, 1.0), gamma)
    adjusted = jnp.where(branch == 0, bc, gm)
    return jnp.where(do_bcg, adjusted, img)


def _intensity(rng, img):
    """CLAHE (p=0.5) then OneOf{brightness/contrast, gamma} (p=0.5) on a
    float image in [0, 1]."""
    do_clahe, clip, do_bcg, branch, alpha, beta, gamma = _intensity_params(rng)
    img = jnp.where(do_clahe, clahe(img, clip), img)
    return _apply_bc_gamma(do_bcg, branch, alpha, beta, gamma, img)


def _augment_one(rng, img, mask, size):
    k_geo, k_int = jax.random.split(rng)
    coords = _geometric_coords(k_geo, size)
    img_out = bilinear_sample(img, coords)
    mask_out = nearest_sample(mask, coords)
    img_out = _intensity(k_int, jnp.clip(img_out, 0.0, 1.0))
    return img_out, mask_out


@partial(jax.jit, static_argnames=("size",))
def augment_batch_u8(rng, images_u8, masks_u8, size):
    """Augment a uint8 batch on device (the fused train step's input form).

    Same pipeline as `augment_batch` but the geometric warp runs at batch
    level. On TPU the warp is the one-hot-matmul Pallas kernel
    (ops/warp.py:warp_batch_u8_mxu) — the general-gather lowering it
    replaces was ~60% of the whole fused train step (4.2x slower than the
    kernel, measured on v5e). Elsewhere (CPU tests) it falls back to the
    vmapped 4-tap gather; both paths are bit-identical (tests/test_ops.py).
    Returns (images float32 in [0, 1], masks uint8)."""
    n = images_u8.shape[0]
    keys = jax.random.split(rng, n)
    k_geo, k_int = jax.vmap(jax.random.split, out_axes=1)(keys)
    coords = jax.vmap(lambda k: _geometric_coords(k, size))(k_geo)
    # The Pallas kernel tiles S*S pixels into 1024-wide blocks, which needs
    # size % 32 == 0 (true for the settings default 256 and any
    # IM_SIZE_DIVISOR-aligned size); other sizes take the gather path.
    if jax.default_backend() == "tpu" and size % 32 == 0:
        from volume_segmantics_tpu.ops.clahe import clahe_batch_fused
        from volume_segmantics_tpu.ops.warp import warp_batch_u8_mxu

        imgs_f, msks_out = warp_batch_u8_mxu(images_u8, masks_u8, coords)
        imgs_f = jnp.clip(imgs_f, 0.0, 1.0)
        # Intensity stage with the fused-CLAHE Pallas kernel: identical PRNG
        # draws to `_intensity`, but CLAHE runs batch-level with per-sample
        # skip predication (p=0.5 draw), so skipped samples cost one VMEM
        # copy instead of a computed-then-discarded CLAHE.
        do_clahe, clip, do_bcg, branch, alpha, beta, gamma = jax.vmap(
            _intensity_params
        )(k_int)
        imgs_f = clahe_batch_fused(imgs_f, clip, do_clahe)
        imgs_f = jax.vmap(_apply_bc_gamma)(
            do_bcg, branch, alpha, beta, gamma, imgs_f
        )
    else:
        imgs_f, msks_out = jax.vmap(warp_pair_u8)(images_u8, masks_u8, coords)
        imgs_f = jax.vmap(_intensity)(k_int, jnp.clip(imgs_f, 0.0, 1.0))
    return imgs_f, msks_out


@partial(jax.jit, static_argnames=("size",))
def augment_batch(rng, images, masks, size):
    """Augment a batch on device.

    Args:
        rng: PRNG key.
        images: (N, S, S) float32 in [0, 1].
        masks: (N, S, S) integer labels.
        size: S (static).

    Returns:
        (images, masks) augmented, same shapes/dtypes.

    Every random draw — including the OneOf distortion kind — is per
    sample, exactly like albumentations applied per image on the host.
    """
    n = images.shape[0]
    keys = jax.random.split(rng, n)
    imgs, msks = jax.vmap(
        lambda k, i, m: _augment_one(k, i, m, size)
    )(keys, images, masks)
    return imgs, msks.astype(masks.dtype)
