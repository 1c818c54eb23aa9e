"""Pin the on-device augmentation numerics against the exact OpenCV /
albumentations primitives the reference pipeline calls on the host
(reference data/augmentations.py:77-100). cv2 is installed in this
environment even though albumentations is not, so every op that the
reference ultimately delegates to OpenCV is compared against OpenCV itself;
the albumentations-level coordinate constructions (grid distortion,
crop-resize) are compared against faithful numpy re-derivations of the
albumentations source formulas.

Tolerances: cv2's remap/resize interpolate in 5-bit fixed point, so uint8
outputs may differ by 1-2 gray levels; coordinate fields must match to
float32 round-off.
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
cv2 = pytest.importorskip("cv2")

from volume_segmantics_tpu.ops.augment import (
    GRID_DISTORT_LIMIT,
    GRID_NUM_STEPS,
    grid_axis_map,
    grid_cell_count,
    optical_field,
)
from volume_segmantics_tpu.ops.clahe import clahe
from volume_segmantics_tpu.ops.warp import (
    bilinear_sample,
    gaussian_blur_2d,
    identity_coords,
)


def _smooth_test_image(side=256, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (side, side), dtype=np.uint8)
    return cv2.GaussianBlur(img, (0, 0), 3)


# ---------------------------------------------------------------------------
# CLAHE vs cv2.createCLAHE
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clip", [1.0, 1.5, 2.0, 3.3, 4.0])
def test_clahe_matches_cv2(clip):
    """Our MXU-matmul CLAHE reproduces cv2.createCLAHE bit-for-bit up to
    rint ties at the half-level boundary (<= 1 gray level, ~1% of pixels)."""
    img = _smooth_test_image()
    ref = cv2.createCLAHE(clipLimit=clip, tileGridSize=(8, 8)).apply(img)
    ours = np.rint(
        np.asarray(clahe(jnp.asarray(img, jnp.float32) / 255.0, jnp.float32(clip)))
        * 255.0
    )
    diff = np.abs(ours - ref.astype(np.float64))
    assert diff.max() <= 1.0
    assert (diff > 0).mean() < 0.05


def test_clahe_matches_cv2_on_natural_histograms():
    """Skewed histogram (dark image) exercises the clip/redistribute path."""
    img = (_smooth_test_image(seed=3).astype(np.float32) ** 2 / 255.0).astype(
        np.uint8
    )
    ref = cv2.createCLAHE(clipLimit=2.5, tileGridSize=(8, 8)).apply(img)
    ours = np.rint(
        np.asarray(clahe(jnp.asarray(img, jnp.float32) / 255.0, jnp.float32(2.5)))
        * 255.0
    )
    assert np.abs(ours - ref.astype(np.float64)).max() <= 1.0


# ---------------------------------------------------------------------------
# Optical distortion vs cv2.initUndistortRectifyMap
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,dx,dy", [(0.7, 0.0, 0.0), (-0.9, 1.0, -1.0),
                                     (0.3, -1.0, 1.0), (1.0, 0.0, 1.0)])
def test_optical_field_matches_cv2_undistort_map(k, dx, dy):
    """The radial source-coordinate field equals the map cv2 builds for
    camera [[f,0,cx],[0,f,cy],[0,0,1]], dist (k,k,0,0) — exactly how
    albumentations' OpticalDistortion drives cv2.remap.

    `optical_field` implements the OpenCV 4.x convention the reference
    actually runs (integer pixel centres, principal point from the camera
    matrix: xn = (u - cx) / f). The cv2 5.0 installed here changed
    initUndistortRectifyMap(newCameraMatrix=None) to normalise with a
    CENTRED principal point at half-integer pixel centres
    (xn = (u + 0.5 - size/2) / f) while keeping the original camera on the
    distortion output side — verified empirically against hypotheses A-E.
    The two conventions differ only by the input reparametrisation
    u -> u + 0.5 + dx, so evaluating our field on shifted coords must
    reproduce the cv2 map bit-for-bit, pinning the radial model and output
    mapping exactly."""
    size = 128
    f = float(size)
    cx, cy = size * 0.5 + dx, size * 0.5 + dy
    camera = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1]], dtype=np.float32)
    dist = np.array([k, k, 0, 0, 0], dtype=np.float32)
    map_x, map_y = cv2.initUndistortRectifyMap(
        camera, dist, None, None, (size, size), cv2.CV_32FC1
    )
    coords = identity_coords(size, size)
    shifted = jnp.stack([coords[0] + 0.5 + dy, coords[1] + 0.5 + dx])
    ours = np.asarray(optical_field(jnp.float32(k), jnp.float32(dx),
                                    jnp.float32(dy), shifted, size))
    np.testing.assert_allclose(ours[0], map_y, atol=2e-3)
    np.testing.assert_allclose(ours[1], map_x, atol=2e-3)


# ---------------------------------------------------------------------------
# Grid distortion vs the albumentations construction
# ---------------------------------------------------------------------------


def _albumentations_grid_axis(size, factors):
    """albumentations.GridDistortion's per-axis map, verbatim formula:
    consecutive np.linspace segments with per-cell stretch, partial last
    cell pinned to the image edge."""
    step = size // GRID_NUM_STEPS
    xx = np.zeros(size, np.float32)
    prev = 0.0
    for idx, start in enumerate(range(0, size, step)):
        end = start + step
        if end > size:
            end = size
            cur = float(size)
        else:
            cur = prev + step * factors[idx]
        xx[start:end] = np.linspace(prev, cur, end - start)
        prev = cur
    return xx


@pytest.mark.parametrize("size", [128, 130])  # 130: exercises the partial cell
def test_grid_axis_map_matches_albumentations(size):
    rng = np.random.default_rng(7)
    n_cells = grid_cell_count(size)
    factors = 1.0 + rng.uniform(-GRID_DISTORT_LIMIT, GRID_DISTORT_LIMIT, n_cells)
    ref = _albumentations_grid_axis(size, factors)
    v = jnp.arange(size, dtype=jnp.float32)
    ours = np.asarray(grid_axis_map(jnp.asarray(factors, jnp.float32), v, size))
    np.testing.assert_allclose(ours, ref, atol=1e-3)


# ---------------------------------------------------------------------------
# Bilinear warp vs cv2.remap
# ---------------------------------------------------------------------------


def test_bilinear_sample_matches_cv2_remap_reflect101():
    """One fused gather-warp equals cv2.remap(INTER_LINEAR,
    BORDER_REFLECT_101) to fixed-point tolerance, including out-of-range
    taps that exercise the reflected border."""
    size = 128
    img = _smooth_test_image(size, seed=1)
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32)
    map_y = ys + 5.0 * np.sin(xs / 9.0) - 2.0
    map_x = xs + 5.0 * np.cos(ys / 7.0) + 2.0
    ref = cv2.remap(
        img, map_x, map_y, interpolation=cv2.INTER_LINEAR,
        borderMode=cv2.BORDER_REFLECT_101,
    )
    coords = jnp.stack([jnp.asarray(map_y), jnp.asarray(map_x)])
    ours = np.asarray(bilinear_sample(jnp.asarray(img), coords))
    diff = np.abs(ours - ref.astype(np.float64))
    # cv2 quantizes interpolation weights to 1/32; allow 2 levels.
    assert diff.max() <= 2.0
    assert diff.mean() < 0.5


def test_crop_resize_convention_matches_cv2_resize():
    """The RandomSizedCrop source mapping src = (dst + 0.5) * scale - 0.5
    reproduces cv2.resize(INTER_LINEAR) of the cropped window (away from the
    crop border, where albumentations' replicate edge differs from sampling
    the surrounding pixels of the uncropped image)."""
    size = 128
    img = _smooth_test_image(size, seed=2)
    c, top, left = 72, 20, 30
    ref = cv2.resize(img[top:top + c, left:left + c], (size, size),
                     interpolation=cv2.INTER_LINEAR)
    coords = identity_coords(size, size)
    scale = c / size
    y = (coords[0] + 0.5) * scale - 0.5 + top
    x = (coords[1] + 0.5) * scale - 0.5 + left
    ours = np.asarray(bilinear_sample(jnp.asarray(img), jnp.stack([y, x])))
    interior = np.s_[4:-4, 4:-4]
    diff = np.abs(ours[interior] - ref.astype(np.float64)[interior])
    assert diff.max() <= 2.0


# ---------------------------------------------------------------------------
# Gaussian blur (elastic noise smoothing) vs scipy/cv2
# ---------------------------------------------------------------------------


def test_gaussian_blur_matches_cv2_interior():
    """The separable blur that smooths elastic displacement noise matches
    cv2.GaussianBlur away from the border (ours zero-pads, cv2 reflects —
    irrelevant to the noise statistics the field is used for)."""
    sigma = 8.4
    rng = np.random.default_rng(5)
    field = rng.uniform(-1, 1, (128, 128)).astype(np.float32)
    radius = max(int(4.0 * sigma + 0.5), 1)
    ref = cv2.GaussianBlur(
        field, (2 * radius + 1, 2 * radius + 1), sigmaX=sigma, sigmaY=sigma,
        borderType=cv2.BORDER_CONSTANT,
    )
    ours = np.asarray(gaussian_blur_2d(jnp.asarray(field), sigma))
    interior = np.s_[radius:-radius, radius:-radius]
    np.testing.assert_allclose(ours[interior], ref[interior], atol=1e-4)
    # full-frame (both zero-pad via BORDER_CONSTANT): should also agree
    np.testing.assert_allclose(ours, ref, atol=1e-4)
