"""Host-side volume utilities: enums, file I/O, preprocessing math.

Re-implements (TPU-first, torch-free) the behaviors of the reference
volume_segmantics/utilities/base_data_utils.py:21-356. All array math here is
NumPy on host; device-side equivalents live in `volume_segmantics_tpu.ops`.
"""

import logging
import pathlib
import sys
from enum import Enum
from itertools import chain, product
from types import SimpleNamespace
from typing import Tuple, Union

import h5py as h5
import imageio
import numpy as np

import volume_segmantics_tpu.utils.config as cfg


class Quality(Enum):
    """Prediction quality = number of prediction sweeps merged together.

    LOW: single axis. MEDIUM: 3 axes. HIGH: 12 ways (3 axes x 4 in-plane
    rotations). Mirrors reference base_data_utils.py:21-32.
    """

    LOW = 1
    MEDIUM = 3
    HIGH = 12


class Axis(Enum):
    """Volume axis enum (reference base_data_utils.py:35-39)."""

    Z = 0
    Y = 1
    X = 2
    ALL = 4


class ModelType(Enum):
    """Segmentation architectures (reference base_data_utils.py:42-50)."""

    U_NET = 1
    U_NET_PLUS_PLUS = 2
    FPN = 3
    DEEPLABV3 = 4
    DEEPLABV3_PLUS = 5
    MA_NET = 6
    LINKNET = 7
    PAN = 8


def create_enum_from_setting(setting_str, enum):
    """String -> Enum member with exit(1) on bad values
    (reference base_data_utils.py:53-64)."""
    if isinstance(setting_str, Enum):
        return setting_str
    try:
        return enum[setting_str.upper()]
    except KeyError:
        options = [k.name for k in enum]
        logging.error(
            f"{enum.__name__}: {setting_str} is not valid. Options are {options}."
        )
        sys.exit(1)


def get_prediction_quality(settings: SimpleNamespace) -> Quality:
    return create_enum_from_setting(settings.quality, Quality)


def get_model_type(settings: SimpleNamespace) -> ModelType:
    return create_enum_from_setting(settings.model["type"], ModelType)


def get_training_axis(settings: SimpleNamespace) -> Axis:
    axis_setting = getattr(settings, "training_axes", "All")
    return create_enum_from_setting(axis_setting, Axis)


def get_prediction_axis(settings: SimpleNamespace) -> Axis:
    axis_setting = getattr(settings, "prediction_axis", "Z")
    return create_enum_from_setting(axis_setting, Axis)


def setup_path_if_exists(input_param):
    if isinstance(input_param, str):
        return pathlib.Path(input_param)
    if isinstance(input_param, pathlib.Path):
        return input_param
    return None


def _device_hbm_gb() -> float:
    """Free accelerator memory in GB; falls back to a big-device default.

    TPU replacement for the CUDA free-memory query in reference
    base_data_utils.py:104-122.
    """
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats:
            limit = stats.get("bytes_limit", 0)
            in_use = stats.get("bytes_in_use", 0)
            if limit:
                return (limit - in_use) / 1024**3
    except Exception:  # pragma: no cover - CPU backend has no memory_stats
        pass
    return 16.0


def get_batch_size(settings: SimpleNamespace, prediction: bool = False) -> int:
    """Batch size from settings override or device-memory heuristic.

    Mirrors the config surface of reference base_data_utils.py:104-122 but
    queries TPU HBM (or uses static defaults) instead of CUDA.
    """
    profile_raw = getattr(settings, "performance_profile", None)
    profile = profile_raw or "parity"
    if profile not in cfg.PERFORMANCE_PROFILES:
        raise ValueError(
            f"performance_profile must be one of "
            f"{list(cfg.PERFORMANCE_PROFILES)}, got {profile!r}."
        )
    override_key = "prediction_batch_size" if prediction else "batch_size"
    override = getattr(settings, override_key, None)
    if override:
        logging.info(f"Using batch size {override} from settings.")
        batch_size = int(override)
    else:
        free_mem = _device_hbm_gb()
        if free_mem < cfg.BIG_HBM_THRESHOLD:
            batch_size = cfg.SMALL_BATCH
        elif not prediction:
            # `performance_profile: throughput` trades the reference's
            # GPU-era batch (kept as the parity default so LR schedules
            # match the reference run-for-run) for the measured MXU-optimal
            # batch (cfg.THROUGHPUT_TRAIN_BATCH; 2.6x slices/s on v5e).
            batch_size = (
                cfg.THROUGHPUT_TRAIN_BATCH
                if profile == "throughput"
                else cfg.BIG_TRAIN_BATCH
            )
            if profile_raw is None:
                # Out-of-box users land on the reference-parity batch and
                # never discover the ~3x knob; surface the measured numbers
                # (v5e chip, bench.py train stages) right where the default
                # is chosen.
                logging.info(
                    f"Tip: parity batch {cfg.BIG_TRAIN_BATCH} trains at "
                    f"~{cfg.MEASURED_PARITY_SLICES_PER_S} slices/s on a v5e "
                    f"chip; setting `performance_profile: throughput` "
                    f"(batch {cfg.THROUGHPUT_TRAIN_BATCH}) measured "
                    f"~{cfg.MEASURED_THROUGHPUT_SLICES_PER_S} slices/s "
                    f"(~3x) with the LR re-derived by the LR finder."
                )
        else:
            # Prediction defaults are already throughput-tuned
            # (cfg.BIG_PRED_BATCH + per-arch caps); the profile only
            # affects training.
            batch_size = cfg.BIG_PRED_BATCH
        logging.info(
            f"Free device memory is {free_mem:0.2f} GB. Batch size will be "
            f"{batch_size}."
        )
    # Round up to a multiple of the device count so data-parallel sharding
    # along the batch axis divides evenly.
    try:
        import jax

        n_dev = jax.device_count()
    except Exception:  # pragma: no cover
        n_dev = 1
    if batch_size % n_dev:
        batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
        logging.info(f"Rounded batch size up to {batch_size} for {n_dev} devices.")
    return batch_size


def crop_array_to_dims(array: np.ndarray, yx_dims) -> np.ndarray:
    """Center-crop trailing (H, W) dims of a (..., H, W) array.

    Torch-free equivalent of reference base_data_utils.py:125-129
    (torchvision center_crop): crop offsets use round((dim - crop)/2) which,
    for even differences, matches integer (dim - crop)//2.
    """
    h, w = array.shape[-2], array.shape[-1]
    ch, cw = int(yx_dims[0]), int(yx_dims[1])
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return array[..., top : top + ch, left : left + cw]


def rotate_array_to_axis(array: np.ndarray, axis: Axis = Axis.Z) -> np.ndarray:
    """Swap axes so `axis` becomes the leading (slicing) dim
    (reference base_data_utils.py:132-138). Involutive."""
    if axis == Axis.Z:
        return array
    if axis == Axis.Y:
        return array.swapaxes(0, 1)
    if axis == Axis.X:
        return array.swapaxes(0, 2)


def one_hot_encode_array(input_array: np.ndarray, num_labels: int) -> np.ndarray:
    """Label volume -> (num_labels, *shape) uint8 one-hot
    (reference base_data_utils.py:141-147)."""
    out = np.zeros((num_labels, input_array.size), dtype=np.uint8)
    out[input_array.ravel(), np.arange(input_array.size)] = 1
    out.shape = (num_labels,) + input_array.shape
    return out


def downsample_data(data: np.ndarray, factor: int = 2) -> np.ndarray:
    """2x block-mean downsample with ceil-shaped edges.

    Matches skimage.measure.block_reduce(data, (f,f,f), np.nanmean) as used
    by reference base_data_utils.py:161-163: the array is padded with zeros
    to a multiple of `factor` and the block function is nan-aware mean (so
    padded zeros participate in edge-block means, and NaNs are ignored).
    """
    logging.info(f"Downsampling data by a factor of {factor}.")
    f = factor
    pads = [(0, (-s) % f) for s in data.shape]
    padded = np.pad(data.astype(np.float64, copy=False), pads, constant_values=0)
    z, y, x = padded.shape
    blocks = padded.reshape(z // f, f, y // f, f, x // f, f)
    with np.errstate(invalid="ignore"):
        return np.nanmean(blocks, axis=(1, 3, 5))


def numpy_from_tiff(path) -> np.ndarray:
    """Multipage TIFF -> numpy volume (reference base_data_utils.py:166-176)."""
    return np.asarray(imageio.volread(path))


def _resolve_hdf5_dataset(data_handle, hdf5_path: str = "/data",
                          nexus: bool = False):
    """Locate the volume dataset inside an open HDF5/NXS handle. NXS files
    fall back through the standard Diamond processed-data paths (reference
    base_data_utils.py:179-212)."""
    if not nexus:
        return data_handle[hdf5_path]
    try:
        return data_handle["processed/result/data"]
    except KeyError:
        logging.error(
            "NXS file: Couldn't find data at 'processed/result/data' "
            "trying another path."
        )
        try:
            return data_handle["entry/final_result_tomo/data"]
        except KeyError:
            logging.error(
                "NXS file: Could not find entry at "
                "entry/final_result_tomo/data, exiting!"
            )
            sys.exit(1)


def numpy_from_hdf5(path, hdf5_path: str = "/data", nexus: bool = False):
    """HDF5/NXS file -> (volume, chunking)."""
    with h5.File(path, "r") as data_handle:
        dataset = _resolve_hdf5_dataset(data_handle, hdf5_path, nexus)
        input_data_chunking = dataset.chunks
        return dataset[()], input_data_chunking


class LazyHDF5Volume:
    """Basic-sliceable lazy view over an HDF5 dataset with an optional
    per-chunk transform (clip-to-uint8 / NaN scrub) applied at READ time.

    Duck-types the ndarray subset the streaming predictor uses (shape /
    ndim / size / dtype / __getitem__ with basic slices), so beyond-host-RAM
    volumes flow through the public prediction-manager API without ever
    materialising: preprocessing happens slab-by-slab as the sweeps consume
    input. `max_read_voxels` records the largest single read — tests pin
    peak ingest memory at O(slab) with it."""

    def __init__(self, path, hdf5_path: str = "/data", nexus: bool = False,
                 transform=None, out_dtype=None):
        self._file = h5.File(path, "r")
        self._ds = _resolve_hdf5_dataset(self._file, hdf5_path, nexus)
        self._transform = transform
        self._out_dtype = np.dtype(out_dtype) if out_dtype is not None else None
        self.max_read_voxels = 0
        self.chunks = self._ds.chunks

    @property
    def shape(self):
        return self._ds.shape

    @property
    def ndim(self):
        return self._ds.ndim

    @property
    def size(self):
        return self._ds.size

    @property
    def dtype(self):
        return self._out_dtype if self._out_dtype is not None else self._ds.dtype

    def set_transform(self, transform, out_dtype=None):
        self._transform = transform
        self._out_dtype = np.dtype(out_dtype) if out_dtype is not None else None

    def __getitem__(self, sel):
        chunk = self._ds[sel]
        self.max_read_voxels = max(self.max_read_voxels, int(chunk.size))
        if self._transform is not None:
            chunk = self._transform(chunk)
        return chunk

    def close(self):
        try:
            self._file.close()
        except Exception:
            pass

    def __del__(self):  # pragma: no cover - best-effort cleanup
        self.close()


def streaming_nanmean(vol, slab_slices: int = 64) -> float:
    """Slab-streamed NaN-ignoring mean over any basic-sliceable volume
    (float64 accumulation; numerically the two-pass np.nanmean layout)."""
    total = 0.0
    n_valid = 0
    for start in range(0, vol.shape[0], slab_slices):
        x = np.asarray(vol[start:start + slab_slices], dtype=np.float64)
        nan_mask = np.isnan(x)
        total += float(np.where(nan_mask, 0.0, x).sum())
        n_valid += int(x.size - nan_mask.sum())
    return total / max(n_valid, 1)


def streaming_nanstd(vol, mean: float, slab_slices: int = 64,
                     threads: bool = False) -> float:
    """Slab-streamed NaN-ignoring standard deviation about `mean`.

    With ``threads=True`` the per-slab moments run on a thread pool (numpy
    releases the GIL on large ufuncs); the reduction stays in slab order so
    the result is bit-identical to the serial path."""

    def moments(start):
        x = np.asarray(vol[start:start + slab_slices], dtype=np.float64)
        nan_mask = np.isnan(x)
        d = np.where(nan_mask, mean, x) - mean
        return float((d * d).sum()), int(x.size - nan_mask.sum())

    starts = range(0, vol.shape[0], slab_slices)
    if threads:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor() as pool:
            results = list(pool.map(moments, starts))
    else:
        results = [moments(s) for s in starts]
    sq_sum = sum(r[0] for r in results)
    n_valid = sum(r[1] for r in results)
    return float(np.sqrt(sq_sum / max(n_valid, 1)))


def make_clip_to_uint8_transform(data_mean: float, data_st_dev: float,
                                 st_dev_factor: float):
    """Per-chunk clip/rescale closure with clip_to_uint8's exact per-voxel
    numerics (NaN -> mean, integer promotion to float64, in-place float
    ops) and precomputed global bounds — applied lazily at read time by
    LazyHDF5Volume."""
    lower_bound = data_mean - (data_st_dev * st_dev_factor)
    upper_bound = data_mean + (data_st_dev * st_dev_factor)
    logging.info(f"Lower bound: {lower_bound}, upper bound: {upper_bound}")

    def transform(chunk: np.ndarray) -> np.ndarray:
        x = np.nan_to_num(chunk, copy=True, nan=data_mean)
        if np.issubdtype(x.dtype, np.integer):
            x = x.astype(float)
        x = np.clip(x, lower_bound, upper_bound, out=x)
        x = np.subtract(x, lower_bound, out=x)
        x = np.divide(x, (upper_bound - lower_bound), out=x)
        x = np.clip(x, 0.0, 1.0, out=x)
        x = np.multiply(x, 255, out=x)
        return x.astype(np.uint8)

    return transform


def streaming_downsample_to_memmap(vol, out_path, slab_slices: int = 64):
    """Slab-streamed 2x block-mean downsample into a float64 memmap
    (bounded host memory; lazy-ingest counterpart of downsample_data).

    float64 keeps the stored block means bit-identical to the eager
    `downsample_data` path, so downstream clip_to_uint8 quantisation cannot
    differ by a gray level at rounding boundaries. The memmap is disk-backed
    and 1/8 the source voxel count, so 8-byte elements cost the same bytes
    as a uint8 copy of the source volume."""
    z, y, x = vol.shape
    out_shape = ((z + 1) // 2, (y + 1) // 2, (x + 1) // 2)
    out = np.lib.format.open_memmap(
        out_path, mode="w+", shape=out_shape, dtype=np.float64
    )
    slab_slices += slab_slices % 2  # keep slabs aligned to slice pairs
    for start in range(0, z, slab_slices):
        stop = min(start + slab_slices, z)
        chunk = np.asarray(vol[start:stop])
        out[start // 2: (stop + 1) // 2] = downsample_data(chunk)
    return out


def get_numpy_from_path(
    path: pathlib.Path, internal_path: str = "/data"
) -> Tuple[np.ndarray, Union[Tuple[int, ...], bool, None]]:
    """Dispatch volume loading on file suffix (reference
    base_data_utils.py:215-233)."""
    if path.suffix in cfg.TIFF_SUFFIXES:
        return numpy_from_tiff(path), True
    elif path.suffix in cfg.HDF5_SUFFIXES:
        nexus = path.suffix == ".nxs"
        return numpy_from_hdf5(path, hdf5_path=internal_path, nexus=nexus)


def sequential_labels(unique_labels: np.ndarray) -> bool:
    """True when sorted unique labels increase in steps of one
    (reference base_data_utils.py:236-240)."""
    return not np.where(np.diff(unique_labels) != 1)[0].size


# Above this voxel count clip_to_uint8 switches to the slab-streamed,
# multi-threaded path: the whole-array formulation makes ~6 full passes and
# `astype(float)` promotes integer volumes to float64 (a 2048**3 uint16
# volume would transiently need 68 GB). Slabs bound extra memory to
# O(slab) and threads parallelise the memory-bound ufuncs (numpy releases
# the GIL on large array ops).
CLIP_STREAM_THRESHOLD_VOXELS = 512**3
_CLIP_SLAB_SLICES = 64


def _clip_to_uint8_streaming(
    data: np.ndarray, data_mean: float, st_dev_factor: float
) -> np.ndarray:
    """Slab-streamed clip_to_uint8 for volumes too large for whole-array
    temporaries. Two passes: (1) nan-aware sum of squared deviations for the
    std (the same two-pass moment np.nanstd computes, accumulated in
    float64), (2) per-slab clip/rescale straight into a preallocated uint8
    volume. Slabs are processed by a thread pool."""
    from concurrent.futures import ThreadPoolExecutor

    num_vox = data.size
    slabs = [
        slice(i, min(i + _CLIP_SLAB_SLICES, data.shape[0]))
        for i in range(0, data.shape[0], _CLIP_SLAB_SLICES)
    ]

    data_st_dev = streaming_nanstd(
        data, data_mean, _CLIP_SLAB_SLICES, threads=True
    )

    lower_bound = data_mean - (data_st_dev * st_dev_factor)
    upper_bound = data_mean + (data_st_dev * st_dev_factor)
    # Per-voxel numerics shared with the lazy read-time transform — which
    # itself mirrors the eager clip_to_uint8 op sequence exactly (same
    # dtypes, same op order), so outputs cannot depend on which ingest
    # path a volume took.
    transform = make_clip_to_uint8_transform(
        data_mean, data_st_dev, st_dev_factor
    )
    out = np.empty(data.shape, np.uint8)

    def convert(sl):
        x = data[sl]
        with np.errstate(invalid="ignore"):
            gt_ub = int((x > upper_bound).sum())
            lt_lb = int((x < lower_bound).sum())
        out[sl] = transform(x)
        return gt_ub, lt_lb

    with ThreadPoolExecutor() as pool:
        counts = list(pool.map(convert, slabs))
    gt_ub = sum(c[0] for c in counts)
    lt_lb = sum(c[1] for c in counts)
    logging.info(
        f"Voxels above upper bound: {gt_ub} ({gt_ub / num_vox * 100:.3f}%), "
        f"below lower bound: {lt_lb} ({lt_lb / num_vox * 100:.3f}%)"
    )
    return out


def clip_to_uint8(
    data: np.ndarray, data_mean: float, st_dev_factor: float
) -> np.ndarray:
    """Clip to mean +/- k*sigma, rescale to [0, 255] uint8.

    Numerically mirrors reference base_data_utils.py:243-287 (nan-aware std,
    NaN replacement with the mean, float conversion for integer data).
    Volumes above CLIP_STREAM_THRESHOLD_VOXELS take the slab-streamed
    multi-threaded path (bounded memory; same bounds up to float summation
    order).
    """
    logging.info("Clipping data and converting to uint8.")
    if data.ndim == 3 and data.size > CLIP_STREAM_THRESHOLD_VOXELS:
        return _clip_to_uint8_streaming(data, data_mean, st_dev_factor)
    data_st_dev = np.nanstd(data)
    num_vox = data.size
    lower_bound = data_mean - (data_st_dev * st_dev_factor)
    upper_bound = data_mean + (data_st_dev * st_dev_factor)
    with np.errstate(invalid="ignore"):
        gt_ub = (data > upper_bound).sum()
        lt_lb = (data < lower_bound).sum()
    logging.info(f"Lower bound: {lower_bound}, upper bound: {upper_bound}")
    logging.info(
        f"Voxels above upper bound: {gt_ub} ({gt_ub / num_vox * 100:.3f}%), "
        f"below lower bound: {lt_lb} ({lt_lb / num_vox * 100:.3f}%)"
    )
    if np.isnan(data).any():
        logging.info("Replacing NaN values.")
        data = np.nan_to_num(data, copy=False, nan=data_mean)
    if np.issubdtype(data.dtype, np.integer):
        data = data.astype(float)
    data = np.clip(data, lower_bound, upper_bound, out=data)
    data = np.subtract(data, lower_bound, out=data)
    data = np.divide(data, (upper_bound - lower_bound), out=data)
    data = np.clip(data, 0.0, 1.0, out=data)
    data = np.multiply(data, 255, out=data)
    return data.astype(np.uint8)


def get_num_of_ims(vol_shape: Tuple, axis_enum: Axis) -> int:
    """Number of slices produced for an axis choice
    (reference base_data_utils.py:290-305)."""
    if axis_enum == Axis.ALL:
        return sum(vol_shape)
    return vol_shape[axis_enum.value]


def get_axis_index_pairs(vol_shape: Tuple, axis_enum: Axis):
    """Iterable of (axis_char, index) pairs covering the volume
    (reference base_data_utils.py:308-328)."""
    if axis_enum == Axis.ALL:
        return chain(
            product("z", range(vol_shape[0])),
            product("y", range(vol_shape[1])),
            product("x", range(vol_shape[2])),
        )
    return product(axis_enum.name.lower(), range(vol_shape[axis_enum.value]))


def axis_index_to_slice(vol, axis: str, index: int):
    """(axis, index) -> 2D slice of a 3D volume
    (reference base_data_utils.py:331-348)."""
    if axis == "z":
        return vol[index, :, :]
    if axis == "y":
        return vol[:, index, :]
    if axis == "x":
        return vol[:, :, index]


def save_data_to_hdf5(data, file_path, internal_path="/data", chunking=True):
    """Write gzip-compressed HDF5, preserving input chunking
    (reference base_data_utils.py:351-356).

    Writes slab-wise along axis 0 (bounded to ~256 MB per write) so that a
    host-memmap source — e.g. the streaming predictor's accumulators, which
    may exceed host RAM — never materialises fully through the page cache."""
    logging.info(f"Saving data of shape {data.shape} to {file_path}.")
    if chunking not in (True, None) and len(chunking) != data.ndim:
        # e.g. one-hot output is 4D while input chunking was 3D
        chunking = True
    dtype = np.dtype(data.dtype)
    with h5.File(file_path, "w") as f:
        dset = f.create_dataset(
            internal_path,
            shape=data.shape,
            dtype=dtype,
            chunks=chunking,
            compression=cfg.HDF5_COMPRESSION,
        )
        if data.ndim == 0 or data.shape[0] == 0:
            dset[...] = np.asarray(data)
            return
        row_bytes = int(np.prod(data.shape[1:], dtype=np.int64)) * dtype.itemsize
        slab = max(1, min(data.shape[0], (256 << 20) // max(row_bytes, 1)))
        for start in range(0, data.shape[0], slab):
            stop = min(start + slab, data.shape[0])
            dset[start:stop] = np.ascontiguousarray(data[start:stop])


def img_as_ubyte(data: np.ndarray) -> np.ndarray:
    """Convert an array to uint8 with skimage.img_as_ubyte-compatible scaling
    (needed because the slicer saves PNGs; reference data/slicers.py:127-129).
    """
    if data.dtype == np.uint8:
        return data
    if data.dtype == bool:
        return data.astype(np.uint8) * 255
    if np.issubdtype(data.dtype, np.floating):
        if np.nanmin(data) < -1.0 or np.nanmax(data) > 1.0:
            raise ValueError("Images of type float must be between -1 and 1.")
        # skimage rounds half-to-even (np.rint), not half-up.
        return np.rint(np.clip(data, 0, 1) * 255.0).astype(np.uint8)
    if np.issubdtype(data.dtype, np.unsignedinteger):
        # skimage downcasts unsigned ints by floor-dividing out the extra
        # bits (uint16 -> uint8 is >> 8), NOT by rounded 255/65535 scaling.
        shift = 8 * (data.dtype.itemsize - 1)
        return (data >> shift).astype(np.uint8)
    if np.issubdtype(data.dtype, np.signedinteger):
        # skimage clips negatives then scales the positive (n-1)-bit range
        # down to 8 bits by floor division (int16 -> uint8 is >> 7); int8's
        # 7-bit range UPscales (255/127, rounded) instead.
        shift = 8 * data.dtype.itemsize - 1 - 8
        clipped = np.clip(data, 0, None)
        if shift < 0:
            return np.rint(clipped.astype(np.float64) * (255.0 / 127.0)).astype(
                np.uint8
            )
        return (clipped >> shift).astype(np.uint8)
    raise ValueError(f"Unsupported dtype for image conversion: {data.dtype}")
