"""Host-side pre/post-processing transforms (resize, pad) + padding math.

API parity with reference volume_segmantics/data/augmentations.py:12-110.
The random *training* augmentations are NOT here — they run on device inside
the jitted train step (see volume_segmantics_tpu/ops/augment.py). This module
keeps only the deterministic shape-normalisation steps, implemented with
OpenCV to match albumentations' LongestMaxSize / PadIfNeeded behaviour.

Transforms follow the albumentations calling convention:
``sample = t(image=..., mask=...)`` returning a dict, so downstream code and
tests interact with them the same way as with the reference's composes.
"""

import math

import cv2
import numpy as np

import volume_segmantics_tpu.utils.config as cfg


class Compose:
    """Minimal albumentations-style compose over dict-transforms."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, **sample):
        for t in self.transforms:
            sample = t(**sample)
        return sample


class LongestMaxSize:
    """Rescale so the longest side equals `max_size` (both up and down),
    images bilinear / masks nearest (albumentations LongestMaxSize)."""

    def __init__(self, max_size: int):
        self.max_size = max_size

    def __call__(self, image=None, mask=None):
        h, w = image.shape[:2]
        scale = self.max_size / max(h, w)
        out = {"image": image, "mask": mask}
        if scale != 1.0:
            new_h, new_w = int(round(h * scale)), int(round(w * scale))
            out["image"] = cv2.resize(
                image, (new_w, new_h), interpolation=cv2.INTER_LINEAR
            )
            if mask is not None:
                out["mask"] = cv2.resize(
                    mask, (new_w, new_h), interpolation=cv2.INTER_NEAREST
                )
        if mask is None:
            out.pop("mask")
        return out


class PadIfNeeded:
    """Centre-pad up to (min_height, min_width) with reflect-101 borders
    (albumentations PadIfNeeded defaults)."""

    def __init__(self, min_height: int, min_width: int):
        self.min_height = min_height
        self.min_width = min_width

    def _pads(self, h, w):
        pad_h = max(self.min_height - h, 0)
        pad_w = max(self.min_width - w, 0)
        top = pad_h // 2
        bottom = pad_h - top
        left = pad_w // 2
        right = pad_w - left
        return top, bottom, left, right

    def __call__(self, image=None, mask=None):
        h, w = image.shape[:2]
        top, bottom, left, right = self._pads(h, w)
        out = {}
        out["image"] = cv2.copyMakeBorder(
            image, top, bottom, left, right, cv2.BORDER_REFLECT_101
        )
        if mask is not None:
            out["mask"] = cv2.copyMakeBorder(
                mask, top, bottom, left, right, cv2.BORDER_REFLECT_101
            )
        return out


def get_train_preprocess_augs(img_size: int) -> Compose:
    """Pad/resize images to the square training size
    (reference augmentations.py:12-27)."""
    return Compose(
        [
            LongestMaxSize(max_size=img_size),
            PadIfNeeded(min_height=img_size, min_width=img_size),
        ]
    )


def get_padded_dimension(dimension: int) -> int:
    """Round a dimension up to the model-stride divisor
    (reference augmentations.py:30-43)."""
    image_divisor = cfg.IM_SIZE_DIVISOR
    if dimension % image_divisor == 0:
        return dimension
    return (math.floor(dimension / image_divisor) + 1) * image_divisor


def get_pred_preprocess_augs(img_size_y: int, img_size_x: int) -> Compose:
    """Pad prediction slices up to multiples of the stride divisor
    (reference augmentations.py:46-65)."""
    padded_y_dim = get_padded_dimension(img_size_y)
    padded_x_dim = get_padded_dimension(img_size_x)
    return Compose([PadIfNeeded(min_height=padded_y_dim, min_width=padded_x_dim)])


def pad_image_to_dims(image: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Functional centre reflect-101 pad used by the device prediction path."""
    return PadIfNeeded(out_h, out_w)(image=image)["image"]


class ToChannelFirst:
    """Postprocess: HW(C) numpy -> CHW float32 array (the framework's
    counterpart of the reference's ToTensorV2, augmentations.py:104-110)."""

    def __call__(self, image=None, mask=None):
        img = np.asarray(image)
        if img.ndim == 2:
            img = img[None, ...]
        else:
            img = np.moveaxis(img, -1, 0)
        out = {"image": np.ascontiguousarray(img, dtype=np.float32)}
        if mask is not None:
            out["mask"] = np.asarray(mask)
        return out


def get_postprocess_augs() -> Compose:
    """Final transform applied to each sample (reference
    augmentations.py:104-110)."""
    return Compose([ToChannelFirst()])
