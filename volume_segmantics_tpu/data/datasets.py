"""In-memory slice datasets for training and prediction.

API parity with reference volume_segmantics/data/datasets.py:12-181, but
TPU-first: images are preprocessed once at construction into contiguous
stacked arrays so batches are zero-copy numpy views ready for a single
host->device transfer. Random augmentation and ImageNet normalisation happen
ON DEVICE inside the jitted train step (volume_segmantics_tpu/ops/augment.py)
instead of per-item on the host.
"""

import re
from pathlib import Path
from types import SimpleNamespace

import cv2
import numpy as np

import volume_segmantics_tpu.data.augmentations as augs
import volume_segmantics_tpu.utils.config as cfg


class VolSeg2dDataset:
    """Pairs of image/mask PNG slices, natural-sorted, preprocessed to a
    common square size (reference datasets.py:12-87)."""

    imagenet_mean = cfg.IMAGENET_MEAN
    imagenet_std = cfg.IMAGENET_STD

    def __init__(
        self,
        images_dir,
        masks_dir,
        preprocessing=None,
        augmentation=None,
        imagenet_norm=True,
        postprocessing=None,
    ):
        self.images_fps = sorted(list(Path(images_dir).glob("*.png")), key=self.natsort)
        self.masks_fps = sorted(list(Path(masks_dir).glob("*.png")), key=self.natsort)
        if len(self.images_fps) != len(self.masks_fps):
            # A silent zip-truncation here would train on mispaired slices.
            raise ValueError(
                f"Image/label slice counts differ: {len(self.images_fps)} "
                f"PNGs in {images_dir} vs {len(self.masks_fps)} in "
                f"{masks_dir}."
            )
        self.preprocessing = preprocessing
        self.augmentation = augmentation
        self.imagenet_norm = imagenet_norm
        self.postprocessing = postprocessing
        self._images = None
        self._masks = None

    @staticmethod
    def natsort(item):
        return [
            int(t) if t.isdigit() else t.lower() for t in re.split(r"(\d+)", str(item))
        ]

    def __len__(self):
        return len(self.images_fps)

    def __getitem__(self, i):
        """Per-item access mirroring the reference pipeline (preprocess ->
        augment -> normalise -> postprocess). Note the on-device training
        path does not use this; it consumes `stacked_arrays()`."""
        image = cv2.imread(str(self.images_fps[i]), cv2.IMREAD_GRAYSCALE)
        mask = cv2.imread(str(self.masks_fps[i]), 0)
        if self.preprocessing:
            sample = self.preprocessing(image=image, mask=mask)
            image, mask = sample["image"], sample["mask"]
        if self.augmentation:
            sample = self.augmentation(image=image, mask=mask)
            image, mask = sample["image"], sample["mask"]
        if self.imagenet_norm:
            if np.issubdtype(image.dtype, np.integer):
                image = image.astype(np.float32) / 255
            image = (image - self.imagenet_mean) / self.imagenet_std
        if self.postprocessing:
            sample = self.postprocessing(image=image, mask=mask)
            image, mask = sample["image"], sample["mask"]
        return image, mask

    def stacked_arrays(self):
        """Load + preprocess every slice once; returns (images, masks) as
        (N, S, S) uint8 arrays ready for device transfer."""
        if self._images is None:
            images, masks = [], []
            for img_fp, mask_fp in zip(self.images_fps, self.masks_fps):
                image = cv2.imread(str(img_fp), cv2.IMREAD_GRAYSCALE)
                mask = cv2.imread(str(mask_fp), 0)
                if self.preprocessing:
                    sample = self.preprocessing(image=image, mask=mask)
                    image, mask = sample["image"], sample["mask"]
                images.append(image)
                masks.append(mask)
            self._images = np.stack(images).astype(np.uint8)
            self._masks = np.stack(masks).astype(np.uint8)
        return self._images, self._masks


class VolSeg2dPredictionDataset:
    """Indexes z-slices of an in-RAM volume, padded to the model-stride
    divisor (reference datasets.py:90-145)."""

    imagenet_mean = cfg.IMAGENET_MEAN
    imagenet_std = cfg.IMAGENET_STD

    def __init__(
        self,
        data_vol,
        preprocessing=None,
        imagenet_norm=True,
        postprocessing=None,
    ):
        self.data_vol = data_vol
        self.preprocessing = preprocessing
        self.imagenet_norm = imagenet_norm
        self.postprocessing = postprocessing

    def __getitem__(self, i):
        image = self.data_vol[i]
        if self.preprocessing:
            image = self.preprocessing(image=image)["image"]
        if self.imagenet_norm:
            if np.issubdtype(image.dtype, np.integer):
                image = image.astype(np.float32) / 255
            image = (image - self.imagenet_mean) / self.imagenet_std
        if self.postprocessing:
            image = self.postprocessing(image=image)["image"]
        return image

    def __len__(self):
        return self.data_vol.shape[0]


def get_2d_training_dataset(
    image_dir: Path, label_dir: Path, settings: SimpleNamespace
) -> VolSeg2dDataset:
    """Training dataset factory (reference datasets.py:148-159). Random augs
    are attached on device by the trainer, not here."""
    img_size = settings.image_size
    return VolSeg2dDataset(
        image_dir,
        label_dir,
        preprocessing=augs.get_train_preprocess_augs(img_size),
        postprocessing=augs.get_postprocess_augs(),
    )


def get_2d_validation_dataset(
    image_dir: Path, label_dir: Path, settings: SimpleNamespace
) -> VolSeg2dDataset:
    """Validation dataset factory (reference datasets.py:162-172)."""
    img_size = settings.image_size
    return VolSeg2dDataset(
        image_dir,
        label_dir,
        preprocessing=augs.get_train_preprocess_augs(img_size),
        postprocessing=augs.get_postprocess_augs(),
    )


def get_2d_prediction_dataset(data_vol: np.ndarray) -> VolSeg2dPredictionDataset:
    """Prediction dataset factory (reference datasets.py:175-181)."""
    y_dim, x_dim = data_vol.shape[1:]
    return VolSeg2dPredictionDataset(
        data_vol,
        preprocessing=augs.get_pred_preprocess_augs(y_dim, x_dim),
        postprocessing=augs.get_postprocess_augs(),
    )
