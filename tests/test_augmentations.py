import numpy as np

import volume_segmantics_tpu.data.augmentations as augs


def test_padded_dimension_math():
    assert augs.get_padded_dimension(64) == 64
    assert augs.get_padded_dimension(65) == 96
    assert augs.get_padded_dimension(243) == 256
    assert augs.get_padded_dimension(345) == 352


def test_train_preprocess_square():
    t = augs.get_train_preprocess_augs(64)
    img = np.random.randint(256, size=(61, 87)).astype(np.uint8)
    mask = np.random.randint(4, size=(61, 87)).astype(np.uint8)
    sample = t(image=img, mask=mask)
    assert sample["image"].shape == (64, 64)
    assert sample["mask"].shape == (64, 64)
    # mask values preserved under nearest interpolation
    assert set(np.unique(sample["mask"])) <= set(np.unique(mask))


def test_pred_preprocess_pads_to_divisor():
    t = augs.get_pred_preprocess_augs(61, 87)
    img = np.random.randint(256, size=(61, 87)).astype(np.uint8)
    out = t(image=img)["image"]
    assert out.shape == (64, 96)


def test_postprocess_channel_first():
    t = augs.get_postprocess_augs()
    img = np.random.rand(64, 64).astype(np.float32)
    out = t(image=img)["image"]
    assert out.shape == (1, 64, 64)
    assert out.dtype == np.float32
