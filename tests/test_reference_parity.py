"""Property tests pinning behaviors the reference relies on implicitly:
max-prob merge tie semantics, TTA merge ordering, dihedral warp coordinate
maps, and clip_to_uint8 numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import volume_segmantics_tpu.utils.base_data_utils as utils


class TestMergeSemantics:
    """Our on-device merge must equal the reference's
    np.argmax + np.take_along_axis container merge (reference
    vol_seg_2d_predictor.py:90-98), including tie handling."""

    @staticmethod
    def _reference_merge(prob_container, label_container):
        max_prob_idx = np.argmax(prob_container, axis=0)[np.newaxis]
        probs = np.squeeze(
            np.take_along_axis(prob_container, max_prob_idx, axis=0), axis=0
        )
        labels = np.squeeze(
            np.take_along_axis(label_container, max_prob_idx, axis=0), axis=0
        )
        return labels, probs

    def test_matches_reference_formulation(self):
        from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
            VolSeg2dPredictor,
        )

        rng = np.random.default_rng(0)
        shape = (6, 7, 8)
        probs = rng.random((2, *shape)).astype(np.float16)
        # Inject exact ties at random locations
        tie_mask = rng.random(shape) < 0.3
        probs[1][tie_mask] = probs[0][tie_mask]
        labels = rng.integers(0, 4, (2, *shape)).astype(np.uint8)

        ref_labels, ref_probs = self._reference_merge(probs.copy(), labels.copy())
        got_labels, got_probs = VolSeg2dPredictor._merge_pair(
            jnp.asarray(labels[0]), jnp.asarray(probs[0]),
            jnp.asarray(labels[1]), jnp.asarray(probs[1]),
        )
        assert np.array_equal(np.asarray(got_labels), ref_labels)
        assert np.array_equal(np.asarray(got_probs), ref_probs)


class TestDihedralWarp:
    """The inverse coordinate maps must reproduce numpy's flips/rotations
    exactly when sampled."""

    def _sample(self, img, coords):
        from volume_segmantics_tpu.ops.warp import nearest_sample

        return np.asarray(nearest_sample(jnp.asarray(img), coords))

    def test_rot90_inverse(self):
        from volume_segmantics_tpu.ops.augment import _rot90_inverse_coords
        from volume_segmantics_tpu.ops.warp import identity_coords

        img = np.arange(64, dtype=np.int32).reshape(8, 8)
        for k in range(4):
            coords = _rot90_inverse_coords(
                identity_coords(8, 8), jnp.int32(k), 8
            )
            out = self._sample(img, coords)
            assert np.array_equal(out, np.rot90(img, k)), f"k={k}"

    def test_vertical_flip(self):
        from volume_segmantics_tpu.ops.warp import identity_coords

        img = np.arange(64, dtype=np.int32).reshape(8, 8)
        coords = identity_coords(8, 8)
        flipped_coords = jnp.stack([7.0 - coords[0], coords[1]])
        out = self._sample(img, flipped_coords)
        assert np.array_equal(out, img[::-1, :])

    def test_transpose(self):
        from volume_segmantics_tpu.ops.warp import identity_coords

        img = np.arange(64, dtype=np.int32).reshape(8, 8)
        out = self._sample(img, identity_coords(8, 8)[::-1])
        assert np.array_equal(out, img.T)


class TestClipNumerics:
    def test_known_values(self):
        data = np.array([[-10.0, 0.0], [5.0, 20.0]])
        mean = float(data.mean())  # 3.75
        out = utils.clip_to_uint8(data.copy(), mean, 1.0)
        st = data.std()
        lb, ub = mean - st, mean + st
        expected = np.clip((np.clip(data, lb, ub) - lb) / (ub - lb), 0, 1) * 255
        assert np.array_equal(out, expected.astype(np.uint8))

    def test_rotate_matches_reference_swapaxes(self):
        vol = np.random.rand(3, 4, 5)
        assert np.array_equal(
            utils.rotate_array_to_axis(vol, utils.Axis.Y), vol.swapaxes(0, 1)
        )
        assert np.array_equal(
            utils.rotate_array_to_axis(vol, utils.Axis.X), vol.swapaxes(0, 2)
        )


class TestCropMatchesTorchCenterCrop:
    """crop_array_to_dims must match torchvision F.center_crop offsets
    (reference base_data_utils.py:125-129)."""

    @pytest.mark.parametrize("h,w,ch,cw", [(10, 10, 4, 4), (11, 9, 4, 3), (7, 8, 7, 8)])
    def test_offsets(self, h, w, ch, cw):
        torch = pytest.importorskip("torch")
        try:
            from torchvision.transforms.functional import center_crop
        except ImportError:
            pytest.skip("torchvision not available")
        arr = np.random.rand(h, w).astype(np.float32)
        ours = utils.crop_array_to_dims(arr, (ch, cw))
        theirs = center_crop(torch.tensor(arr)[None], [ch, cw])[0].numpy()
        assert np.array_equal(ours, theirs)
