"""Device-op tests: warp sampling, CLAHE, fused augmentation pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volume_segmantics_tpu.ops.augment import augment_batch
from volume_segmantics_tpu.ops.clahe import clahe
from volume_segmantics_tpu.ops.warp import (
    bilinear_sample,
    identity_coords,
    nearest_sample,
    reflect101_index,
)


class TestWarp:
    def test_reflect101(self):
        idx = jnp.array([-2, -1, 0, 1, 4, 5, 6])
        out = np.asarray(reflect101_index(idx, 5))
        assert list(out) == [2, 1, 0, 1, 4, 3, 2]

    def test_bilinear_identity(self):
        img = jnp.array(np.random.rand(16, 16), jnp.float32)
        coords = identity_coords(16, 16)
        out = bilinear_sample(img, coords)
        assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_nearest_identity(self):
        img = jnp.array(np.random.randint(4, size=(16, 16)), jnp.int32)
        out = nearest_sample(img, identity_coords(16, 16))
        assert np.array_equal(np.asarray(out), np.asarray(img))


class TestClahe:
    def test_range_and_shape(self):
        img = jnp.array(np.random.rand(64, 64), jnp.float32)
        out = np.asarray(clahe(img, jnp.float32(2.0)))
        assert out.shape == (64, 64)
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_uniform_image_stays_flat(self):
        img = jnp.full((64, 64), 0.5, jnp.float32)
        out = np.asarray(clahe(img, jnp.float32(2.0)))
        assert out.std() < 0.02


class TestAugmentBatch:
    def test_shapes_dtypes_and_label_set(self):
        rng = jax.random.PRNGKey(0)
        imgs = jnp.array(np.random.rand(4, 64, 64), jnp.float32)
        msks = jnp.array(np.random.randint(3, size=(4, 64, 64)), jnp.int32)
        ai, am = augment_batch(rng, imgs, msks, 64)
        assert ai.shape == (4, 64, 64)
        assert am.shape == (4, 64, 64)
        assert am.dtype == jnp.int32
        assert set(np.unique(np.asarray(am))) <= {0, 1, 2}
        assert np.asarray(ai).min() >= 0.0

    def test_randomness_between_keys(self):
        imgs = jnp.array(np.random.rand(2, 64, 64), jnp.float32)
        msks = jnp.zeros((2, 64, 64), jnp.int32)
        a1, _ = augment_batch(jax.random.PRNGKey(1), imgs, msks, 64)
        a2, _ = augment_batch(jax.random.PRNGKey(2), imgs, msks, 64)
        assert not np.allclose(np.asarray(a1), np.asarray(a2))

    def test_determinism_same_key(self):
        imgs = jnp.array(np.random.rand(2, 64, 64), jnp.float32)
        msks = jnp.zeros((2, 64, 64), jnp.int32)
        a1, _ = augment_batch(jax.random.PRNGKey(3), imgs, msks, 64)
        a2, _ = augment_batch(jax.random.PRNGKey(3), imgs, msks, 64)
        assert np.allclose(np.asarray(a1), np.asarray(a2))


class TestAugmentBatchU8:
    def test_matches_float_path(self):
        """The fused-gather uint8 path (one packed 4-tap gather for image +
        mask) must reproduce the float path: identical RNG consumption ->
        identical draws; images equal to float rounding, masks equal except
        at exact half-pixel interpolation ties."""
        import jax

        from volume_segmantics_tpu.ops.augment import (
            augment_batch,
            augment_batch_u8,
        )

        rng = np.random.default_rng(4)
        img_u8 = jnp.asarray(rng.integers(0, 256, (4, 64, 64), np.uint8))
        msk_u8 = jnp.asarray(rng.integers(0, 3, (4, 64, 64), np.uint8))
        key = jax.random.PRNGKey(9)
        fi, fm = augment_batch(
            key, img_u8.astype(jnp.float32) / 255.0, msk_u8, 64
        )
        ui, um = augment_batch_u8(key, img_u8, msk_u8, 64)
        assert um.dtype == jnp.uint8
        np.testing.assert_allclose(
            np.asarray(ui), np.asarray(fi), atol=1e-5
        )
        mask_diff = (np.asarray(um) != np.asarray(fm)).mean()
        assert mask_diff < 0.02  # only exact .5-frac rounding ties may differ

    def test_determinism(self):
        import jax

        from volume_segmantics_tpu.ops.augment import augment_batch_u8

        rng = np.random.default_rng(5)
        img_u8 = jnp.asarray(rng.integers(0, 256, (2, 64, 64), np.uint8))
        msk_u8 = jnp.asarray(rng.integers(0, 2, (2, 64, 64), np.uint8))
        a1 = augment_batch_u8(jax.random.PRNGKey(3), img_u8, msk_u8, 64)
        a2 = augment_batch_u8(jax.random.PRNGKey(3), img_u8, msk_u8, 64)
        for x, y in zip(a1, a2):
            assert np.array_equal(np.asarray(x), np.asarray(y))


class TestUpsampleEquivalence:
    def test_nearest_broadcast_matches_resize(self):
        """The broadcast+reshape nearest upsample (models/layers.py) must
        stay bit-identical to jax.image.resize's nearest semantics."""
        import jax

        from volume_segmantics_tpu.models.layers import upsample

        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 7, 9, 3)).astype(np.float32))
        for factor in (2, 3):
            ours = np.asarray(upsample(x, factor, "nearest"))
            ref = np.asarray(
                jax.image.resize(
                    x, (2, 7 * factor, 9 * factor, 3), method="nearest"
                )
            )
            assert np.array_equal(ours, ref)

    def test_phase_decomposed_up2_conv_matches_composition(self):
        """upsample2_conv3x3_phase (models/layers.py) must equal the
        materializing up2_nearest -> concat(skip) -> SAME conv3x3 path to
        float tolerance (weight sums reassociate, so ~1 ulp not exact)."""
        import jax.lax as lax

        from volume_segmantics_tpu.models.layers import (
            upsample,
            upsample2_conv3x3_phase,
        )

        rng = np.random.default_rng(8)
        for cx, cs, out, h, w in ((5, 3, 4, 6, 7), (2, 0, 3, 3, 5)):
            x = jnp.asarray(rng.normal(size=(2, h, w, cx)).astype(np.float32))
            skip = (
                jnp.asarray(
                    rng.normal(size=(2, 2 * h, 2 * w, cs)).astype(np.float32)
                )
                if cs
                else None
            )
            kernel = jnp.asarray(
                rng.normal(size=(3, 3, cx + cs, out)).astype(np.float32)
            )
            got = np.asarray(
                upsample2_conv3x3_phase(x, skip, kernel, jnp.float32)
            )
            up = upsample(x, 2, "nearest")
            full = (
                jnp.concatenate([up, skip], axis=-1) if cs else up
            )
            ref = np.asarray(
                lax.conv_general_dilated(
                    full, kernel, (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            )
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_bilinear_matmul_matches_resize(self):
        """resize_to's identity-weights matmul path == jax.image.resize."""
        import jax

        from volume_segmantics_tpu.models.layers import resize_to

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(1, 13, 17, 2)).astype(np.float32))
        ours = np.asarray(resize_to(x, 52, 68, "bilinear"))
        ref = np.asarray(jax.image.resize(x, (1, 52, 68, 2), method="bilinear"))
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestMxuWarpKernel:
    """The one-hot-matmul Pallas warp (ops/warp.py:warp_batch_u8_mxu) must be
    bit-identical to the vmapped 4-tap gather it replaces on TPU. Run in
    interpreter mode so the kernel logic is pinned on CPU CI."""

    def test_matches_gather_warp(self):
        import jax

        from volume_segmantics_tpu.ops.warp import (
            warp_batch_u8_mxu,
            warp_pair_u8,
        )

        S, B = 64, 3
        rng = np.random.default_rng(11)
        imgs = jnp.asarray(rng.integers(0, 255, (B, S, S), np.uint8))
        msks = jnp.asarray(rng.integers(0, 4, (B, S, S), np.uint8))
        # Include out-of-range coords to exercise reflect-101 (incl. >1 period)
        coords = jnp.asarray(
            rng.uniform(-5.0, S + 4.0, (B, 2, S, S)).astype(np.float32)
        )
        ref_img, ref_msk = jax.vmap(warp_pair_u8)(imgs, msks, coords)
        got_img, got_msk = warp_batch_u8_mxu(imgs, msks, coords, interpret=True)
        assert np.array_equal(np.asarray(got_msk), np.asarray(ref_msk))
        # Bit-exact on TPU (verified on chip); CPU interpret mode may fuse
        # the lerp into FMAs, shifting single ulps.
        np.testing.assert_allclose(
            np.asarray(got_img), np.asarray(ref_img), atol=2e-7, rtol=0
        )

    def test_separable_fast_path_matches_gather_warp(self):
        """At S % 128 == 0 the kernel adds per-sample separable branches
        (flags 1/2) — pin all three branches in one batch against the
        vmapped gather reference, including out-of-range coords."""
        import jax

        from volume_segmantics_tpu.ops.warp import (
            _separable_tap_inputs,
            warp_batch_u8_mxu,
            warp_pair_u8,
        )

        S, B = 128, 4
        rng = np.random.default_rng(17)
        imgs = jnp.asarray(rng.integers(0, 255, (B, S, S), np.uint8))
        msks = jnp.asarray(rng.integers(0, 4, (B, S, S), np.uint8))
        coords = np.empty((B, 2, S, S), np.float32)
        # sample 0: general (elastic-like dense random field)
        coords[0] = rng.uniform(-5.0, S + 4.0, (2, S, S)).astype(np.float32)
        # sample 1: separable, y = f(row), x = g(col), out-of-range incl.
        fy = rng.uniform(-5.0, S + 4.0, S).astype(np.float32)
        gx = rng.uniform(-5.0, S + 4.0, S).astype(np.float32)
        coords[1, 0] = fy[:, None]
        coords[1, 1] = gx[None, :]
        # sample 2: swapped separable, y = f(col), x = g(row)
        coords[2, 0] = fy[None, :]
        coords[2, 1] = gx[:, None]
        # sample 3: constant field (sep1 AND sep2 -> flag 1 wins)
        coords[3] = 7.25
        coords = jnp.asarray(coords)

        flags, _, _, _ = _separable_tap_inputs(coords, S, 8)
        assert [int(f) for f in flags[:, 0, 0]] == [0, 1, 2, 1]

        ref_img, ref_msk = jax.vmap(warp_pair_u8)(imgs, msks, coords)
        got_img, got_msk = warp_batch_u8_mxu(imgs, msks, coords, interpret=True)
        assert np.array_equal(np.asarray(got_msk), np.asarray(ref_msk))
        np.testing.assert_allclose(
            np.asarray(got_img), np.asarray(ref_img), atol=2e-7, rtol=0
        )

    def test_bilinear_values_exact(self):
        """Interpolation at half-integer coords hits exact averages."""
        from volume_segmantics_tpu.ops.warp import warp_batch_u8_mxu

        S = 32
        img = np.zeros((1, S, S), np.uint8)
        img[0, 0, 0] = 100
        img[0, 0, 1] = 200
        coords = np.zeros((1, 2, S, S), np.float32)
        coords[0, 1, :, :] = 0.5  # x halfway between cols 0 and 1, y=0
        out_img, _ = warp_batch_u8_mxu(
            jnp.asarray(img), jnp.asarray(img), jnp.asarray(coords),
            interpret=True,
        )
        assert np.isclose(float(out_img[0, 0, 0]), 150.0 / 255.0, atol=1e-6)


class TestFusedClaheKernel:
    """The fully-fused Pallas CLAHE (ops/clahe.py:clahe_batch_fused) must
    match the XLA `clahe` per sample and pass skipped samples through
    untouched. Run in interpreter mode so the kernel logic is pinned on
    CPU CI (bit-identical to the XLA path there; ~1e-7 on TPU)."""

    def test_matches_xla_clahe_and_passthrough(self):
        from volume_segmantics_tpu.ops.clahe import clahe_batch_fused

        rng = np.random.default_rng(5)
        n, S = 4, 64
        imgs = rng.random((n, S, S)).astype(np.float32)
        clips = np.array([1.0, 2.5, 3.3, 4.0], np.float32)
        apply = np.array([1, 0, 1, 1], np.int32)
        out = np.asarray(
            clahe_batch_fused(
                jnp.asarray(imgs),
                jnp.asarray(clips),
                jnp.asarray(apply),
                interpret=True,
            )
        )
        assert np.array_equal(out[1], imgs[1])  # skipped sample untouched
        for i in (0, 2, 3):
            ref = np.asarray(clahe(jnp.asarray(imgs[i]), jnp.float32(clips[i])))
            np.testing.assert_allclose(out[i], ref, atol=1e-6, rtol=0)

    def test_skewed_histogram_redistribution(self):
        """Dark image exercises the OpenCV clip/redistribute branch."""
        from volume_segmantics_tpu.ops.clahe import clahe_batch_fused

        rng = np.random.default_rng(9)
        img = (rng.random((64, 64)) ** 3).astype(np.float32)
        out = np.asarray(
            clahe_batch_fused(
                jnp.asarray(img[None]),
                jnp.asarray([1.5], np.float32),
                jnp.ones(1, jnp.int32),
                interpret=True,
            )
        )[0]
        ref = np.asarray(clahe(jnp.asarray(img), jnp.float32(1.5)))
        np.testing.assert_allclose(out, ref, atol=1e-6, rtol=0)


class TestAlignCornersResize:
    def test_matches_torch_interpolate(self):
        """resize_align_corners (matmul form) == torch F.interpolate with
        align_corners=True (the smp PAN / SegmentationHead convention)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from volume_segmantics_tpu.models.layers import resize_align_corners

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 9, 13, 4)).astype(np.float32)
        for out_h, out_w in ((36, 52), (18, 26), (5, 7), (9, 13)):
            ours = np.asarray(
                resize_align_corners(jnp.asarray(x), out_h, out_w)
            )
            ref = F.interpolate(
                torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                size=(out_h, out_w), mode="bilinear", align_corners=True,
            ).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, ref, atol=2e-5)

    def test_singleton_input_broadcasts(self):
        from volume_segmantics_tpu.models.layers import resize_align_corners

        x = jnp.asarray(np.arange(6, dtype=np.float32).reshape(1, 1, 3, 2))
        y = np.asarray(resize_align_corners(x, 4, 3))
        assert y.shape == (1, 4, 3, 2)
        assert np.allclose(y, np.broadcast_to(np.asarray(x), (1, 4, 3, 2)))

    def test_resize_to_align_corners_any_direction(self):
        """resize_to(align_corners=True) must honour the mapping for
        DOWNsampling too (it delegates to resize_align_corners rather than
        silently falling through to the half-pixel path)."""
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F

        from volume_segmantics_tpu.models.layers import resize_to

        rng = np.random.default_rng(4)
        x = rng.normal(size=(1, 8, 12, 3)).astype(np.float32)
        for out_h, out_w in ((4, 6), (16, 6), (16, 24)):
            ours = np.asarray(
                resize_to(jnp.asarray(x), out_h, out_w, "bilinear",
                          align_corners=True)
            )
            ref = F.interpolate(
                torch.tensor(np.transpose(x, (0, 3, 1, 2))),
                size=(out_h, out_w), mode="bilinear", align_corners=True,
            ).numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(ours, ref, atol=2e-5)


class TestBnAct:
    """BnAct (models/layers.py) must replicate flax nn.BatchNorm -> act ->
    cast: same param/variable tree, same EMA updates (bit-exact), same
    normalized values to f32-reassociation tolerance (the affine form
    x*mul + (bias - mean*mul) reorders flax's (x - mean)*mul + bias)."""

    def _flax_ref(self, act):
        from flax import linen as nn

        class Ref(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                y = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-5, dtype=jnp.float32, name="bn",
                )(x)
                y = y.astype(jnp.bfloat16)
                return act(y) if act is not None else y

        return Ref()

    @pytest.mark.parametrize("use_act", [True, False])
    def test_matches_flax_batchnorm(self, use_act):
        from flax import linen as nn

        from volume_segmantics_tpu.models.layers import BnAct

        act = nn.relu if use_act else None
        rng = np.random.default_rng(11)
        x = jnp.asarray(
            (rng.normal(size=(4, 6, 6, 5)) * 3 + 1).astype(np.float32)
        ).astype(jnp.bfloat16)
        ours_mod = BnAct(act=act, dtype=jnp.bfloat16, name="bn")
        ref_mod = self._flax_ref(act)
        v_ours = ours_mod.init(jax.random.PRNGKey(0), x, train=True)
        v_ref = ref_mod.init(jax.random.PRNGKey(0), x, train=True)
        # identical variable tree (checkpoint compatibility); the ref
        # wrapper nests its BatchNorm under "bn", ours is top-level
        assert jax.tree_util.tree_structure(
            {"params": v_ours["params"], "batch_stats": v_ours["batch_stats"]}
        ) == jax.tree_util.tree_structure(
            {
                "params": v_ref["params"]["bn"],
                "batch_stats": v_ref["batch_stats"]["bn"],
            }
        )
        # seed non-trivial scale/bias/running stats
        sb = {
            "scale": jnp.asarray(rng.uniform(0.5, 2, 5), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=5), jnp.float32),
        }
        stats = {
            "mean": jnp.asarray(rng.normal(size=5), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.2, 3, 5), jnp.float32),
        }

        def tree(mod_vars):
            name = "bn" if "bn" in mod_vars["params"] else None
            p = {"bn": sb} if name else sb
            s = {"bn": stats} if name else stats
            return {"params": p, "batch_stats": s}

        for train in (True, False):
            y_ours, m_ours = ours_mod.apply(
                tree(v_ours), x, train=train, mutable=["batch_stats"]
            )
            y_ref, m_ref = ref_mod.apply(
                tree(v_ref), x, train=train, mutable=["batch_stats"]
            )
            np.testing.assert_allclose(
                np.asarray(y_ours, np.float32),
                np.asarray(y_ref, np.float32),
                atol=0.05,  # bf16 output: reassociation can flip one ulp
            )
            # most outputs must be bit-identical (only boundary values move)
            same = np.mean(
                np.asarray(y_ours, np.float32)
                == np.asarray(y_ref, np.float32)
            )
            assert same > 0.97
            if train:
                # EMA update formula is identical -> near-exact running stats
                for k in ("mean", "var"):
                    np.testing.assert_allclose(
                        np.asarray(m_ours["batch_stats"][k]),
                        np.asarray(m_ref["batch_stats"]["bn"][k]),
                        rtol=1e-6,
                    )

    def test_phase_group_stats_pool_correctly(self):
        """phase_groups=4: pooled statistics must equal the statistics of
        the depth-to-space-interleaved tensor (each output pixel belongs to
        exactly one phase), and the apply must match running BnAct on the
        interleaved tensor then re-extracting phases."""
        from volume_segmantics_tpu.models.layers import BnAct

        rng = np.random.default_rng(12)
        n, h, w, feat, g = 2, 5, 7, 3, 4
        y4 = jnp.asarray(
            (rng.normal(size=(n, h, w, g * feat)) * 2 - 0.5).astype(
                np.float32
            )
        )
        # interleave phases into the (n, 2h, 2w, feat) spatial tensor
        y_full = (
            y4.reshape(n, h, w, 2, 2, feat)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, 2 * h, 2 * w, feat)
        )
        mod_p = BnAct(dtype=jnp.float32, phase_groups=g, name="bn")
        mod_f = BnAct(dtype=jnp.float32, name="bn")
        v_p = mod_p.init(jax.random.PRNGKey(0), y4, train=True)
        v_f = mod_f.init(jax.random.PRNGKey(0), y_full, train=True)
        assert v_p["params"]["scale"].shape == (feat,)
        out_p, m_p = mod_p.apply(v_p, y4, train=True, mutable=["batch_stats"])
        out_f, m_f = mod_f.apply(
            v_f, y_full, train=True, mutable=["batch_stats"]
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(m_p["batch_stats"][k]),
                np.asarray(m_f["batch_stats"][k]),
                rtol=2e-5, atol=2e-6,
            )
        out_p_full = np.asarray(
            out_p.reshape(n, h, w, 2, 2, feat)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, 2 * h, 2 * w, feat)
        )
        np.testing.assert_allclose(
            out_p_full, np.asarray(out_f), rtol=2e-4, atol=2e-5
        )


class TestUpsampleConvBnActNoSkip:
    def test_phase_layout_bn_matches_materializing_path(self):
        """UpsampleConvBnAct without a skip (phase-layout BN) must match
        upsample -> conv -> BnAct on the materialized tensor."""
        from flax import linen as nn

        from volume_segmantics_tpu.models.layers import (
            BnAct,
            UpsampleConvBnAct,
            upsample,
        )
        import jax.lax as lax

        rng = np.random.default_rng(13)
        x = jnp.asarray(rng.normal(size=(2, 6, 5, 4)).astype(np.float32))
        mod = UpsampleConvBnAct(3, dtype=jnp.float32)
        variables = mod.init(jax.random.PRNGKey(1), x, train=True)
        kernel = variables["params"]["conv"]["kernel"]
        assert kernel.shape == (3, 3, 4, 3)
        y, mut = mod.apply(variables, x, train=True, mutable=["batch_stats"])

        up = upsample(x, 2, "nearest")
        conv = lax.conv_general_dilated(
            up, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        ref_bn = BnAct(act=nn.relu, dtype=jnp.float32, name="bn")
        v_ref = {
            "params": variables["params"]["bn"],
            "batch_stats": variables["batch_stats"]["bn"],
        }
        y_ref, mut_ref = ref_bn.apply(
            v_ref, conv, train=True, mutable=["batch_stats"]
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(y_ref), rtol=2e-4, atol=2e-5
        )
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut["batch_stats"]["bn"][k]),
                np.asarray(mut_ref["batch_stats"][k]),
                rtol=2e-5, atol=2e-6,
            )
