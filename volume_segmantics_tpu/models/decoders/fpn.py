"""FPN decoder (Feature Pyramid Network for segmentation) in Flax, NHWC.

Structure matches smp.FPN as dispatched by the reference
(reference model/model_2d.py:21-23): 1x1 lateral connections + top-down
nearest upsampling (pyramid_channels=256), per-level segmentation blocks of
conv3x3+GroupNorm(32)+ReLU with progressive upsampling
(segmentation_channels=128), summed ("add" merge), dropout 0.2. The decoder
output sits at stride 4; the head upsamples x4.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import upsample


class Conv3x3GnRelu(nn.Module):
    features: int
    do_upsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1), (1, 1)],
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # torch nn.GroupNorm eps (flax defaults to 1e-6, a real numerical
        # divergence for near-zero-variance groups).
        x = nn.GroupNorm(
            num_groups=32, epsilon=1e-5, dtype=jnp.float32, name="gn"
        )(x)
        x = nn.relu(x).astype(self.dtype)
        if self.do_upsample:
            x = upsample(x, 2, "nearest")
        return x


class FPNBlock(nn.Module):
    pyramid_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip):
        skip = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="conv_lateral"
        )(skip)
        x = upsample(x, 2, "nearest")
        return x + skip.astype(x.dtype)


class SegmentationBlock(nn.Module):
    features: int
    n_upsamples: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv3x3GnRelu(
            self.features, do_upsample=bool(self.n_upsamples), dtype=self.dtype,
            name="convgn0",
        )(x)
        for i in range(1, self.n_upsamples):
            x = Conv3x3GnRelu(
                self.features, do_upsample=True, dtype=self.dtype, name=f"convgn{i}"
            )(x)
        return x


class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        c2, c3, c4, c5 = features[-4], features[-3], features[-2], features[-1]
        p5 = nn.Conv(
            self.pyramid_channels, (1, 1), dtype=self.dtype, name="conv_p5"
        )(c5)
        p4 = FPNBlock(self.pyramid_channels, dtype=self.dtype, name="fpn_p4")(p5, c4)
        p3 = FPNBlock(self.pyramid_channels, dtype=self.dtype, name="fpn_p3")(p4, c3)
        p2 = FPNBlock(self.pyramid_channels, dtype=self.dtype, name="fpn_p2")(p3, c2)
        out = None
        for i, (p, ups) in enumerate(zip([p5, p4, p3, p2], [3, 2, 1, 0])):
            s = SegmentationBlock(
                self.segmentation_channels, n_upsamples=ups, dtype=self.dtype,
                name=f"seg_p{5 - i}",
            )(p)
            out = s if out is None else out + s
        # smp uses Dropout2d: whole feature maps are dropped together.
        out = nn.Dropout(
            rate=self.dropout, broadcast_dims=(1, 2), deterministic=not train
        )(out)
        return out
