"""U-Net decoder (smp-compatible structure) in Flax, NHWC.

Mirrors the decoder the reference builds via smp.Unet (reference
model/model_2d.py:15-17): 5 decoder blocks with channels (256, 128, 64, 32,
16); each block = nearest x2 upsample -> concat skip -> 2x (conv3x3 + BN +
ReLU). Skips are the encoder pyramid levels in reverse depth order.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import (
    ConvBnAct,
    UpsampleConvBnAct,
    upsample,
)


class UnetDecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        # up2 -> concat -> conv3x3 fused via the subpixel phase
        # decomposition (layers.py:upsample2_conv3x3_phase): neither the
        # upsampled tensor nor the concat is materialized, which removes
        # the decoder's dominant HBM traffic at high resolutions. Params
        # are identical to the upsample+concat+ConvBnAct composition.
        x = UpsampleConvBnAct(self.features, dtype=self.dtype, name="convbn1")(
            x, skip, train
        )
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn2")(x, train)
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        # features: [C0(identity), C1(s2), C2(s4), C3(s8), C4(s16), C5(s32)]
        feats = features[1:][::-1]  # [C5, C4, C3, C2, C1]
        x = feats[0]
        skips = feats[1:] + [None]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = UnetDecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                x, skip, train
            )
        return x
