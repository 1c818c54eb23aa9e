"""LinkNet decoder in Flax, NHWC.

Structure matches smp.Linknet as dispatched by the reference
(reference model/model_2d.py:33-35): each decoder block is a channel-
reducing 1x1 conv, a 2x transposed-conv upsample, and a 1x1 expansion, with
the encoder skip ADDED (not concatenated). Channel plan: encoder channels
reversed, finishing at 32 before the head.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import BnAct, ConvBnAct


class TransposeX2(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(
            self.features,
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            use_bias=False,
            dtype=self.dtype,
            name="convT",
        )(x)
        # BnAct == nn.BatchNorm -> relu -> cast bit-exactly (relu commutes
        # with the dtype rounding), with bf16-only autodiff residuals.
        return BnAct(act=nn.relu, dtype=self.dtype, name="bn")(x, train)


class LinknetDecoderBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBnAct(
            in_ch // 4, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype,
            name="convbn1",
        )(x, train)
        x = TransposeX2(in_ch // 4, dtype=self.dtype, name="transpose")(x, train)
        x = ConvBnAct(
            self.features, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype,
            name="convbn2",
        )(x, train)
        if skip is not None:
            x = x + skip.astype(x.dtype)
        return x


class LinknetDecoder(nn.Module):
    prefinal_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        feats = features[1:][::-1]  # [C5, C4, C3, C2, C1]
        x = feats[0]
        skips = feats[1:] + [None]
        channels = [f.shape[-1] for f in feats[1:]] + [self.prefinal_channels]
        for i, (skip, ch) in enumerate(zip(skips, channels)):
            x = LinknetDecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                x, skip, train
            )
        return x
