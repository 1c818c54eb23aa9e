"""DeepLabV3 and DeepLabV3+ decoders in Flax, NHWC.

Structure matches smp.DeepLabV3 / smp.DeepLabV3Plus as dispatched by the
reference (reference model/model_2d.py:24-29):

- DeepLabV3: dilated encoder (output_stride 8), ASPP(rates 12/24/36, 256ch)
  with image pooling, projection + conv3x3, head upsamples x8.
- DeepLabV3+: output_stride 16, separable-conv ASPP, x4 upsample, fuse with
  the stride-4 encoder feature through a 48-channel 1x1, separable 3x3
  refinement, head upsamples x4.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import BnAct, ConvBnAct, resize_to


class SeparableConvBnRelu(nn.Module):
    features: int
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        pad = self.dilation
        x = nn.Conv(
            in_ch,
            (3, 3),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=in_ch,
            use_bias=False,
            dtype=self.dtype,
            name="conv_depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv_pointwise",
        )(x)
        # BnAct == nn.BatchNorm -> relu -> cast bit-exactly (relu commutes
        # with the dtype rounding), with bf16-only autodiff residuals.
        return BnAct(act=nn.relu, dtype=self.dtype, name="bn")(x, train)


class ASPP(nn.Module):
    features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    separable: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branches = [
            ConvBnAct(
                self.features, (1, 1), padding=[(0, 0), (0, 0)],
                dtype=self.dtype, name="convbn_1x1",
            )(x, train)
        ]
        for i, rate in enumerate(self.atrous_rates):
            if self.separable:
                b = SeparableConvBnRelu(
                    self.features, dilation=rate, dtype=self.dtype,
                    name=f"sepconv_r{rate}",
                )(x, train)
            else:
                b = ConvBnAct(
                    self.features, (3, 3), dilation=(rate, rate),
                    dtype=self.dtype, name=f"convbn_r{rate}",
                )(x, train)
            branches.append(b)
        # Image pooling branch
        pooled = jnp.mean(x, axis=(1, 2), keepdims=True)
        pooled = ConvBnAct(
            self.features, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype,
            name="convbn_pool",
        )(pooled, train)
        pooled = jnp.broadcast_to(
            pooled, (x.shape[0], h, w, self.features)
        ).astype(branches[0].dtype)
        branches.append(pooled)
        out = jnp.concatenate(branches, axis=-1)
        out = ConvBnAct(
            self.features, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype,
            name="convbn_project",
        )(out, train)
        out = nn.Dropout(rate=0.5, deterministic=not train)(out)
        return out


class DeepLabV3Decoder(nn.Module):
    features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = ASPP(
            self.features, self.atrous_rates, separable=False, dtype=self.dtype,
            name="aspp",
        )(features[-1], train)
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn_out")(
            x, train
        )
        return x


class DeepLabV3PlusDecoder(nn.Module):
    features: int = 256
    atrous_rates: Sequence[int] = (12, 24, 36)
    highres_channels: int = 48
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        x = ASPP(
            self.features, self.atrous_rates, separable=True, dtype=self.dtype,
            name="aspp",
        )(features[-1], train)
        x = SeparableConvBnRelu(self.features, dtype=self.dtype, name="sepconv_aspp")(
            x, train
        )
        high = features[-4]  # stride 4
        # smp uses nn.UpsamplingBilinear2d(scale_factor=4) here, i.e.
        # align_corners=True (pinned by tests/test_torch_oracle.py).
        x = resize_to(x, high.shape[1], high.shape[2], "bilinear",
                      align_corners=True)
        high = ConvBnAct(
            self.highres_channels, (1, 1), padding=[(0, 0), (0, 0)],
            dtype=self.dtype, name="convbn_highres",
        )(high, train)
        x = jnp.concatenate([x, high.astype(x.dtype)], axis=-1)
        x = SeparableConvBnRelu(self.features, dtype=self.dtype, name="sepconv_fuse")(
            x, train
        )
        return x
