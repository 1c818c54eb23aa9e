"""ResNeSt encoders (50d, 101e) in Flax, NHWC.

Feature contract matches smp's timm-resnest encoders used by the reference
(reference README.md:67-76; tests/test_model_2d.py:36-44 exercises
timm-resnest50d and timm-resnest101e): 6 features at strides
[1, 2, 4, 8, 16, 32]. ResNeSt-D/E details implemented: deep 3-conv stem
(stem widths 32 / 64), average-pool downsampling in both the residual path
(avd) and the shortcut (avg_down), and radix-2 Split-Attention 3x3 convs.

Dilated note (output_stride 16/8, i.e. DeepLabV3/V3+ with ResNeSt): this
implementation follows timm's native output-stride semantics — a dilated
stage runs at stride 1 throughout, so the avd / shortcut average pools
(which only exist to downsample) drop out. smp's generic ``make_dilated``
patches ONLY nn.Conv2d strides and accidentally leaves the stride-2
AvgPool2d modules downsampling, so its "dilated" ResNeSt still reduces
resolution — a quirk, not a design. Weight conversion is unaffected (same
parameters); per-voxel outputs for this combination differ from smp's.
"""

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import BnAct, ConvBnAct, max_pool


class SplAtConv(nn.Module):
    """Split-Attention convolution (radix groups with learned soft
    attention over the splits)."""

    features: int
    radix: int = 2
    groups: int = 1
    reduction: int = 4
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        r, c = self.radix, self.features
        in_ch = x.shape[-1]
        pad = self.dilation
        h = nn.Conv(
            c * r,
            (3, 3),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups * r,
            use_bias=False,
            dtype=self.dtype,
            name="conv",
        )(x)
        # BnAct == nn.BatchNorm -> relu -> cast bit-exactly (relu commutes
        # with the dtype rounding), with bf16-only autodiff residuals.
        h = BnAct(act=nn.relu, dtype=self.dtype, name="bn0")(h, train)
        n, hh, ww, _ = h.shape
        splits = h.reshape(n, hh, ww, r, c)
        gap = jnp.mean(splits.sum(axis=3), axis=(1, 2), keepdims=True)  # (n,1,1,c)
        inter = max(c * r // self.reduction, 32)
        a = nn.Conv(
            inter, (1, 1), feature_group_count=self.groups, dtype=self.dtype,
            name="conv_fc1",
        )(gap)
        a = BnAct(act=nn.relu, dtype=self.dtype, name="bn1")(a, train)
        a = nn.Conv(
            c * r, (1, 1), feature_group_count=self.groups, dtype=self.dtype,
            name="conv_fc2",
        )(a)
        # rSoftMax over the radix dimension
        att = a.reshape(n, 1, 1, r, c)
        att = nn.softmax(att.astype(jnp.float32), axis=3).astype(self.dtype)
        out = (splits * att).sum(axis=3)
        return out


class ResNeStBottleneck(nn.Module):
    features: int  # planes; output = planes * 4
    strides: int = 1
    dilation: int = 1
    downsample: bool = False
    radix: int = 2
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        group_width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        h = ConvBnAct(
            group_width, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype,
            name="convbn1",
        )(x, train)
        h = SplAtConv(
            group_width, radix=self.radix, groups=self.groups,
            dilation=self.dilation, dtype=self.dtype, name="splat",
        )(h, train)
        if self.strides > 1:
            # avd: average-pool downsampling after the split-attention conv
            h = nn.avg_pool(
                h, (3, 3), strides=(self.strides, self.strides),
                padding=((1, 1), (1, 1)),
            )
        h = ConvBnAct(
            self.features * 4, (1, 1), padding=[(0, 0), (0, 0)], act=None,
            dtype=self.dtype, name="convbn3",
        )(h, train)
        if self.downsample:
            if self.strides > 1:
                identity = nn.avg_pool(
                    identity, (self.strides, self.strides),
                    strides=(self.strides, self.strides), padding="VALID",
                )
            identity = ConvBnAct(
                self.features * 4, (1, 1), padding=[(0, 0), (0, 0)], act=None,
                dtype=self.dtype, name="conv_down",
            )(identity, train)
        return nn.relu(h + identity)


class ResNeStEncoder(nn.Module):
    layers: Sequence[int]
    stem_width: int = 32
    radix: int = 2
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        sw = self.stem_width
        h = ConvBnAct(
            sw, (3, 3), strides=(2, 2), dtype=self.dtype, name="stem_conv1"
        )(x, train)
        h = ConvBnAct(sw, (3, 3), dtype=self.dtype, name="stem_conv2")(h, train)
        h = ConvBnAct(sw * 2, (3, 3), dtype=self.dtype, name="stem_conv3")(h, train)
        features.append(h)
        h = max_pool(h, 3, 2)

        stage_planes = (64, 128, 256, 512)
        stage_strides = [1, 2, 2, 2]
        stage_dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            stage_strides[3] = 1
            stage_dilations[3] = 2
        elif self.output_stride == 8:
            stage_strides[2:] = [1, 1]
            stage_dilations[2:] = [2, 4]

        in_ch = sw * 2
        for stage_idx, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            stride = stage_strides[stage_idx]
            dilation = stage_dilations[stage_idx]
            for block_idx in range(n_blocks):
                s = stride if block_idx == 0 else 1
                needs_down = block_idx == 0 and (s != 1 or in_ch != planes * 4)
                h = ResNeStBottleneck(
                    planes,
                    strides=s,
                    dilation=dilation,
                    downsample=needs_down,
                    radix=self.radix,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(h, train)
                in_ch = planes * 4
            features.append(h)
        return features


def resnest50d(dtype=jnp.float32, output_stride=32) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = ResNeStEncoder(
        layers=(3, 4, 6, 3), stem_width=32, output_stride=output_stride, dtype=dtype
    )
    return enc, (1, 64, 256, 512, 1024, 2048)


def resnest101e(dtype=jnp.float32, output_stride=32) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = ResNeStEncoder(
        layers=(3, 4, 23, 3), stem_width=64, output_stride=output_stride, dtype=dtype
    )
    return enc, (1, 128, 256, 512, 1024, 2048)
