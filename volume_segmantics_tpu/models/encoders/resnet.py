"""ResNet-family encoders (ResNet-34/50, ResNeXt-50 32x4d) in Flax, NHWC.

Feature-pyramid contract (matches the smp encoders the reference dispatches
to via model_2d.py:10-39 and README.md:67-76): calling the encoder returns 6
feature maps at strides [1, 2, 4, 8, 16, 32] with channels `out_channels`.
`output_stride` in {32, 16, 8} swaps stride for dilation in the deepest
stages (needed by DeepLabV3/+ and PAN decoders).

Structure follows the torchvision ResNet family so that converted ImageNet
weights map 1:1 (see models/torch_convert.py).
"""

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, max_pool


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = ConvBnAct(
            self.features,
            (3, 3),
            strides=self.strides,
            dilation=self.dilation,
            dtype=self.dtype,
            name="convbn1",
        )(x, train)
        out = ConvBnAct(
            self.features,
            (3, 3),
            dilation=self.dilation,
            act=None,
            dtype=self.dtype,
            name="convbn2",
        )(out, train)
        if self.downsample:
            identity = ConvBnAct(
                self.features,
                (1, 1),
                strides=self.strides,
                padding=[(0, 0), (0, 0)],
                act=None,
                dtype=self.dtype,
                name="conv_down",
            )(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    features: int  # bottleneck width (output = features * 4)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    downsample: bool = False
    groups: int = 1
    base_width: int = 64
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        width = int(self.features * (self.base_width / 64.0)) * self.groups
        identity = x
        out = ConvBnAct(
            width, (1, 1), padding=[(0, 0), (0, 0)], dtype=self.dtype, name="convbn1"
        )(x, train)
        out = ConvBnAct(
            width,
            (3, 3),
            strides=self.strides,
            dilation=self.dilation,
            groups=self.groups,
            dtype=self.dtype,
            name="convbn2",
        )(out, train)
        out = ConvBnAct(
            self.features * self.expansion,
            (1, 1),
            padding=[(0, 0), (0, 0)],
            act=None,
            dtype=self.dtype,
            name="convbn3",
        )(out, train)
        if self.downsample:
            identity = ConvBnAct(
                self.features * self.expansion,
                (1, 1),
                strides=self.strides,
                padding=[(0, 0), (0, 0)],
                act=None,
                dtype=self.dtype,
                name="conv_down",
            )(x, train)
        return nn.relu(out + identity)


class ResNetEncoder(nn.Module):
    """torchvision-style ResNet trunk emitting a 6-level feature pyramid."""

    block: str  # "basic" | "bottleneck"
    layers: Sequence[int]
    groups: int = 1
    base_width: int = 64
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        # Stem: 7x7 stride-2 conv (stride 2 -> feature C1)
        out = ConvBnAct(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            dtype=self.dtype,
            name="stem_conv",
        )(x, train)
        features.append(out)
        out = max_pool(out, 3, 2)

        # Stage dilation plan for reduced output stride
        # (torchvision replace_stride_with_dilation semantics).
        stage_planes = (64, 128, 256, 512)
        stage_strides = [1, 2, 2, 2]
        stage_dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            stage_strides[3] = 1
            stage_dilations[3] = 2
        elif self.output_stride == 8:
            stage_strides[2:] = [1, 1]
            stage_dilations[2:] = [2, 4]

        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        expansion = 1 if self.block == "basic" else 4

        in_ch = 64
        for stage_idx, (planes, n_blocks) in enumerate(zip(stage_planes, self.layers)):
            stride = stage_strides[stage_idx]
            dilation = stage_dilations[stage_idx]
            for block_idx in range(n_blocks):
                s = stride if block_idx == 0 else 1
                needs_down = block_idx == 0 and (
                    s != 1 or in_ch != planes * expansion
                )
                kwargs = dict(
                    features=planes,
                    strides=(s, s),
                    dilation=(dilation, dilation),
                    downsample=needs_down,
                    dtype=self.dtype,
                )
                if self.block == "bottleneck":
                    kwargs.update(groups=self.groups, base_width=self.base_width)
                out = block_cls(**kwargs, name=f"layer{stage_idx + 1}_{block_idx}")(
                    out, train
                )
            in_ch = planes * expansion
            features.append(out)
        return features


def resnet34(dtype=jnp.float32, output_stride=32) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = ResNetEncoder(
        block="basic", layers=(3, 4, 6, 3), output_stride=output_stride, dtype=dtype
    )
    return enc, (1, 64, 64, 128, 256, 512)


def resnet50(dtype=jnp.float32, output_stride=32) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = ResNetEncoder(
        block="bottleneck",
        layers=(3, 4, 6, 3),
        output_stride=output_stride,
        dtype=dtype,
    )
    return enc, (1, 64, 256, 512, 1024, 2048)


def resnext50_32x4d(
    dtype=jnp.float32, output_stride=32
) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = ResNetEncoder(
        block="bottleneck",
        layers=(3, 4, 6, 3),
        groups=32,
        base_width=4,
        output_stride=output_stride,
        dtype=dtype,
    )
    return enc, (1, 64, 256, 512, 1024, 2048)
