"""EfficientNet encoders (B3, B4) in Flax, NHWC.

Feature-pyramid contract matches smp's timm-efficientnet encoders as used
by the reference (reference README.md:67-76 lists efficientnet-b3/b4 among
the tested encoders): 6 features at strides [1, 2, 4, 8, 16, 32] with
out_channels (1, 40, 32, 48, 136, 384) for B3 and (1, 48, 32, 56, 160, 448)
for B4. Convolutions use TF "SAME" padding (native to XLA — no manual
asymmetric padding like the torch ports need). Supports `output_stride`
16/8 by swapping stride for dilation in the deeper stages.
"""

import math
from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import BnAct as _LayersBnAct
from volume_segmantics_tpu.models.layers import SqueezeExcite


def _round_channels(channels: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding."""
    new_c = max(divisor, int(channels + divisor / 2) // divisor * divisor)
    if new_c < 0.9 * channels:
        new_c += divisor
    return new_c


def _round_repeats(repeats: int, depth_mult: float) -> int:
    return int(math.ceil(depth_mult * repeats))


# Base (B0) stage configs: (expand, kernel, stride, channels, repeats)
_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


class _BnAct(nn.Module):
    act: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # timm uses momentum 0.99 (torch 0.01), tuned for 100s-of-epoch
        # ImageNet pretraining. In this toolkit's few-epoch fine-tuning
        # regime running statistics must track quickly or eval-mode
        # collapses when training from random init; 0.9 matches the other
        # encoders and converged EfficientNet weights are unaffected.
        return _LayersBnAct(
            act=nn.silu if self.act else None,
            momentum=0.9,
            epsilon=1e-3,
            dtype=self.dtype,
            name="bn",
        )(x, train)


class MBConv(nn.Module):
    in_channels: int
    out_channels: int
    expand: int
    kernel: int
    stride: int
    dilation: int = 1
    se_ratio: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        mid = self.in_channels * self.expand
        h = x
        if self.expand != 1:
            h = nn.Conv(
                mid, (1, 1), use_bias=False, dtype=self.dtype, name="conv_expand"
            )(h)
            h = _BnAct(dtype=self.dtype, name="bnact_expand")(h, train)
        # Depthwise, TF SAME padding (stride 2 pads bottom/right like TF)
        h = nn.Conv(
            mid,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding="SAME",
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=mid,
            use_bias=False,
            dtype=self.dtype,
            name="conv_depthwise",
        )(h)
        h = _BnAct(dtype=self.dtype, name="bnact_depthwise")(h, train)
        se_ch = max(1, int(self.in_channels * self.se_ratio))
        h = SqueezeExcite(
            mid, se_ch, act=nn.silu, dtype=self.dtype, name="se"
        )(h)
        h = nn.Conv(
            self.out_channels, (1, 1), use_bias=False, dtype=self.dtype,
            name="conv_project",
        )(h)
        h = _BnAct(act=False, dtype=self.dtype, name="bnact_project")(h, train)
        if self.stride == 1 and self.in_channels == self.out_channels:
            h = h + identity
        return h


class EfficientNetEncoder(nn.Module):
    width_mult: float
    depth_mult: float
    output_stride: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = [x]
        stem_ch = _round_channels(32 * self.width_mult)
        if x.shape[-1] <= 4:
            # Tiny-C_in stride-2 stem via space-to-depth (same params/
            # outputs as nn.Conv; see layers.space_to_depth_conv2d).
            from volume_segmantics_tpu.models.layers import StemConv

            h = StemConv(
                stem_ch, (3, 3), "SAME", use_bias=False, dtype=self.dtype,
                name="conv_stem",
            )(x)
        else:
            h = nn.Conv(
                stem_ch, (3, 3), strides=(2, 2), padding="SAME", use_bias=False,
                dtype=self.dtype, name="conv_stem",
            )(x)
        h = _BnAct(dtype=self.dtype, name="bnact_stem")(h, train)
        features.append(h)  # stride 2: stem output (smp tap point)

        # Remaining taps after stages producing strides 4, 8, 16, 32:
        # smp uses [stem, stage2, stage3, stage5, stage7] boundaries.
        in_ch = stem_ch
        current_stride = 2
        dilation = 1
        stage_outputs = {}
        for stage_idx, (e, k, s, c, r) in enumerate(_B0_STAGES):
            out_ch = _round_channels(c * self.width_mult)
            reps = _round_repeats(r, self.depth_mult)
            for block_idx in range(reps):
                stride = s if block_idx == 0 else 1
                d = dilation
                if stride > 1 and current_stride * stride > self.output_stride:
                    # Convert stride to dilation to cap the output stride.
                    dilation *= stride
                    d = dilation
                    stride = 1
                elif stride > 1:
                    current_stride *= stride
                h = MBConv(
                    in_ch, out_ch, e, k, stride, dilation=d, dtype=self.dtype,
                    name=f"stage{stage_idx + 1}_block{block_idx}",
                )(h, train)
                in_ch = out_ch
            stage_outputs[stage_idx + 1] = h
            if stage_idx + 1 in (2, 3, 5, 7):
                features.append(h)  # strides 4, 8, 16, 32
        return features


def efficientnet_b3(
    dtype=jnp.float32, output_stride=32
) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = EfficientNetEncoder(
        width_mult=1.2, depth_mult=1.4, output_stride=output_stride, dtype=dtype
    )
    return enc, (1, 40, 32, 48, 136, 384)


def efficientnet_b4(
    dtype=jnp.float32, output_stride=32
) -> Tuple[nn.Module, Tuple[int, ...]]:
    enc = EfficientNetEncoder(
        width_mult=1.4, depth_mult=1.8, output_stride=output_stride, dtype=dtype
    )
    return enc, (1, 48, 32, 56, 160, 448)
