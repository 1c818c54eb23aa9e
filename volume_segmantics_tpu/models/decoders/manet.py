"""MA-Net decoder (Multi-scale Attention Net) in Flax, NHWC.

Structure matches smp.MAnet as dispatched by the reference
(reference model/model_2d.py:30-32): a Position-wise Attention Block (PAB)
on the deepest feature, then Multi-scale Fusion Attention Blocks (MFAB)
fusing each skip with channel attention; the final block is a plain U-Net
style decoder block. Decoder channels (256, 128, 64, 32, 16), reduction 16.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, global_avg_pool, upsample
from volume_segmantics_tpu.models.decoders.unet import UnetDecoderBlock


class PAB(nn.Module):
    """Position-wise attention: spatial self-attention over the deepest
    feature map (64-channel projection)."""

    features: int
    pab_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Faithful to smp's PAB forward, including its quirks: the softmax
        # is GLOBAL over all hw*hw attention logits (torch view(b, -1)
        # before Softmax(dim=1)), and the (N, HW, C) attention output is
        # reinterpreted row-major as (N, C, H, W) rather than transposed.
        n, h, w, c = x.shape
        top = nn.Conv(self.pab_channels, (1, 1), dtype=self.dtype, name="conv_top")(x)
        center = nn.Conv(
            self.pab_channels, (1, 1), dtype=self.dtype, name="conv_center"
        )(x)
        bottom = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                         feature_group_count=1, dtype=self.dtype,
                         name="conv_bottom")(x)
        hw = h * w
        t = top.reshape(n, hw, self.pab_channels)
        cen = center.reshape(n, hw, self.pab_channels)
        # att[p, q] = center[p] . top[q]  (torch: matmul(center, top))
        att = jnp.einsum(
            "npc,nqc->npq", cen.astype(jnp.float32), t.astype(jnp.float32)
        )
        att = nn.softmax(att.reshape(n, hw * hw), axis=-1).reshape(n, hw, hw)
        b = bottom.reshape(n, hw, self.features).astype(jnp.float32)
        out = jnp.einsum("npq,nqc->npc", att, b)
        # torch reshape(b, c, h, w) of a (b, hw, c) tensor: row-major
        # reinterpretation, then back to NHWC.
        out = out.reshape(n, c, h, w).transpose(0, 2, 3, 1)
        out = out.astype(x.dtype)
        final = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], dtype=self.dtype,
            name="conv_map",
        )(x + out)
        return final


class ChannelSE(nn.Module):
    features: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = global_avg_pool(x)
        s = nn.Conv(
            max(self.features // self.reduction, 1), (1, 1), dtype=self.dtype,
            name="conv_squeeze",
        )(s)
        s = nn.relu(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv_excite")(s)
        return nn.sigmoid(s)


class MFAB(nn.Module):
    """Multi-scale Fusion Attention Block: high-level feature is projected
    to the skip width, both get channel attention, then concat + convs."""

    features: int
    skip_channels: int
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        in_ch = x.shape[-1]
        x = ConvBnAct(in_ch, (3, 3), dtype=self.dtype, name="convbn_hl1")(x, train)
        x = ConvBnAct(
            self.skip_channels, (1, 1), padding=[(0, 0), (0, 0)],
            dtype=self.dtype, name="convbn_hl2",
        )(x, train)
        x = upsample(x, 2, "nearest")
        att_hl = ChannelSE(
            self.skip_channels, self.reduction, dtype=self.dtype, name="se_hl"
        )(x)
        att_ll = ChannelSE(
            self.skip_channels, self.reduction, dtype=self.dtype, name="se_ll"
        )(skip)
        x = x * (att_hl + att_ll)
        x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn1")(x, train)
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn2")(x, train)
        return x


class MAnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    reduction: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        feats = features[1:][::-1]  # [C5, C4, C3, C2, C1]
        x = PAB(feats[0].shape[-1], dtype=self.dtype, name="pab")(feats[0], train)
        skips = feats[1:] + [None]
        for i, ch in enumerate(self.decoder_channels):
            skip = skips[i]
            if skip is not None:
                x = MFAB(
                    ch, skip.shape[-1], self.reduction, dtype=self.dtype,
                    name=f"mfab{i}",
                )(x, skip, train)
            else:
                x = UnetDecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                    x, None, train
                )
        return x
