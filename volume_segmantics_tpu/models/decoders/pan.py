"""PAN (Pyramid Attention Network) decoder in Flax, NHWC.

Structurally exact re-implementation of smp.PAN's decoder as dispatched by
the reference (reference model/model_2d.py:36-38), so reference checkpoints
convert leaf-for-leaf:

- FPA on the deepest (dilated, stride-16) feature: a global-pool branch, a
  1x1 mid branch, and a 7x7/5x5/3x3 max-pool pyramid of single-channel
  attention convs, combined ``mid * attention + global``.
- Three GAU blocks against C4/C3/C2 (decoder_channels=32 everywhere).
- All convs follow smp PAN's ConvBnRelu: conv WITH bias + BatchNorm
  (+ ReLU unless ``add_relu=False``); interpolation is bilinear with
  torch's ``align_corners=True`` mapping.

The reference documents that ResNeSt encoders are incompatible with PAN
(reference README.md:76) — the factory enforces this.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, resize_align_corners


def _cbr(features, kernel, name, add_relu=True, dtype=jnp.float32):
    """smp PAN ConvBnRelu: conv (bias=True) + BN (+ ReLU)."""
    k = (kernel, kernel)
    return ConvBnAct(
        features, k, act=nn.relu if add_relu else None, use_bias=True,
        dtype=dtype, name=name,
    )


def _pool2(x):
    # smp uses MaxPool2d(2, 2); degrade to identity once a spatial dim is
    # too small to pool (torch would produce an empty tensor and crash —
    # identical numerics for all real input sizes, >=128 px at stride 16).
    if x.shape[1] < 2 or x.shape[2] < 2:
        return x
    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


class FPA(nn.Module):
    """Feature Pyramid Attention (smp PAN FPABlock)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        mid_ch = self.features

        # Global pooling branch: pool -> 1x1 ConvBnRelu -> upsample to (h, w)
        glob = jnp.mean(x, axis=(1, 2), keepdims=True)
        glob = _cbr(mid_ch, 1, "branch1", dtype=self.dtype)(glob, train)
        glob = jnp.broadcast_to(glob, (n, h, w, mid_ch))

        # Mid branch: 1x1 ConvBnRelu
        midb = _cbr(mid_ch, 1, "mid", dtype=self.dtype)(x, train)

        # Attention pyramid: maxpool-2 downsampling, 7/5/3 kernels, 1 channel
        x1 = _cbr(1, 7, "down1", dtype=self.dtype)(_pool2(x), train)
        x2 = _cbr(1, 5, "down2", dtype=self.dtype)(_pool2(x1), train)
        x3 = _cbr(1, 3, "down3a", dtype=self.dtype)(_pool2(x2), train)
        x3 = _cbr(1, 3, "down3b", dtype=self.dtype)(x3, train)

        x3 = resize_align_corners(x3, max(h // 4, 1), max(w // 4, 1))
        x2 = _cbr(1, 5, "conv2", dtype=self.dtype)(x2, train)
        att = x2 + x3
        att = resize_align_corners(att, max(h // 2, 1), max(w // 2, 1))
        x1 = _cbr(1, 7, "conv1", dtype=self.dtype)(x1, train)
        att = att + x1
        att = resize_align_corners(att, h, w)

        return midb * att + glob.astype(midb.dtype)


class GAU(nn.Module):
    """Global Attention Upsample (smp PAN GAUBlock): low-level features
    gated by global context of the high-level features, added to the
    align-corners-upsampled high-level path."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, y_high, train: bool = False):
        y_up = resize_align_corners(y_high, x_low.shape[1], x_low.shape[2])
        x = _cbr(self.features, 3, "conv2", dtype=self.dtype)(x_low, train)
        g = jnp.mean(y_high, axis=(1, 2), keepdims=True)
        g = _cbr(self.features, 1, "conv1", add_relu=False, dtype=self.dtype)(
            g, train
        )
        g = nn.sigmoid(g).astype(x.dtype)
        return y_up + x * g


class PANDecoder(nn.Module):
    decoder_channels: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        c2, c3, c4, c5 = features[2], features[3], features[4], features[5]
        x = FPA(self.decoder_channels, dtype=self.dtype, name="fpa")(c5, train)
        x = GAU(self.decoder_channels, dtype=self.dtype, name="gau3")(c4, x, train)
        x = GAU(self.decoder_channels, dtype=self.dtype, name="gau2")(c3, x, train)
        x = GAU(self.decoder_channels, dtype=self.dtype, name="gau1")(c2, x, train)
        return x  # stride 4; the head upsamples x4
