"""PAN (Pyramid Attention Network) decoder in Flax, NHWC.

Structure matches smp.PAN as dispatched by the reference
(reference model/model_2d.py:36-38): a Feature Pyramid Attention (FPA)
module on the deepest (dilated, stride-16) feature, followed by three
Global Attention Upsample (GAU) blocks against C3/C2/C1. Decoder channels
32, head upsamples x4. The reference documents that ResNeSt encoders are
incompatible with PAN (reference README.md:76) — the factory enforces this.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, resize_to


class FPA(nn.Module):
    """Feature Pyramid Attention: global pooling branch + mid 1x1 branch
    modulated by a 7x7/5x5/3x3 downsampling pyramid."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        mid = self.features

        # Global branch
        glob = jnp.mean(x, axis=(1, 2), keepdims=True)
        glob = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                       name="conv_global")(glob)
        glob = jnp.broadcast_to(glob, (n, h, w, mid))

        # Mid branch
        midb = ConvBnAct(
            mid, (1, 1), padding=[(0, 0), (0, 0)], act=None, dtype=self.dtype,
            name="convbn_mid",
        )(x, train)

        # Pyramid branch: successive stride-2 convs with 7/5/3 kernels
        d1 = ConvBnAct(1, (7, 7), strides=(2, 2), dtype=self.dtype,
                       name="convbn_d1")(x, train)
        d2 = ConvBnAct(1, (5, 5), strides=(2, 2), dtype=self.dtype,
                       name="convbn_d2")(d1, train)
        d3 = ConvBnAct(1, (3, 3), strides=(2, 2), dtype=self.dtype,
                       name="convbn_d3")(d2, train)
        d3 = ConvBnAct(1, (3, 3), dtype=self.dtype, name="convbn_d3b")(d3, train)
        d3_up = resize_to(d3, d2.shape[1], d2.shape[2], "bilinear")
        d2 = ConvBnAct(1, (5, 5), dtype=self.dtype, name="convbn_d2b")(d2, train)
        d2 = d2 + d3_up
        d2_up = resize_to(d2, d1.shape[1], d1.shape[2], "bilinear")
        d1 = ConvBnAct(1, (7, 7), dtype=self.dtype, name="convbn_d1b")(d1, train)
        d1 = d1 + d2_up
        att = resize_to(d1, h, w, "bilinear")

        out = midb * att + glob.astype(midb.dtype)
        return out


class GAU(nn.Module):
    """Global Attention Upsample: low-level features gated by global context
    of the high-level features, added to the upsampled high-level path."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_low, y_high, train: bool = False):
        y_up = resize_to(y_high, x_low.shape[1], x_low.shape[2], "bilinear")
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn_low")(
            x_low, train
        )
        g = jnp.mean(y_high, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv_gate")(g)
        g = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn_gate",
        )(g)
        g = nn.sigmoid(g).astype(x.dtype)
        z = x * g
        return y_up + z


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
