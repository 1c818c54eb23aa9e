"""U-Net++ decoder (nested dense skip connections) in Flax, NHWC.

Structure matches smp.UnetPlusPlus as dispatched by the reference
(reference model/model_2d.py:18-20): a dense grid of decoder blocks where
node X(i, j) consumes the upsampled X(i+1, j-1) concatenated with all
same-depth predecessors X(i, 0..j-1) plus the encoder skip.
Decoder channels (256, 128, 64, 32, 16).
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, upsample


class UnetPPBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        x = upsample(x, 2, "nearest")
        if skips:
            x = jnp.concatenate(
                [x] + [s.astype(x.dtype) for s in skips], axis=-1
            )
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn1")(x, train)
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn2")(x, train)
        return x


class UnetPlusPlusDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        # Encoder pyramid: [C0, C1(s2), C2(s4), C3(s8), C4(s16), C5(s32)].
        # Grid nodes X[depth][col]; depth d sits at stride 2^(d+1) with
        # X[d][0] = C(d+1). Column j of depth d upsamples X[d+1][j-1] and
        # concatenates X[d][0..j-1].
        enc = features[1:]  # [C1..C5], depths 0..4
        n = len(enc) - 1  # 4 columns of computation
        grid = {(d, 0): enc[d] for d in range(len(enc))}
        # smp dense_x ordering: for each layer_idx (column-ish), blocks run
        # from deep to shallow; channels follow decoder_channels by depth.
        for j in range(1, n + 1):
            for d in range(n - j, -1, -1):
                # Depth d node emits decoder_channels[(n-1) - d] features
                # (same per-depth widths as the plain U-Net decoder).
                ch = self.decoder_channels[(n - 1) - d]
                skips = [grid[(d, k)] for k in range(j)]
                grid[(d, j)] = UnetPPBlock(
                    ch, dtype=self.dtype, name=f"block_{d}_{j}"
                )(grid[(d + 1, j - 1)], skips, train)
        # Final full-resolution block: upsample X[0][n] with no skips
        # (reaches stride 1), mirroring the last Unet block.
        out = UnetPPBlock(
            self.decoder_channels[-1], dtype=self.dtype, name="block_final"
        )(grid[(0, n)], [], train)
        return out
