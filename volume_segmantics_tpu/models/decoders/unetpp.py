"""U-Net++ decoder (nested dense skip connections) in Flax, NHWC.

Structurally exact re-implementation of the decoder smp.UnetPlusPlus builds
as dispatched by the reference (reference model/model_2d.py:18-20), so that
reference ``.pytorch`` checkpoints convert leaf-for-leaf:

- Nodes are named ``x_{a}_{b}`` exactly as in smp's ``dense_x`` grid, where
  ``b`` is the dense level (output resolution of encoder skip ``b+1`` in
  deep-to-shallow order) and ``b - a`` is the column.
- Output widths follow smp's plan: ``a == 0`` nodes emit
  ``decoder_channels[b]``; interior nodes (``a > 0``) keep the *encoder
  skip width* of their level.
- Skip concatenation order is smp's: previously computed same-level nodes
  newest-first, then the raw encoder skip last.
"""

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import ConvBnAct, UpsampleConvBnAct


class UnetPPBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, skips, train: bool = False):
        # Dense skips are all full-res; concatenating just them (not the
        # upsampled x) lets the up2 -> concat -> conv3x3 collapse into the
        # phase-decomposed fused head (layers.py:upsample2_conv3x3_phase).
        # smp's concat order ([up2(x)] + skips) is preserved because the
        # fused head's kernel slices put x's channels first.
        skip = (
            jnp.concatenate([s.astype(x.dtype) for s in skips], axis=-1)
            if skips
            else None
        )
        x = UpsampleConvBnAct(self.features, dtype=self.dtype, name="convbn1")(
            x, skip, train
        )
        x = ConvBnAct(self.features, (3, 3), dtype=self.dtype, name="convbn2")(x, train)
        return x


class UnetPlusPlusDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features, train: bool = False):
        # Deep-to-shallow skip list: feats[0] = deepest encoder output.
        feats = list(features[1:][::-1])
        depth = len(feats) - 1  # 4 dense levels of computation
        skip_ch = [f.shape[-1] for f in feats[1:]] + [0]
        dense = {}
        for layer in range(depth):
            for a in range(depth - layer):
                b = a + layer
                out_ch = self.decoder_channels[b] if a == 0 else skip_ch[b]
                if layer == 0:
                    x_in, skips = feats[a], [feats[a + 1]]
                else:
                    x_in = dense[(a, b - 1)]
                    skips = [dense[(i, b)] for i in range(a + 1, b + 1)]
                    skips.append(feats[b + 1])
                dense[(a, b)] = UnetPPBlock(
                    out_ch, dtype=self.dtype, name=f"x_{a}_{b}"
                )(x_in, skips, train)
        # Final full-resolution node: upsample to stride 1, no skips.
        return UnetPPBlock(
            self.decoder_channels[-1], dtype=self.dtype, name=f"x_0_{depth}"
        )(dense[(0, depth - 1)], [], train)
