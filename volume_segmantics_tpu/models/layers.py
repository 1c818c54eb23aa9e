"""Shared Flax building blocks for encoders/decoders.

All modules are NHWC (TPU-native layout). `dtype` is the compute dtype
(bfloat16 by default in the trainer for MXU throughput); parameters are
always stored float32. BatchNorm statistics are computed in float32 for
stability and the result is cast back to the compute dtype.

Naming convention: convolution submodules carry "conv" in their names and
norms carry "bn"/"norm" — the trainer's encoder-freeze predicate matches
parameter paths containing both "encoder" and "conv", mirroring the
reference's named_parameters filter (reference
model/operations/vol_seg_2d_trainer.py:102-116).
"""

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def space_to_depth_conv2d(x, kernel, padding, bias=None):
    """Exact stride-2 NHWC conv computed via 2x2 space-to-depth.

    A stride-2 conv over a tiny input channel count (the network stem:
    C_in = 1 grayscale) cannot feed the MXU — the contraction size is
    kh*kw*C_in and the systolic array idles (measured 35 ms/batch for
    ResNet's 7x7/2 stem at (32,512,512,1) on v5e, ~38% of the whole
    forward). Rewriting input and kernel through 2x2 space-to-depth turns
    it into a stride-1 conv at quarter the spatial positions with 4x the
    input channels — mathematically identical, MXU-friendly.

    Args:
        x: (N, H, W, C) input.
        kernel: (kh, kw, C, O) HWIO weights (the ORIGINAL stride-2 kernel).
        padding: ((pt, pb), (pl, pr)) as the direct conv would pad.
        bias: optional (O,) bias.
    Returns exactly conv(x, kernel, stride 2, padding).
    """
    import jax.lax as lax

    n, h, w, cin = x.shape
    kh, kw, _, cout = kernel.shape
    (pt, pb), (pl, pr) = padding
    oh = (h + pt + pb - kh) // 2 + 1
    ow = (w + pl + pr - kw) // 2 + 1
    # Lift the kernel to even spatial size (extra taps are zero).
    kh2 = kh + (kh % 2)
    kw2 = kw + (kw % 2)
    kpad = jnp.pad(kernel, ((0, kh2 - kh), (0, kw2 - kw), (0, 0), (0, 0)))
    # Pad the input so (a) the top/left alignment matches the direct conv
    # and (b) the padded dims are even and large enough for the lifted
    # kernel's overhang. Extra bottom/right zeros never reach the sliced
    # output rows.
    hp = max(h + pt + pb, 2 * (oh - 1 + kh2 // 2))
    hp += hp % 2
    wp = max(w + pl + pr, 2 * (ow - 1 + kw2 // 2))
    wp += wp % 2
    xp = jnp.pad(x, ((0, 0), (pt, hp - h - pt), (pl, wp - w - pl), (0, 0)))
    z = xp.reshape(n, hp // 2, 2, wp // 2, 2, cin)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, hp // 2, wp // 2, 4 * cin)
    w2 = kpad.reshape(kh2 // 2, 2, kw2 // 2, 2, cin, cout)
    w2 = w2.transpose(0, 2, 1, 3, 4, 5).reshape(kh2 // 2, kw2 // 2, 4 * cin, cout)
    y = lax.conv_general_dilated(
        z, w2.astype(z.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[:, :oh, :ow, :]
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class StemConv(nn.Module):
    """Drop-in stride-2 stem convolution with nn.Conv's exact parameter
    structure ("kernel" HWIO + optional "bias") computed through
    `space_to_depth_conv2d`. Use for stride-2 convs with tiny C_in."""

    features: int
    kernel_size: Tuple[int, int]
    padding: Any  # ((pt, pb), (pl, pr)) or "SAME"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
            if self.use_bias else None
        )
        padding = self.padding
        if padding == "SAME":
            # stride-2 SAME (torch/flax convention for even input)
            h, w = x.shape[1], x.shape[2]
            total_h = max((-h) % 2 + kh - 2, 0) if h % 2 == 0 else kh - 1
            total_w = max((-w) % 2 + kw - 2, 0) if w % 2 == 0 else kw - 1
            padding = (
                (total_h // 2, total_h - total_h // 2),
                (total_w // 2, total_w - total_w // 2),
            )
        return space_to_depth_conv2d(
            x.astype(self.dtype), kernel.astype(self.dtype), padding, bias
        )


def upsample2_conv3x3_phase(
    x, skip, kernel, dtype, bias=None, depth_to_space=True
):
    """conv3x3_SAME(concat(up2_nearest(x), skip)) WITHOUT materializing the
    upsampled tensor or the concatenation (the decoder mirror of
    `space_to_depth_conv2d`).

    The nearest x2 upsample makes output pixel (2i+dy, 2j+dx) read source
    rows {i-1, i} (dy=0) or {i, i+1} (dy=1) — taps that share a source row
    collapse by summing their weights. Each of the four (dy, dx) phases is
    therefore a 2x2 conv directly on the LOW-RES tensor; the four phase
    kernels are embedded at offset (dy, dx) into one 3x3 conv with 4x the
    output channels, followed by a depth-to-space interleave. The skip
    (already full-res) contributes an ordinary conv with its kernel slice,
    fused in by the elementwise add. Profile evidence: the materialized
    up2 broadcast + its reduce-sum backward alone cost ~2.1 ms/step at
    batch 128 (HBM-bound, zero FLOPs), plus the concat write/read.

    The phase kernels are built by differentiable slicing/summation of the
    ORIGINAL (3, 3, Cx+Cs, O) parameter, so the parameter tree, init and
    checkpoint format are unchanged and gradients flow to the same
    weights. Weight sums happen in f32 before the compute-dtype cast, so
    results match the materializing path to ~1 ulp (not bit-identical).

    Args:
        x: (N, h, w, Cx) low-res input (h, w even output halves).
        skip: (N, 2h, 2w, Cs) full-res skip or None.
        kernel: (3, 3, Cx+Cs, O) float32 HWIO weights.
        dtype: compute dtype for the convs.
        bias: optional (O,) bias.
        depth_to_space: when False (requires skip=None), skip the final
            interleave and return the raw phase tensor (N, h, w, 4*O) with
            phase-major channels — callers can run elementwise work there
            and interleave afterwards (see UpsampleConvBnAct).
    Returns (N, 2h, 2w, O) in `dtype`: exactly (to ~1 ulp) the SAME-padded
    3x3 conv over concat(up2(x), skip).
    """
    import jax.lax as lax

    n, h, w, cx = x.shape
    out = kernel.shape[-1]
    kx = kernel[:, :, :cx, :]
    # Row/column tap-combination matrices: phase 0 reads offsets {-1, 0}
    # (weight rows {k0, k1+k2}), phase 1 reads {0, +1} ({k0+k1, k2}).
    r0 = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], kernel.dtype)
    r1 = jnp.asarray([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], kernel.dtype)
    rows = (r0, r1)
    embeds = []
    for dy in (0, 1):
        for dx in (0, 1):
            p = jnp.einsum("au,bv,uvio->abio", rows[dy], rows[dx], kx)
            embeds.append(
                jnp.pad(p, ((dy, 1 - dy), (dx, 1 - dx), (0, 0), (0, 0)))
            )
    k_all = jnp.concatenate(embeds, axis=-1)  # (3, 3, Cx, 4*O)
    y4 = lax.conv_general_dilated(
        x.astype(dtype), k_all.astype(dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if not depth_to_space:
        assert skip is None and bias is None
        return y4
    y = y4.reshape(n, h, w, 2, 2, out).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(n, 2 * h, 2 * w, out)
    if skip is not None:
        ks = kernel[:, :, cx:, :]
        y = y + lax.conv_general_dilated(
            skip.astype(dtype), ks.astype(dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


class BnAct(nn.Module):
    """BatchNorm -> activation with bf16-only residuals.

    Numerically replicates flax ``nn.BatchNorm`` (f32 fast-variance batch
    statistics with the negative-variance clip, momentum EMA of running
    stats, the same f32 normalize op order, final cast to the compute
    dtype) and creates the identical parameter/variable tree (params
    ``scale``/``bias``, batch_stats ``mean``/``var``), so checkpoints and
    torch conversion are untouched.

    The one behavioural difference is performance-only: the normalize is
    computed in AFFINE form (see ``bn_apply_act``), so autodiff's saved
    residual is the (bf16) input plus tiny per-channel vectors instead of
    the full-resolution f32 ``(x - mean)`` intermediate that flax's op
    order forces XLA to materialize for the backward pass — at batch 128
    the decoder's f32[128,256,256,16] residuals alone are ~1 GB of HBM
    traffic per step (profiled: the forward conv fusions emitted
    (f32, bf16) output pairs and backward weight-gradient convs re-read
    the f32 copies). A ``jax.checkpoint`` wrapper was tried first and
    REGRESSED (65.8 -> 69.7 ms noaug step @ b128: rematerialization
    showed up as extra elementwise fusions); the affine form measured
    64.2 ms with no recompute at all.
    """

    act: Optional[Callable] = nn.relu
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32
    # >1: the channel axis holds `phase_groups` phase-major copies of the
    # logical features (see UpsampleConvBnAct); statistics pool the groups
    # and scale/bias/stats are tiled across them for the apply.
    phase_groups: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        g = self.phase_groups
        feat = x.shape[-1] // g
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if train:
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            mu2 = (xf * xf).mean(axes)
            if g > 1:
                mean = mean.reshape(g, feat).mean(0)
                mu2 = mu2.reshape(g, feat).mean(0)
            var = jnp.maximum(0.0, mu2 - mean * mean)
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        else:
            mean, var = ra_mean.value, ra_var.value
        if g > 1:
            mean, var = jnp.tile(mean, g), jnp.tile(var, g)
            scale, bias = jnp.tile(scale, g), jnp.tile(bias, g)
        return bn_apply_act(
            x, mean, var, scale, bias, self.epsilon, self.act, self.dtype
        )


def bn_apply_act(x, mean, var, scale, bias, epsilon, act, out_dtype):
    """Elementwise BN-normalize + activation in affine form (see BnAct).

    Computed as ``x*mul + (bias - mean*mul)`` instead of flax's
    ``(x - mean)*mul + bias``: mathematically identical (f32 reassociation,
    ~1 ulp), but the product's autodiff partials are the INPUTS (bf16 x and
    the tiny per-channel mul) rather than the f32 intermediate (x - mean),
    so no full-resolution f32 residual is saved for the backward pass.
    """
    mul = jax.lax.rsqrt(var + epsilon) * scale
    y = x.astype(jnp.float32) * mul + (bias - mean * mul)
    y = y.astype(out_dtype)
    return y if act is None else act(y)


class UpsampleConvBnAct(nn.Module):
    """Fused `up2_nearest -> concat skip -> conv3x3 -> BN -> act` decoder
    head with ConvBnAct's exact parameter structure (`conv/kernel` +
    `bn/*`), computed through `upsample2_conv3x3_phase`.

    When there is no skip, BN + activation run in the PHASE layout
    (N, h, w, 4*O) emitted by the phase conv — batch statistics pool the
    four phase groups (identical values up to f32 reassociation, since
    every output pixel belongs to exactly one phase) and scale/bias are
    tiled 4x — so the depth-to-space interleave copies the final bf16
    activations instead of a pre-BN f32 tensor (profiled at 2x the bytes
    and ~1.6 ms/step for the full-resolution decoder block at batch 128).
    """

    features: int
    act: Optional[Callable] = nn.relu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        cin = x.shape[-1] + (skip.shape[-1] if skip is not None else 0)
        kernel = _Conv3x3Params(self.features, cin, name="conv")()
        if skip is not None:
            y = upsample2_conv3x3_phase(x, skip, kernel, self.dtype)
            return BnAct(act=self.act, dtype=self.dtype, name="bn")(y, train)
        n, h, w, _ = x.shape
        out = self.features
        y4 = upsample2_conv3x3_phase(
            x, None, kernel, self.dtype, depth_to_space=False
        )  # (N, h, w, 4*O), phase-major channels
        y4 = BnAct(act=self.act, dtype=self.dtype, phase_groups=4, name="bn")(
            y4, train
        )
        y = y4.reshape(n, h, w, 2, 2, out).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(n, 2 * h, 2 * w, out)


class _Conv3x3Params(nn.Module):
    """Parameter container with nn.Conv's naming/init ("kernel", HWIO,
    lecun_normal) so `UpsampleConvBnAct`'s tree is byte-compatible with
    the ConvBnAct it replaces."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
            jnp.float32,
        )


class ConvBnAct(nn.Module):
    """conv (no bias) -> BatchNorm -> activation; smp's Conv2dReLU analogue."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SYMMETRIC_K2"  # symmetric k//2 padding (torch default)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    act: Optional[Callable] = nn.relu
    use_norm: bool = True
    use_bias: Optional[bool] = None  # None -> bias iff no norm (torch Conv2dReLU)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        padding = self.padding
        if padding == "SYMMETRIC_K2":
            kh, kw = self.kernel_size
            dh, dw = self.dilation
            ph = ((kh - 1) * dh) // 2
            pw = ((kw - 1) * dw) // 2
            padding = [(ph, ph), (pw, pw)]
        use_bias = self.use_bias if self.use_bias is not None else not self.use_norm
        if (
            self.strides == (2, 2)
            and self.dilation == (1, 1)
            and self.groups == 1
            and x.shape[-1] <= 4
            and not isinstance(padding, str)
        ):
            # Tiny-C_in stride-2 stem: space-to-depth keeps the MXU fed
            # (identical params/results, see space_to_depth_conv2d).
            x = StemConv(
                self.features, self.kernel_size, tuple(map(tuple, padding)),
                use_bias=use_bias, dtype=self.dtype, name="conv",
            )(x)
        else:
            x = nn.Conv(
                self.features,
                self.kernel_size,
                strides=self.strides,
                padding=padding,
                kernel_dilation=self.dilation,
                feature_group_count=self.groups,
                use_bias=use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.use_norm:
            return BnAct(act=self.act, dtype=self.dtype, name="bn")(x, train)
        if self.act is not None:
            x = self.act(x)
        return x


def upsample(x: jnp.ndarray, factor: int = 2, method: str = "nearest") -> jnp.ndarray:
    """NHWC spatial upsampling (replaces torch F.interpolate).

    Integer-factor nearest upsampling is written as broadcast + reshape:
    jax.image.resize lowers nearest to a gather, which measured ~100x slower
    on TPU v5e (57 ms vs 0.5 ms for (32,256,256,16) x2) — and this op sits
    in every U-Net/U-Net++/FPN/MA-Net decoder block."""
    n, h, w, c = x.shape
    if method == "nearest":
        x = jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, factor, w, factor, c)
        )
        return x.reshape(n, h * factor, w * factor, c)
    import jax

    return jax.image.resize(x, (n, h * factor, w * factor, c), method=method).astype(
        x.dtype
    )


def _align_corners_matrix(out_len: int, in_len: int) -> jnp.ndarray:
    """(out_len, in_len) interpolation weights for torch's
    align_corners=True bilinear mapping (src = i * (in-1)/(out-1))."""
    if in_len == 1:
        return jnp.ones((out_len, 1), jnp.float32)
    src = jnp.arange(out_len, dtype=jnp.float32) * (in_len - 1) / (out_len - 1)
    i0 = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_len - 2)
    frac = src - i0
    w = jnp.zeros((out_len, in_len), jnp.float32)
    w = w.at[jnp.arange(out_len), i0].add(1.0 - frac)
    w = w.at[jnp.arange(out_len), i0 + 1].add(frac)
    return w


def resize_to(
    x: jnp.ndarray,
    out_h: int,
    out_w: int,
    method: str = "bilinear",
    align_corners: bool = False,
) -> jnp.ndarray:
    """Resize NHWC tensor to an explicit spatial shape.

    Bilinear upsampling is expressed as two small dense matmuls
    (out = W_h @ x @ W_w^T per image/channel) instead of jax.image.resize's
    gather lowering — the same ~100x TPU win as the nearest-upsample
    broadcast trick, riding the MXU. With align_corners=False the weight
    matrices are built by resizing identity matrices through
    jax.image.resize itself (half-pixel mapping); with align_corners=True
    they follow torch's nn.UpsamplingBilinear2d mapping — the convention
    smp's SegmentationHead and DeepLabV3+ decoder use, which the parity
    oracle (tests/test_torch_oracle.py) pins. Either way the matrices are
    shape-static constants folded at compile time. Used by the
    FPN/DeepLabV3/V3+ heads to reach full resolution (registry.py:107-115).
    """
    import jax

    n, in_h, in_w, c = x.shape
    if method == "bilinear" and align_corners:
        # resize_align_corners implements torch's align_corners=True mapping
        # for any output size (up or down) — never silently fall through to
        # the half-pixel path.
        return resize_align_corners(x, out_h, out_w)
    if method == "bilinear" and out_h >= in_h and out_w >= in_w:
        w_h = jax.image.resize(
            jnp.eye(in_h, dtype=jnp.float32), (out_h, in_h),
            method="bilinear"
        )
        w_w = jax.image.resize(
            jnp.eye(in_w, dtype=jnp.float32), (out_w, in_w),
            method="bilinear"
        )
        y = jnp.einsum(
            "nhwc,Hh->nHwc", x, w_h.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        y = jnp.einsum(
            "nHwc,Ww->nHWc", y.astype(x.dtype), w_w.astype(x.dtype),
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype)
    return jax.image.resize(x, (n, out_h, out_w, c), method=method).astype(x.dtype)


def resize_align_corners(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize with torch's align_corners=True coordinate mapping
    (source position = i * (in-1)/(out-1)), NHWC. PAN's interpolations use
    this convention (smp PAN blocks pass align_corners=True), which
    jax.image.resize's half-pixel mapping does not reproduce.

    Expressed as two small matmuls against shape-static interpolation
    matrices (`_align_corners_matrix`) so it rides the MXU instead of
    jnp.take's slow TPU gather lowering — the same trick as resize_to."""
    n, in_h, in_w, c = x.shape
    if in_h == out_h and in_w == out_w:
        return x
    y = x
    if in_h != out_h:
        w_h = (
            jnp.ones((out_h, 1), jnp.float32)
            if in_h == 1 else _align_corners_matrix(out_h, in_h)
        )
        y = jnp.einsum(
            "nhwc,Hh->nHwc", y, w_h.astype(y.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if in_w != out_w:
        w_w = (
            jnp.ones((out_w, 1), jnp.float32)
            if in_w == 1 else _align_corners_matrix(out_w, in_w)
        )
        y = jnp.einsum(
            "nHwc,Ww->nHWc", y, w_w.astype(y.dtype),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    return y


def max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2, padding=((1, 1), (1, 1))):
    """Max pooling with explicit symmetric padding (torch MaxPool2d(3,2,1))."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((padding[0][0], padding[0][1]), (padding[1][0], padding[1][1])),
    )


def global_avg_pool(x: jnp.ndarray, keepdims: bool = True) -> jnp.ndarray:
    return jnp.mean(x, axis=(1, 2), keepdims=keepdims)


class SqueezeExcite(nn.Module):
    """SE block (used by EfficientNet and ResNeSt-adjacent models)."""

    features: int
    se_features: int
    gate: Callable = nn.sigmoid
    act: Callable = nn.silu
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s = global_avg_pool(x)
        s = nn.Conv(self.se_features, (1, 1), dtype=self.dtype, name="conv_reduce")(s)
        s = self.act(s)
        s = nn.Conv(self.features, (1, 1), dtype=self.dtype, name="conv_expand")(s)
        return x * self.gate(s)


class SCSEModule(nn.Module):
    """Concurrent spatial & channel SE (smp attention option)."""

    in_channels: int
    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = global_avg_pool(x)
        c = nn.Conv(
            self.in_channels // self.reduction, (1, 1), dtype=self.dtype, name="conv_c1"
        )(c)
        c = nn.relu(c)
        c = nn.Conv(self.in_channels, (1, 1), dtype=self.dtype, name="conv_c2")(c)
        cse = x * nn.sigmoid(c)
        s = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv_s")(x)
        sse = x * nn.sigmoid(s)
        return cse + sse
