"""Pure-torch functional forwards mirroring segmentation_models_pytorch.

Independent numerical oracle (closes BASELINE.json's "voxel-for-voxel within
argmax ties" claim): these functions implement smp's eval-mode forward
semantics for reference (architecture, encoder) pairs using ONLY
torch.nn.functional plus a state dict carrying smp's parameter names — no
smp / torchvision import, no nn.Module construction. They are written from
the smp 0.2.x / torchvision architecture definitions the reference dispatches
to (reference model/model_2d.py:15-38), so a Flax forward that matches them
on a shared checkpoint is proven faithful to the reference's conv / BN /
padding / upsample numerics, independent of the weight-converter code under
test.
"""

import math

import numpy as np
import torch
import torch.nn.functional as F

BN_EPS = 1e-5


def _t(sd, name):
    # ascontiguousarray: inverse converters may hand over np.flip views
    # (negative strides), which torch.as_tensor rejects.
    return torch.as_tensor(
        np.ascontiguousarray(np.asarray(sd[name])), dtype=torch.float32
    )


def _bn(x, sd, pre, eps=BN_EPS):
    """Eval-mode BatchNorm with running statistics."""
    return F.batch_norm(
        x,
        _t(sd, f"{pre}.running_mean"),
        _t(sd, f"{pre}.running_var"),
        _t(sd, f"{pre}.weight"),
        _t(sd, f"{pre}.bias"),
        training=False,
        eps=eps,
    )


def _conv(x, sd, pre, stride=1, padding=0, dilation=1, groups=1):
    bias = _t(sd, f"{pre}.bias") if f"{pre}.bias" in sd else None
    return F.conv2d(
        x, _t(sd, f"{pre}.weight"), bias, stride, padding, dilation, groups
    )


def _cbr(x, sd, conv_name, bn_name, padding=1):
    """smp Conv2dReLU: conv (no bias) -> BN -> ReLU."""
    return F.relu(_bn(_conv(x, sd, conv_name, padding=padding), sd, bn_name))


# ---------------------------------------------------------------------------
# ResNet encoder (smp.encoders.resnet.ResNetEncoder semantics)
# ---------------------------------------------------------------------------


def _basic_block(x, sd, pre, stride, rate):
    out = F.relu(
        _bn(
            _conv(x, sd, f"{pre}.conv1", stride=stride, padding=rate,
                  dilation=rate),
            sd, f"{pre}.bn1",
        )
    )
    out = _bn(
        _conv(out, sd, f"{pre}.conv2", padding=rate, dilation=rate),
        sd, f"{pre}.bn2",
    )
    identity = x
    if f"{pre}.downsample.0.weight" in sd:
        identity = _bn(
            _conv(x, sd, f"{pre}.downsample.0", stride=stride),
            sd, f"{pre}.downsample.1",
        )
    return F.relu(out + identity)


def _bottleneck_block(x, sd, pre, stride, rate, groups=1):
    out = F.relu(_bn(_conv(x, sd, f"{pre}.conv1"), sd, f"{pre}.bn1"))
    out = F.relu(
        _bn(
            _conv(out, sd, f"{pre}.conv2", stride=stride, padding=rate,
                  dilation=rate, groups=groups),
            sd, f"{pre}.bn2",
        )
    )
    out = _bn(_conv(out, sd, f"{pre}.conv3"), sd, f"{pre}.bn3")
    identity = x
    if f"{pre}.downsample.0.weight" in sd:
        identity = _bn(
            _conv(x, sd, f"{pre}.downsample.0", stride=stride),
            sd, f"{pre}.downsample.1",
        )
    return F.relu(out + identity)


def resnet_encoder_features(x, sd, bottleneck=False, groups=1, dilate=None):
    """smp ResNetEncoder.forward: 6 feature maps [identity, stem, layer1..4].

    `dilate` maps stage index (1-4) -> dilation rate, reproducing smp's
    `make_dilated` patch (utils.replace_strides_with_dilation): EVERY conv in
    a dilated stage gets stride 1 + the stage's dilation/padded-by-rate —
    including block 0 and the 1x1 downsample (this differs from torchvision's
    replace_stride_with_dilation, which keeps block 0 at the previous rate).
    """
    dilate = dilate or {}
    feats = [x]
    out = F.relu(
        _bn(_conv(x, sd, "encoder.conv1", stride=2, padding=3), sd, "encoder.bn1")
    )
    feats.append(out)
    out = F.max_pool2d(out, 3, 2, 1)
    for stage in (1, 2, 3, 4):
        rate = dilate.get(stage, 1)
        b = 0
        while f"encoder.layer{stage}.{b}.conv1.weight" in sd:
            pre = f"encoder.layer{stage}.{b}"
            stride = 2 if (b == 0 and stage > 1 and rate == 1) else 1
            if bottleneck:
                out = _bottleneck_block(out, sd, pre, stride, rate, groups)
            else:
                out = _basic_block(out, sd, pre, stride, rate)
            b += 1
        feats.append(out)
    return feats


# ---------------------------------------------------------------------------
# Decoders
# ---------------------------------------------------------------------------


def unet_decoder_forward(feats, sd):
    """smp UnetDecoder: head = deepest feature; per block: nearest x2
    upsample -> concat skip -> 2x Conv2dReLU."""
    f = feats[1:][::-1]
    x = f[0]
    skips = f[1:]
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in sd:
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if i < len(skips):
            x = torch.cat([x, skips[i]], dim=1)
        x = _cbr(x, sd, f"decoder.blocks.{i}.conv1.0", f"decoder.blocks.{i}.conv1.1")
        x = _cbr(x, sd, f"decoder.blocks.{i}.conv2.0", f"decoder.blocks.{i}.conv2.1")
        i += 1
    return x


def _sepconv(x, sd, pre, padding, dilation=1):
    """smp SeparableConv2d: Sequential(depthwise, pointwise 1x1)."""
    dw = _conv(x, sd, f"{pre}.0", padding=padding, dilation=dilation,
               groups=x.shape[1])
    return _conv(dw, sd, f"{pre}.1")


def _aspp_forward(x, sd, pre, separable, rates=(12, 24, 36)):
    """smp/torchvision ASPP (eval mode; Dropout inactive)."""
    res = [F.relu(_bn(_conv(x, sd, f"{pre}.convs.0.0"), sd, f"{pre}.convs.0.1"))]
    for i, rate in enumerate(rates, start=1):
        if separable:
            y = _sepconv(x, sd, f"{pre}.convs.{i}.0", padding=rate, dilation=rate)
        else:
            y = _conv(x, sd, f"{pre}.convs.{i}.0", padding=rate, dilation=rate)
        res.append(F.relu(_bn(y, sd, f"{pre}.convs.{i}.1")))
    # Image pooling: AdaptiveAvgPool2d(1) -> conv -> bn -> relu -> bilinear
    # resize back (from 1x1 the interpolation is a constant broadcast).
    p = x.mean(dim=(2, 3), keepdim=True)
    p = F.relu(_bn(_conv(p, sd, f"{pre}.convs.4.1"), sd, f"{pre}.convs.4.2"))
    res.append(p.expand(-1, -1, x.shape[2], x.shape[3]))
    y = torch.cat(res, dim=1)
    return F.relu(_bn(_conv(y, sd, f"{pre}.project.0"), sd, f"{pre}.project.1"))


def deeplabv3_decoder_forward(feats, sd):
    """smp DeepLabV3Decoder: Sequential(ASPP, conv3x3, BN, ReLU)."""
    y = _aspp_forward(feats[-1], sd, "decoder.0", separable=False)
    return F.relu(_bn(_conv(y, sd, "decoder.1", padding=1), sd, "decoder.2"))


def deeplabv3plus_decoder_forward(feats, sd):
    """smp DeepLabV3PlusDecoder (output_stride=16): separable ASPP ->
    separable 3x3 -> x4 bilinear (align_corners=True, nn.UpsamplingBilinear2d)
    -> concat 48-ch highres 1x1 branch -> separable 3x3 fuse."""
    y = _aspp_forward(feats[-1], sd, "decoder.aspp.0", separable=True)
    y = F.relu(
        _bn(_sepconv(y, sd, "decoder.aspp.1", padding=1), sd, "decoder.aspp.2")
    )
    y = F.interpolate(y, scale_factor=4, mode="bilinear", align_corners=True)
    high = F.relu(_bn(_conv(feats[-4], sd, "decoder.block1.0"),
                      sd, "decoder.block1.1"))
    y = torch.cat([y, high], dim=1)
    return F.relu(
        _bn(_sepconv(y, sd, "decoder.block2.0", padding=1), sd, "decoder.block2.1")
    )


# ---------------------------------------------------------------------------
# Whole models (encoder + decoder + segmentation head)
# ---------------------------------------------------------------------------


def _head(x, sd, kernel_size, upsampling):
    """smp SegmentationHead: conv(k, padding=k//2) -> UpsamplingBilinear2d
    (align_corners=True) -> identity activation."""
    y = _conv(x, sd, "segmentation_head.0", padding=kernel_size // 2)
    if upsampling > 1:
        y = F.interpolate(y, scale_factor=upsampling, mode="bilinear",
                          align_corners=True)
    return y


def smp_unet_forward(x, sd, bottleneck=False, groups=1):
    """smp.Unet(resnetXX) eval forward: (N, 1, H, W) float -> (N, C, H, W)."""
    feats = resnet_encoder_features(x, sd, bottleneck=bottleneck, groups=groups)
    return _head(unet_decoder_forward(feats, sd), sd, kernel_size=3, upsampling=1)


def smp_deeplabv3_forward(x, sd, bottleneck=False, groups=1):
    """smp.DeepLabV3(resnetXX): encoder dilated to output_stride=8
    (stages 3,4 at rates 2,4), ASPP decoder, head kernel 1, x8 upsample."""
    feats = resnet_encoder_features(
        x, sd, bottleneck=bottleneck, groups=groups, dilate={3: 2, 4: 4}
    )
    return _head(deeplabv3_decoder_forward(feats, sd), sd, kernel_size=1,
                 upsampling=8)


def smp_deeplabv3plus_forward(x, sd, bottleneck=False, groups=1):
    """smp.DeepLabV3Plus(resnetXX): encoder dilated to output_stride=16
    (stage 4 at rate 2), V3+ decoder, head kernel 1, x4 upsample."""
    feats = resnet_encoder_features(
        x, sd, bottleneck=bottleneck, groups=groups, dilate={4: 2}
    )
    return _head(deeplabv3plus_decoder_forward(feats, sd), sd, kernel_size=1,
                 upsampling=4)


def _gn(x, sd, pre, groups=32):
    return F.group_norm(x, groups, _t(sd, f"{pre}.weight"), _t(sd, f"{pre}.bias"))


def fpn_decoder_forward(feats, sd):
    """smp FPNDecoder: 1x1 lateral pyramid with nearest x2 top-down merge,
    per-level segmentation blocks (conv3x3 -> GroupNorm(32) -> ReLU, with
    n_upsamples = [3, 2, 1, 0] nearest x2 steps), summed ("add" policy)."""
    c2, c3, c4, c5 = feats[-4:]
    p5 = _conv(c5, sd, "decoder.p5")
    def fpn_block(p, skip, lvl):
        p = F.interpolate(p, scale_factor=2, mode="nearest")
        return p + _conv(skip, sd, f"decoder.p{lvl}.skip_conv")
    p4 = fpn_block(p5, c4, 4)
    p3 = fpn_block(p4, c3, 3)
    p2 = fpn_block(p3, c2, 2)
    out = None
    for i, (p, n_up) in enumerate(zip((p5, p4, p3, p2), (3, 2, 1, 0))):
        j = 0
        while f"decoder.seg_blocks.{i}.block.{j}.block.0.weight" in sd:
            pre = f"decoder.seg_blocks.{i}.block.{j}.block"
            p = F.relu(_gn(_conv(p, sd, f"{pre}.0", padding=1), sd, f"{pre}.1"))
            if n_up > 0:
                p = F.interpolate(p, scale_factor=2, mode="nearest")
            j += 1
        out = p if out is None else out + p
    return out


def linknet_decoder_forward(feats, sd):
    """smp LinknetDecoder: per block 1x1 Conv2dReLU -> TransposeX2
    (ConvTranspose2d k4 s2 p1 + BN + ReLU) -> 1x1 Conv2dReLU, summed with
    the skip."""
    f = feats[1:][::-1]
    x = f[0]
    skips = f[1:]
    i = 0
    while f"decoder.blocks.{i}.block.0.0.weight" in sd:
        t = f"decoder.blocks.{i}.block"
        x = F.relu(_bn(_conv(x, sd, f"{t}.0.0"), sd, f"{t}.0.1"))
        x = F.conv_transpose2d(x, _t(sd, f"{t}.1.0.weight"), None, stride=2,
                               padding=1)
        x = F.relu(_bn(x, sd, f"{t}.1.1"))
        x = F.relu(_bn(_conv(x, sd, f"{t}.2.0"), sd, f"{t}.2.1"))
        if i < len(skips) and skips[i] is not None:
            x = x + skips[i]
        i += 1
    return x


def smp_fpn_forward(x, sd, bottleneck=False, groups=1):
    """smp.FPN(resnetXX): default encoder (os 32), FPN decoder, head
    kernel 1, x4 bilinear upsample (align_corners=True)."""
    feats = resnet_encoder_features(x, sd, bottleneck=bottleneck, groups=groups)
    return _head(fpn_decoder_forward(feats, sd), sd, kernel_size=1,
                 upsampling=4)


def smp_linknet_forward(x, sd, bottleneck=False, groups=1):
    """smp.Linknet(resnetXX): default encoder, Linknet decoder, head
    kernel 1, no upsample."""
    feats = resnet_encoder_features(x, sd, bottleneck=bottleneck, groups=groups)
    return _head(linknet_decoder_forward(feats, sd), sd, kernel_size=1,
                 upsampling=1)


# ---------------------------------------------------------------------------
# EfficientNet encoder (smp efficientnet-bX semantics: TF "SAME" padding,
# BN eps 1e-3, SiLU, SE on every MBConv)
# ---------------------------------------------------------------------------

# Base (B0) stage table: (expand, kernel, stride, channels, repeats) — the
# published EfficientNet architecture (Tan & Le 2019, Table 1).
_EFFNET_B0_STAGES = (
    (1, 3, 1, 16, 1),
    (6, 3, 2, 24, 2),
    (6, 5, 2, 40, 2),
    (6, 3, 2, 80, 3),
    (6, 5, 1, 112, 3),
    (6, 5, 2, 192, 4),
    (6, 3, 1, 320, 1),
)


def _conv_same(x, sd, name, k, stride=1, dilation=1, groups=1):
    """Conv with TF "SAME" padding (pads bottom/right more when odd), the
    convention the reference's efficientnet encoders use."""
    eff = (k - 1) * dilation + 1
    ih, iw = x.shape[-2:]
    ph = max((math.ceil(ih / stride) - 1) * stride + eff - ih, 0)
    pw = max((math.ceil(iw / stride) - 1) * stride + eff - iw, 0)
    x = F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))
    return F.conv2d(x, _t(sd, f"{name}.weight"), None, stride, 0, dilation,
                    groups)


def _effnet_se(x, sd, t):
    s = x.mean(dim=(2, 3), keepdim=True)
    s = F.silu(_conv(s, sd, f"{t}._se_reduce"))
    s = torch.sigmoid(_conv(s, sd, f"{t}._se_expand"))
    return x * s


def _effnet_block(x, sd, t, k, stride, dilation=1):
    """lukemelas MBConvBlock in eval mode (the module smp's
    "efficientnet-bX" encoders are built from): optional `_expand_conv` +
    `_bn0`, then `_depthwise_conv` + `_bn1`, SE, `_project_conv` + `_bn2`;
    skip connection when stride 1 and channels match."""
    identity = x
    if f"{t}._expand_conv.weight" in sd:
        h = F.silu(_bn(_conv(x, sd, f"{t}._expand_conv"), sd, f"{t}._bn0",
                       1e-3))
    else:
        h = x
    h = F.silu(
        _bn(_conv_same(h, sd, f"{t}._depthwise_conv", k, stride, dilation,
                       groups=h.shape[1]), sd, f"{t}._bn1", 1e-3)
    )
    h = _effnet_se(h, sd, t)
    h = _bn(_conv(h, sd, f"{t}._project_conv"), sd, f"{t}._bn2", 1e-3)
    if stride == 1 and h.shape[1] == identity.shape[1]:
        h = h + identity
    return h


def efficientnet_encoder_features(x, sd, depth_mult, output_stride=32):
    """smp efficientnet-bX encoder (lukemelas efficientnet_pytorch naming:
    `_conv_stem`/`_bn0` stem, FLAT `_blocks.{i}`): 6 features [identity,
    stem, stage2, stage3, stage5, stage7] at strides [1, 2, 4, 8, 16, 32].
    With output_stride 16/8, deeper stage strides become dilations (smp
    make_dilated semantics)."""
    feats = [x]
    h = F.silu(
        _bn(_conv_same(x, sd, "encoder._conv_stem", 3, 2), sd, "encoder._bn0",
            1e-3)
    )
    feats.append(h)
    current_stride, dilation = 2, 1
    flat = 0
    for stage_idx, (_, k, s, _, r) in enumerate(_EFFNET_B0_STAGES):
        for b in range(int(math.ceil(depth_mult * r))):
            stride = s if b == 0 else 1
            d = dilation
            if stride > 1 and current_stride * stride > output_stride:
                dilation *= stride
                d = dilation
                stride = 1
            elif stride > 1:
                current_stride *= stride
            h = _effnet_block(h, sd, f"encoder._blocks.{flat}", k, stride, d)
            flat += 1
        if stage_idx + 1 in (2, 3, 5, 7):
            feats.append(h)
    return feats


# ---------------------------------------------------------------------------
# ResNeSt encoder (timm-resnestXX semantics: deep 3-conv stem, radix-2
# split-attention 3x3, avd average-pool downsampling, avg-down shortcut)
# ---------------------------------------------------------------------------


def _splat_conv(x, sd, t, radix=2):
    """Split-Attention conv (ResNeSt SplAtConv2d, cardinality 1)."""
    h = F.relu(_bn(_conv(x, sd, f"{t}.conv", padding=1, groups=radix),
                   sd, f"{t}.bn0"))
    n, rc, hh, ww = h.shape
    c = rc // radix
    splits = h.view(n, radix, c, hh, ww)
    gap = splits.sum(dim=1).mean(dim=(2, 3), keepdim=True)
    a = F.relu(_bn(_conv(gap, sd, f"{t}.fc1"), sd, f"{t}.bn1"))
    a = _conv(a, sd, f"{t}.fc2")
    att = torch.softmax(a.view(n, radix, c), dim=1).view(n, radix, c, 1, 1)
    return (splits * att).sum(dim=1)


def _resnest_block(x, sd, pre, stride):
    h = F.relu(_bn(_conv(x, sd, f"{pre}.conv1"), sd, f"{pre}.bn1"))
    h = _splat_conv(h, sd, f"{pre}.conv2")
    if stride > 1:
        # avd: 3x3 average pool after the split-attention conv
        h = F.avg_pool2d(h, 3, stride, padding=1)
    h = _bn(_conv(h, sd, f"{pre}.conv3"), sd, f"{pre}.bn3")
    identity = x
    if f"{pre}.downsample.1.weight" in sd:
        if stride > 1:
            identity = F.avg_pool2d(x, stride, stride, ceil_mode=True,
                                    count_include_pad=False)
        identity = _bn(_conv(identity, sd, f"{pre}.downsample.1"),
                       sd, f"{pre}.downsample.2")
    return F.relu(h + identity)


def resnest_encoder_features(x, sd):
    """timm-resnestXX encoder: 6 features at strides [1, 2, 4, 8, 16, 32]."""
    feats = [x]
    h = F.relu(_bn(_conv(x, sd, "encoder.conv1.0", stride=2, padding=1),
                   sd, "encoder.conv1.1"))
    h = F.relu(_bn(_conv(h, sd, "encoder.conv1.3", padding=1),
                   sd, "encoder.conv1.4"))
    h = F.relu(_bn(_conv(h, sd, "encoder.conv1.6", padding=1),
                   sd, "encoder.bn1"))
    feats.append(h)
    h = F.max_pool2d(h, 3, 2, 1)
    for stage in (1, 2, 3, 4):
        b = 0
        while f"encoder.layer{stage}.{b}.conv1.weight" in sd:
            stride = 2 if (b == 0 and stage > 1) else 1
            h = _resnest_block(h, sd, f"encoder.layer{stage}.{b}", stride)
            b += 1
        feats.append(h)
    return feats


# ---------------------------------------------------------------------------
# U-Net++ / MA-Net / PAN decoders
# ---------------------------------------------------------------------------


def unetpp_decoder_forward(feats_all, sd):
    """smp UnetPlusPlusDecoder: dense grid of blocks x_{a}_{b} (b = dense
    level, b - a = column); each block nearest-x2 upsamples its input and
    concatenates [same-level denser nodes newest-first, encoder skip]."""
    feats = feats_all[1:][::-1]
    depth = len(feats) - 1

    def block(name, x, skips):
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        if skips:
            x = torch.cat([x] + skips, dim=1)
        t = f"decoder.blocks.{name}"
        x = _cbr(x, sd, f"{t}.conv1.0", f"{t}.conv1.1")
        return _cbr(x, sd, f"{t}.conv2.0", f"{t}.conv2.1")

    dense = {}
    for layer in range(depth):
        for a in range(depth - layer):
            b = a + layer
            if layer == 0:
                dense[(a, b)] = block(f"x_{a}_{b}", feats[a], [feats[a + 1]])
            else:
                skips = [dense[(i, b)] for i in range(a + 1, b + 1)]
                dense[(a, b)] = block(f"x_{a}_{b}", dense[(a, b - 1)],
                                      skips + [feats[b + 1]])
    return block(f"x_0_{depth}", dense[(0, depth - 1)], [])


def _pab_forward(x, sd, t):
    """smp MAnet PAB, including its reshape quirk: the (N, HW, C) attention
    output is reinterpreted row-major as (N, C, H, W), not transposed."""
    n, c, h, w = x.shape
    top = _conv(x, sd, f"{t}.top_conv")
    center = _conv(x, sd, f"{t}.center_conv")
    bottom = _conv(x, sd, f"{t}.bottom_conv", padding=1)
    att = torch.matmul(center.flatten(2).transpose(1, 2), top.flatten(2))
    att = torch.softmax(att.view(n, -1), dim=1).view(n, h * w, h * w)
    sp = torch.matmul(att, bottom.flatten(2).transpose(1, 2))  # (n, hw, c)
    sp = sp.reshape(n, c, h, w)
    return _conv(x + sp, sd, f"{t}.out_conv", padding=1)


def _channel_se(x, sd, t):
    s = x.mean(dim=(2, 3), keepdim=True)
    s = F.relu(_conv(s, sd, f"{t}.1"))
    return torch.sigmoid(_conv(s, sd, f"{t}.3"))


def manet_decoder_forward(feats_all, sd):
    """smp MAnetDecoder: PAB on the deepest feature, MFAB per skip (summed
    hl/ll channel attention, concat, 2x Conv2dReLU), plain block last."""
    feats = feats_all[1:][::-1]
    x = _pab_forward(feats[0], sd, "decoder.center")
    skips = list(feats[1:]) + [None]
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in sd:
        t = f"decoder.blocks.{i}"
        skip = skips[i]
        if skip is not None:
            h = _cbr(x, sd, f"{t}.hl_conv.0.0", f"{t}.hl_conv.0.1")
            h = _cbr(h, sd, f"{t}.hl_conv.1.0", f"{t}.hl_conv.1.1", padding=0)
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            att = _channel_se(h, sd, f"{t}.SE_hl") + _channel_se(
                skip, sd, f"{t}.SE_ll")
            h = torch.cat([h * att, skip], dim=1)
        else:
            h = F.interpolate(x, scale_factor=2, mode="nearest")
        x = _cbr(h, sd, f"{t}.conv1.0", f"{t}.conv1.1")
        x = _cbr(x, sd, f"{t}.conv2.0", f"{t}.conv2.1")
        i += 1
    return x


def _pan_cbr(x, sd, t, k, relu=True):
    """smp PAN ConvBnRelu: conv WITH bias -> BN (-> ReLU)."""
    y = _bn(_conv(x, sd, f"{t}.conv", padding=k // 2), sd, f"{t}.bn")
    return F.relu(y) if relu else y


def _up_ac(x, h, w):
    return F.interpolate(x, size=(h, w), mode="bilinear", align_corners=True)


def _fpa_forward(x, sd, t):
    """smp PAN FPABlock: global branch + 1x1 mid branch + 7/5/3 max-pool
    attention pyramid, merged mid * attention + global (align_corners=True
    interpolation throughout)."""
    n, c, h, w = x.shape
    b1 = _pan_cbr(x.mean(dim=(2, 3), keepdim=True), sd, f"{t}.branch1.1", 1)
    b1 = _up_ac(b1, h, w)
    mid = _pan_cbr(x, sd, f"{t}.mid.0", 1)
    x1 = _pan_cbr(F.max_pool2d(x, 2, 2), sd, f"{t}.down1.1", 7)
    x2 = _pan_cbr(F.max_pool2d(x1, 2, 2), sd, f"{t}.down2.1", 5)
    x3 = _pan_cbr(F.max_pool2d(x2, 2, 2), sd, f"{t}.down3.1", 3)
    x3 = _pan_cbr(x3, sd, f"{t}.down3.2", 3)
    y = _pan_cbr(x2, sd, f"{t}.conv2", 5) + _up_ac(x3, h // 4, w // 4)
    y = _up_ac(y, h // 2, w // 2) + _pan_cbr(x1, sd, f"{t}.conv1", 7)
    return _up_ac(y, h, w) * mid + b1


def _gau_forward(x_low, y_high, sd, t):
    """smp PAN GAUBlock: low-level gated by sigmoid(global(high)), added to
    align-corners-upsampled high-level path."""
    y_up = _up_ac(y_high, x_low.shape[2], x_low.shape[3])
    xc = _pan_cbr(x_low, sd, f"{t}.conv2", 3)
    g = torch.sigmoid(
        _pan_cbr(y_high.mean(dim=(2, 3), keepdim=True), sd, f"{t}.conv1.1", 1,
                 relu=False)
    )
    return y_up + xc * g


def pan_decoder_forward(feats, sd):
    x = _fpa_forward(feats[-1], sd, "decoder.fpa")
    x = _gau_forward(feats[-2], x, sd, "decoder.gau3")
    x = _gau_forward(feats[-3], x, sd, "decoder.gau2")
    x = _gau_forward(feats[-4], x, sd, "decoder.gau1")
    return x


def smp_unetpp_forward(x, sd, bottleneck=False, groups=1):
    """smp.UnetPlusPlus(resnetXX): default encoder, dense decoder, head
    kernel 3, no upsample."""
    feats = resnet_encoder_features(x, sd, bottleneck=bottleneck, groups=groups)
    return _head(unetpp_decoder_forward(feats, sd), sd, kernel_size=3,
                 upsampling=1)


def smp_manet_forward(x, sd, bottleneck=False, groups=1):
    """smp.MAnet(resnetXX): default encoder, PAB+MFAB decoder, head
    kernel 3, no upsample."""
    feats = resnet_encoder_features(x, sd, bottleneck=bottleneck, groups=groups)
    return _head(manet_decoder_forward(feats, sd), sd, kernel_size=3,
                 upsampling=1)


def smp_pan_forward(x, sd, bottleneck=False, groups=1):
    """smp.PAN(resnetXX): encoder dilated to output_stride 16 (stage 4 at
    rate 2), FPA+GAU decoder, head kernel 3, x4 upsample."""
    feats = resnet_encoder_features(
        x, sd, bottleneck=bottleneck, groups=groups, dilate={4: 2}
    )
    return _head(pan_decoder_forward(feats, sd), sd, kernel_size=3,
                 upsampling=4)


def smp_unet_efficientnet_forward(x, sd, depth_mult):
    """smp.Unet(efficientnet-bX) eval forward."""
    feats = efficientnet_encoder_features(x, sd, depth_mult)
    return _head(unet_decoder_forward(feats, sd), sd, kernel_size=3,
                 upsampling=1)


def smp_deeplabv3plus_efficientnet_forward(x, sd, depth_mult):
    """smp.DeepLabV3Plus(efficientnet-bX): encoder dilated to output_stride
    16, separable-ASPP decoder, head kernel 1, x4 upsample."""
    feats = efficientnet_encoder_features(x, sd, depth_mult, output_stride=16)
    return _head(deeplabv3plus_decoder_forward(feats, sd), sd, kernel_size=1,
                 upsampling=4)


def smp_unet_resnest_forward(x, sd):
    """smp.Unet(timm-resnestXXX) eval forward."""
    feats = resnest_encoder_features(x, sd)
    return _head(unet_decoder_forward(feats, sd), sd, kernel_size=3,
                 upsampling=1)
