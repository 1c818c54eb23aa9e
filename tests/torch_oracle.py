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


def _bn(x, sd, pre):
    """Eval-mode BatchNorm with running statistics."""
    return F.batch_norm(
        x,
        _t(sd, f"{pre}.running_mean"),
        _t(sd, f"{pre}.running_var"),
        _t(sd, f"{pre}.weight"),
        _t(sd, f"{pre}.bias"),
        training=False,
        eps=BN_EPS,
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
