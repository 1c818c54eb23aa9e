"""PyTorch checkpoint interop: load reference-format torch.save files.

The reference's checkpoint is a torch-pickled dict (reference
utilities/early_stopping.py:50-63). This module unpickles it (tolerating the
reference package's enum classes via stub modules) and converts the
segmentation_models_pytorch state_dict to this framework's Flax parameter
tree. Coverage: all 8 reference architectures (reference
model/model_2d.py:15-38) x the resnet/efficientnet/resnest encoder
families — any reference ``.pytorch`` file is drop-in loadable.
"""

import logging
import sys
import types
from pathlib import Path
from typing import Any, Dict

import numpy as np

from volume_segmantics_tpu.utils.base_data_utils import ModelType


def _install_reference_stubs():
    """Allow (un)pickling of reference-package enums without the reference
    package installed. The stub enums are CLONES created under the
    reference's module path ("volume_segmantics.utilities.base_data_utils"),
    so checkpoints we torch.save (models/torch_export.py) pickle their
    ModelType by that path and the actual reference package can load them."""
    if "volume_segmantics" in sys.modules:
        return
    import enum

    from volume_segmantics_tpu.utils.base_data_utils import Axis, Quality

    pkg = types.ModuleType("volume_segmantics")
    utilities = types.ModuleType("volume_segmantics.utilities")
    bdu = types.ModuleType("volume_segmantics.utilities.base_data_utils")
    for cls in (ModelType, Axis, Quality):
        bdu.__dict__[cls.__name__] = enum.Enum(
            cls.__name__,
            {m.name: m.value for m in cls},
            module="volume_segmantics.utilities.base_data_utils",
        )
    utilities.base_data_utils = bdu
    pkg.utilities = utilities
    sys.modules["volume_segmantics"] = pkg
    sys.modules["volume_segmantics.utilities"] = utilities
    sys.modules["volume_segmantics.utilities.base_data_utils"] = bdu


def load_torch_checkpoint(path: Path) -> Dict[str, Any]:
    """torch checkpoint file -> native checkpoint dict with converted
    weights (model_state_dict as a flax-style nested state dict)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Loading PyTorch checkpoints requires the torch (CPU) wheel."
        ) from e
    _install_reference_stubs()
    blob = torch.load(path, map_location="cpu", weights_only=False)
    struc = dict(blob["model_struc_dict"])
    t = struc.get("type")
    if hasattr(t, "name"):
        struc["type"] = ModelType[t.name]
    torch_sd = {k: np.asarray(v) for k, v in blob["model_state_dict"].items()}
    model_state = convert_smp_state_dict(torch_sd, struc)
    return {
        "model_state_dict": model_state,
        "model_struc_dict": struc,
        "optimizer_state_dict": {},
        "loss_val": float(blob.get("loss_val", np.inf)),
        "label_codes": blob.get("label_codes", {}),
    }


# ---------------------------------------------------------------------------
# smp state_dict -> flax nested state dict
# ---------------------------------------------------------------------------


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I/g, kH, kW) -> flax kernel (kH, kW, I/g, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _set(tree: dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _convbn(params, stats, torch_sd, t_conv, t_bn, f_path):
    """Map a torch conv+bn pair onto a ConvBnAct module at f_path."""
    _set(params, f_path + ("conv", "kernel"), _conv_kernel(torch_sd[f"{t_conv}.weight"]))
    if f"{t_conv}.bias" in torch_sd:
        _set(params, f_path + ("conv", "bias"), torch_sd[f"{t_conv}.bias"])
    _set(params, f_path + ("bn", "scale"), torch_sd[f"{t_bn}.weight"])
    _set(params, f_path + ("bn", "bias"), torch_sd[f"{t_bn}.bias"])
    _set(stats, f_path + ("bn", "mean"), torch_sd[f"{t_bn}.running_mean"])
    _set(stats, f_path + ("bn", "var"), torch_sd[f"{t_bn}.running_var"])


def _convert_resnet_encoder(torch_sd, params, stats, prefix="encoder"):
    """torchvision/smp ResNet naming -> our ResNetEncoder naming."""
    _convbn(torch_sd=torch_sd, params=params, stats=stats,
            t_conv=f"{prefix}.conv1", t_bn=f"{prefix}.bn1",
            f_path=("encoder", "stem_conv"))
    stage = 1
    while f"{prefix}.layer{stage}.0.conv1.weight" in torch_sd:
        block = 0
        while f"{prefix}.layer{stage}.{block}.conv1.weight" in torch_sd:
            t = f"{prefix}.layer{stage}.{block}"
            f = ("encoder", f"layer{stage}_{block}")
            n_convs = 3 if f"{t}.conv3.weight" in torch_sd else 2
            for ci in range(1, n_convs + 1):
                _convbn(params, stats, torch_sd, f"{t}.conv{ci}", f"{t}.bn{ci}",
                        f + (f"convbn{ci}",))
            if f"{t}.downsample.0.weight" in torch_sd:
                _convbn(params, stats, torch_sd, f"{t}.downsample.0",
                        f"{t}.downsample.1", f + ("conv_down",))
            block += 1
        stage += 1


def _convert_unet_decoder(torch_sd, params, stats):
    """smp UnetDecoder naming (decoder.blocks.{i}.conv{1,2}.{0,1}) -> ours."""
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in torch_sd:
        t = f"decoder.blocks.{i}"
        f = ("decoder", f"block{i}")
        _convbn(params, stats, torch_sd, f"{t}.conv1.0", f"{t}.conv1.1",
                f + ("convbn1",))
        _convbn(params, stats, torch_sd, f"{t}.conv2.0", f"{t}.conv2.1",
                f + ("convbn2",))
        i += 1


def _convert_head(torch_sd, params):
    if "segmentation_head.0.weight" in torch_sd:
        _set(params, ("head_conv", "kernel"),
             _conv_kernel(torch_sd["segmentation_head.0.weight"]))
        _set(params, ("head_conv", "bias"), torch_sd["segmentation_head.0.bias"])


def _convT_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight (I, O, kH, kW) -> flax ConvTranspose
    kernel (kH, kW, I, O). flax's ConvTranspose applies the kernel without
    spatial flipping (transpose_kernel=False), so the torch kernel must be
    flipped; numerically verified against torch (k=4, s=2, p=1 == SAME)."""
    return np.flip(np.transpose(w, (2, 3, 0, 1)), axis=(0, 1))


def _conv_only(params, torch_sd, t_conv, f_path, bias="auto"):
    """Map a bare torch conv onto an nn.Conv at f_path."""
    _set(params, f_path + ("kernel",), _conv_kernel(torch_sd[f"{t_conv}.weight"]))
    if bias == "auto":
        bias = f"{t_conv}.bias" in torch_sd
    if bias:
        _set(params, f_path + ("bias",), torch_sd[f"{t_conv}.bias"])


def _groupnorm(params, torch_sd, t_gn, f_path):
    _set(params, f_path + ("scale",), torch_sd[f"{t_gn}.weight"])
    _set(params, f_path + ("bias",), torch_sd[f"{t_gn}.bias"])


def _convert_unetpp_decoder(torch_sd, params, stats):
    """smp UnetPlusPlusDecoder (decoder.blocks.x_{a}_{b}.conv{1,2}.{0,1}) ->
    our UnetPlusPlusDecoder, which uses the same x_{a}_{b} node names."""
    nodes = sorted(
        {k.split(".")[2] for k in torch_sd if k.startswith("decoder.blocks.x_")}
    )
    for node in nodes:
        t = f"decoder.blocks.{node}"
        f = ("decoder", node)
        _convbn(params, stats, torch_sd, f"{t}.conv1.0", f"{t}.conv1.1",
                f + ("convbn1",))
        _convbn(params, stats, torch_sd, f"{t}.conv2.0", f"{t}.conv2.1",
                f + ("convbn2",))


def _convert_fpn_decoder(torch_sd, params, stats):
    """smp FPNDecoder -> our FPNDecoder. GroupNorm affine params live in
    'params' (no running stats)."""
    _conv_only(params, torch_sd, "decoder.p5", ("decoder", "conv_p5"))
    for lvl in (4, 3, 2):
        _conv_only(params, torch_sd, f"decoder.p{lvl}.skip_conv",
                   ("decoder", f"fpn_p{lvl}", "conv_lateral"))
    # seg_blocks order [p5, p4, p3, p2] with n_upsamples [3, 2, 1, 0]
    for i, lvl in enumerate((5, 4, 3, 2)):
        j = 0
        while f"decoder.seg_blocks.{i}.block.{j}.block.0.weight" in torch_sd:
            t = f"decoder.seg_blocks.{i}.block.{j}.block"
            f = ("decoder", f"seg_p{lvl}", f"convgn{j}")
            _conv_only(params, torch_sd, f"{t}.0", f + ("conv",), bias=False)
            _groupnorm(params, torch_sd, f"{t}.1", f + ("gn",))
            j += 1


def _aspp_rates(torch_sd, prefix):
    """The reference builds smp decoders with default atrous rates; recover
    them from our module naming convention (12/24/36)."""
    return (12, 24, 36)


def _convert_aspp(torch_sd, params, stats, t_prefix, f_prefix, separable):
    """smp/torchvision ASPP: convs.0 = 1x1, convs.1-3 = rate branches,
    convs.4 = image pooling, project."""
    _convbn(params, stats, torch_sd, f"{t_prefix}.convs.0.0",
            f"{t_prefix}.convs.0.1", f_prefix + ("convbn_1x1",))
    for i, rate in enumerate(_aspp_rates(torch_sd, t_prefix), start=1):
        t = f"{t_prefix}.convs.{i}"
        if separable:
            f = f_prefix + (f"sepconv_r{rate}",)
            _conv_only(params, torch_sd, f"{t}.0.0", f + ("conv_depthwise",),
                       bias=False)
            _conv_only(params, torch_sd, f"{t}.0.1", f + ("conv_pointwise",),
                       bias=False)
            _set(params, f + ("bn", "scale"), torch_sd[f"{t}.1.weight"])
            _set(params, f + ("bn", "bias"), torch_sd[f"{t}.1.bias"])
            _set(stats, f + ("bn", "mean"), torch_sd[f"{t}.1.running_mean"])
            _set(stats, f + ("bn", "var"), torch_sd[f"{t}.1.running_var"])
        else:
            _convbn(params, stats, torch_sd, f"{t}.0", f"{t}.1",
                    f_prefix + (f"convbn_r{rate}",))
    # Image pooling branch: Sequential(pool, conv, bn, relu)
    _convbn(params, stats, torch_sd, f"{t_prefix}.convs.4.1",
            f"{t_prefix}.convs.4.2", f_prefix + ("convbn_pool",))
    _convbn(params, stats, torch_sd, f"{t_prefix}.project.0",
            f"{t_prefix}.project.1", f_prefix + ("convbn_project",))


def _convert_deeplabv3_decoder(torch_sd, params, stats):
    """smp DeepLabV3Decoder (nn.Sequential: 0=ASPP, 1=conv3x3, 2=bn)."""
    _convert_aspp(torch_sd, params, stats, "decoder.0", ("decoder", "aspp"),
                  separable=False)
    _convbn(params, stats, torch_sd, "decoder.1", "decoder.2",
            ("decoder", "convbn_out"))


def _sep_convbn(torch_sd, params, stats, t_sep, t_bn, f_path):
    """smp SeparableConv2d (Sequential dw, pw) + following BatchNorm."""
    _conv_only(params, torch_sd, f"{t_sep}.0", f_path + ("conv_depthwise",),
               bias=False)
    _conv_only(params, torch_sd, f"{t_sep}.1", f_path + ("conv_pointwise",),
               bias=False)
    _set(params, f_path + ("bn", "scale"), torch_sd[f"{t_bn}.weight"])
    _set(params, f_path + ("bn", "bias"), torch_sd[f"{t_bn}.bias"])
    _set(stats, f_path + ("bn", "mean"), torch_sd[f"{t_bn}.running_mean"])
    _set(stats, f_path + ("bn", "var"), torch_sd[f"{t_bn}.running_var"])


def _convert_deeplabv3plus_decoder(torch_sd, params, stats):
    """smp DeepLabV3PlusDecoder: aspp = Sequential(ASPP(separable),
    SeparableConv2d, BN, ReLU); block1 = highres 1x1; block2 = separable
    fuse."""
    _convert_aspp(torch_sd, params, stats, "decoder.aspp.0",
                  ("decoder", "aspp"), separable=True)
    _sep_convbn(torch_sd, params, stats, "decoder.aspp.1", "decoder.aspp.2",
                ("decoder", "sepconv_aspp"))
    _convbn(params, stats, torch_sd, "decoder.block1.0", "decoder.block1.1",
            ("decoder", "convbn_highres"))
    _sep_convbn(torch_sd, params, stats, "decoder.block2.0", "decoder.block2.1",
                ("decoder", "sepconv_fuse"))


def _convert_manet_decoder(torch_sd, params, stats):
    """smp MAnetDecoder: center PAB + 4 MFAB blocks + 1 plain block."""
    pab_map = (("top_conv", "conv_top"), ("center_conv", "conv_center"),
               ("bottom_conv", "conv_bottom"), ("out_conv", "conv_map"))
    for t_name, f_name in pab_map:
        _conv_only(params, torch_sd, f"decoder.center.{t_name}",
                   ("decoder", "pab", f_name))
    i = 0
    while f"decoder.blocks.{i}.conv1.0.weight" in torch_sd:
        t = f"decoder.blocks.{i}"
        if f"{t}.hl_conv.0.0.weight" in torch_sd:  # MFAB
            f = ("decoder", f"mfab{i}")
            _convbn(params, stats, torch_sd, f"{t}.hl_conv.0.0",
                    f"{t}.hl_conv.0.1", f + ("convbn_hl1",))
            _convbn(params, stats, torch_sd, f"{t}.hl_conv.1.0",
                    f"{t}.hl_conv.1.1", f + ("convbn_hl2",))
            for t_se, f_se in (("SE_hl", "se_hl"), ("SE_ll", "se_ll")):
                _conv_only(params, torch_sd, f"{t}.{t_se}.1",
                           f + (f_se, "conv_squeeze"))
                _conv_only(params, torch_sd, f"{t}.{t_se}.3",
                           f + (f_se, "conv_excite"))
        else:  # plain DecoderBlock
            f = ("decoder", f"block{i}")
        _convbn(params, stats, torch_sd, f"{t}.conv1.0", f"{t}.conv1.1",
                f + ("convbn1",))
        _convbn(params, stats, torch_sd, f"{t}.conv2.0", f"{t}.conv2.1",
                f + ("convbn2",))
        i += 1


def _convert_linknet_decoder(torch_sd, params, stats):
    """smp LinknetDecoder: blocks of (1x1 ConvBnRelu, TransposeX2,
    1x1 ConvBnRelu)."""
    i = 0
    while f"decoder.blocks.{i}.block.0.0.weight" in torch_sd:
        t = f"decoder.blocks.{i}.block"
        f = ("decoder", f"block{i}")
        _convbn(params, stats, torch_sd, f"{t}.0.0", f"{t}.0.1",
                f + ("convbn1",))
        _set(params, f + ("transpose", "convT", "kernel"),
             _convT_kernel(torch_sd[f"{t}.1.0.weight"]))
        _set(params, f + ("transpose", "bn", "scale"), torch_sd[f"{t}.1.1.weight"])
        _set(params, f + ("transpose", "bn", "bias"), torch_sd[f"{t}.1.1.bias"])
        _set(stats, f + ("transpose", "bn", "mean"),
             torch_sd[f"{t}.1.1.running_mean"])
        _set(stats, f + ("transpose", "bn", "var"),
             torch_sd[f"{t}.1.1.running_var"])
        _convbn(params, stats, torch_sd, f"{t}.2.0", f"{t}.2.1",
                f + ("convbn2",))
        i += 1


def _convert_pan_decoder(torch_sd, params, stats):
    """smp PANDecoder: FPA + 3 GAU blocks; every ConvBnRelu keeps its
    conv bias (smp PAN passes bias=True)."""

    def cbr(t_prefix, f_path):
        _conv_only(params, torch_sd, f"{t_prefix}.conv", f_path + ("conv",))
        _set(params, f_path + ("bn", "scale"), torch_sd[f"{t_prefix}.bn.weight"])
        _set(params, f_path + ("bn", "bias"), torch_sd[f"{t_prefix}.bn.bias"])
        _set(stats, f_path + ("bn", "mean"),
             torch_sd[f"{t_prefix}.bn.running_mean"])
        _set(stats, f_path + ("bn", "var"),
             torch_sd[f"{t_prefix}.bn.running_var"])

    fpa_map = (("branch1.1", "branch1"), ("mid.0", "mid"), ("down1.1", "down1"),
               ("down2.1", "down2"), ("down3.1", "down3a"),
               ("down3.2", "down3b"), ("conv2", "conv2"), ("conv1", "conv1"))
    for t_name, f_name in fpa_map:
        cbr(f"decoder.fpa.{t_name}", ("decoder", "fpa", f_name))
    for k in (3, 2, 1):
        cbr(f"decoder.gau{k}.conv1.1", ("decoder", f"gau{k}", "conv1"))
        cbr(f"decoder.gau{k}.conv2", ("decoder", f"gau{k}", "conv2"))


def _convert_efficientnet_encoder(torch_sd, params, stats, prefix="encoder"):
    """timm efficientnet naming -> our EfficientNetEncoder naming.

    timm: conv_stem/bn1; blocks.{s}.{b} with (stage 0) conv_dw/bn1/se/
    conv_pw/bn2 or (stages 1+) conv_pw/bn1/conv_dw/bn2/se/conv_pwl/bn3.
    """
    _set(params, ("encoder", "conv_stem", "kernel"),
         _conv_kernel(torch_sd[f"{prefix}.conv_stem.weight"]))
    _set(params, ("encoder", "bnact_stem", "bn", "scale"),
         torch_sd[f"{prefix}.bn1.weight"])
    _set(params, ("encoder", "bnact_stem", "bn", "bias"),
         torch_sd[f"{prefix}.bn1.bias"])
    _set(stats, ("encoder", "bnact_stem", "bn", "mean"),
         torch_sd[f"{prefix}.bn1.running_mean"])
    _set(stats, ("encoder", "bnact_stem", "bn", "var"),
         torch_sd[f"{prefix}.bn1.running_var"])

    def bn(t_bn, f_path):
        _set(params, f_path + ("bn", "scale"), torch_sd[f"{t_bn}.weight"])
        _set(params, f_path + ("bn", "bias"), torch_sd[f"{t_bn}.bias"])
        _set(stats, f_path + ("bn", "mean"), torch_sd[f"{t_bn}.running_mean"])
        _set(stats, f_path + ("bn", "var"), torch_sd[f"{t_bn}.running_var"])

    def conv(t_conv, f_path, bias=False):
        _set(params, f_path + ("kernel",), _conv_kernel(torch_sd[f"{t_conv}.weight"]))
        if bias and f"{t_conv}.bias" in torch_sd:
            _set(params, f_path + ("bias",), torch_sd[f"{t_conv}.bias"])

    s = 0
    while f"{prefix}.blocks.{s}.0.conv_dw.weight" in torch_sd or (
        f"{prefix}.blocks.{s}.0.conv_pw.weight" in torch_sd
    ):
        b = 0
        while any(
            f"{prefix}.blocks.{s}.{b}.{k}.weight" in torch_sd
            for k in ("conv_dw", "conv_pw")
        ):
            t = f"{prefix}.blocks.{s}.{b}"
            f = ("encoder", f"stage{s + 1}_block{b}")
            expanded = f"{t}.conv_pwl.weight" in torch_sd
            if expanded:
                conv(f"{t}.conv_pw", f + ("conv_expand",))
                bn(f"{t}.bn1", f + ("bnact_expand",))
                conv(f"{t}.conv_dw", f + ("conv_depthwise",))
                bn(f"{t}.bn2", f + ("bnact_depthwise",))
                conv(f"{t}.conv_pwl", f + ("conv_project",))
                bn(f"{t}.bn3", f + ("bnact_project",))
            else:
                conv(f"{t}.conv_dw", f + ("conv_depthwise",))
                bn(f"{t}.bn1", f + ("bnact_depthwise",))
                conv(f"{t}.conv_pw", f + ("conv_project",))
                bn(f"{t}.bn2", f + ("bnact_project",))
            conv(f"{t}.se.conv_reduce", f + ("se", "conv_reduce"), bias=True)
            conv(f"{t}.se.conv_expand", f + ("se", "conv_expand"), bias=True)
            b += 1
        s += 1


def _convert_resnest_encoder(torch_sd, params, stats, prefix="encoder"):
    """timm resnest naming -> our ResNeStEncoder naming.

    timm: deep stem conv1.{0,3,6} convs with conv1.{1,4} bns + bn1 after;
    blocks: conv1/bn1, conv2 (SplAtConv2d: conv/bn0/fc1/bn1/fc2), conv3/bn3,
    downsample.{0 pool,1 conv,2 bn}.
    """
    stem_map = [
        ("conv1.0", "conv1.1", "stem_conv1"),
        ("conv1.3", "conv1.4", "stem_conv2"),
        ("conv1.6", "bn1", "stem_conv3"),
    ]
    for t_conv, t_bn, f_name in stem_map:
        _convbn(params, stats, torch_sd, f"{prefix}.{t_conv}", f"{prefix}.{t_bn}",
                ("encoder", f_name))
    stage = 1
    while f"{prefix}.layer{stage}.0.conv1.weight" in torch_sd:
        block = 0
        while f"{prefix}.layer{stage}.{block}.conv1.weight" in torch_sd:
            t = f"{prefix}.layer{stage}.{block}"
            f = ("encoder", f"layer{stage}_{block}")
            _convbn(params, stats, torch_sd, f"{t}.conv1", f"{t}.bn1",
                    f + ("convbn1",))
            # SplAtConv2d
            sp = f + ("splat",)
            _set(params, sp + ("conv", "kernel"),
                 _conv_kernel(torch_sd[f"{t}.conv2.conv.weight"]))
            for tb, fb in (("bn0", "bn0"), ("bn1", "bn1")):
                _set(params, sp + (fb, "scale"), torch_sd[f"{t}.conv2.{tb}.weight"])
                _set(params, sp + (fb, "bias"), torch_sd[f"{t}.conv2.{tb}.bias"])
                _set(stats, sp + (fb, "mean"),
                     torch_sd[f"{t}.conv2.{tb}.running_mean"])
                _set(stats, sp + (fb, "var"),
                     torch_sd[f"{t}.conv2.{tb}.running_var"])
            for tf, ff in (("fc1", "conv_fc1"), ("fc2", "conv_fc2")):
                _set(params, sp + (ff, "kernel"),
                     _conv_kernel(torch_sd[f"{t}.conv2.{tf}.weight"]))
                _set(params, sp + (ff, "bias"), torch_sd[f"{t}.conv2.{tf}.bias"])
            _convbn(params, stats, torch_sd, f"{t}.conv3", f"{t}.bn3",
                    f + ("convbn3",))
            if f"{t}.downsample.1.weight" in torch_sd:
                _convbn(params, stats, torch_sd, f"{t}.downsample.1",
                        f"{t}.downsample.2", f + ("conv_down",))
            block += 1
        stage += 1


_EFFICIENTNET_STAGE_REPEATS = (1, 2, 2, 3, 3, 4, 1)

_BN_SUFFIXES = ("weight", "bias", "running_mean", "running_var",
                "num_batches_tracked")


def _efficientnet_lukemelas_to_timm(torch_sd, prefix="encoder"):
    """Rename an efficientnet_pytorch (lukemelas) encoder state dict to the
    timm-style nested naming `_convert_efficientnet_encoder` consumes.

    smp 0.2.x's "efficientnet-bX" encoders subclass
    efficientnet_pytorch.EfficientNet, so reference checkpoints carry FLAT
    `_blocks.{i}` names (`_expand_conv`/`_depthwise_conv`/`_project_conv`,
    `_se_reduce`/`_se_expand`, `_bn0/_bn1/_bn2`) plus an unused
    classification tail (`_conv_head`, top-level `_bn1`) that segmentation
    never runs. The network math is identical (same TF-SAME convs, BN eps
    1e-3); only the parameter names differ.
    """
    import math

    # Recover the per-stage block counts: the depth multiplier scales the
    # published B0 stage repeats, and the flat block count pins it.
    n_blocks = 0
    probe = f"{prefix}._blocks."
    for k in torch_sd:
        if k.startswith(probe):
            n_blocks = max(n_blocks, int(k[len(probe):].split(".")[0]) + 1)
    reps = None
    for mult in (1.0, 1.1, 1.2, 1.4, 1.8, 2.2, 2.6, 3.1):
        cand = [int(math.ceil(mult * r)) for r in _EFFICIENTNET_STAGE_REPEATS]
        if sum(cand) == n_blocks:
            reps = cand
            break
    if reps is None:
        raise NotImplementedError(
            f"Cannot infer an EfficientNet stage layout from {n_blocks} "
            "blocks."
        )
    out = {}

    def move(src_mod, dst_mod):
        for suffix in _BN_SUFFIXES:
            k = f"{src_mod}.{suffix}"
            if k in torch_sd:
                out[f"{dst_mod}.{suffix}"] = torch_sd[k]

    move(f"{prefix}._conv_stem", f"{prefix}.conv_stem")
    move(f"{prefix}._bn0", f"{prefix}.bn1")
    flat = 0
    for s, r in enumerate(reps):
        for b in range(r):
            src = f"{prefix}._blocks.{flat}"
            dst = f"{prefix}.blocks.{s}.{b}"
            if f"{src}._expand_conv.weight" in torch_sd:
                pairs = (("_expand_conv", "conv_pw"), ("_bn0", "bn1"),
                         ("_depthwise_conv", "conv_dw"), ("_bn1", "bn2"),
                         ("_project_conv", "conv_pwl"), ("_bn2", "bn3"))
            else:
                pairs = (("_depthwise_conv", "conv_dw"), ("_bn1", "bn1"),
                         ("_project_conv", "conv_pw"), ("_bn2", "bn2"))
            pairs += (("_se_reduce", "se.conv_reduce"),
                      ("_se_expand", "se.conv_expand"))
            for old, new in pairs:
                move(f"{src}.{old}", f"{dst}.{new}")
            flat += 1
    # Non-encoder keys (decoder, segmentation head) pass through; encoder
    # keys not moved above (the _conv_head/_bn1/_fc classification tail)
    # are intentionally dropped.
    for k, v in torch_sd.items():
        if not k.startswith(f"{prefix}."):
            out[k] = v
    return out


ENCODER_CONVERTERS = {
    "resnet": _convert_resnet_encoder,
    "efficientnet": _convert_efficientnet_encoder,
    "resnest": _convert_resnest_encoder,
}


def convert_encoder_state_dict(torch_sd: Dict[str, np.ndarray], encoder_name: str,
                               prefix: str = "encoder"):
    """Convert a torch encoder state_dict (torchvision/timm/lukemelas
    naming) to our {"params", "batch_stats"} encoder subtrees."""
    if encoder_name.startswith(("resnet", "resnext")):
        fn = _convert_resnet_encoder
    elif "efficientnet" in encoder_name:
        if f"{prefix}._conv_stem.weight" in torch_sd:
            torch_sd = _efficientnet_lukemelas_to_timm(torch_sd, prefix)
        fn = _convert_efficientnet_encoder
    elif "resnest" in encoder_name:
        fn = _convert_resnest_encoder
    else:
        raise NotImplementedError(f"No converter for encoder '{encoder_name}'.")
    params, stats = {}, {}
    fn(torch_sd, params, stats, prefix=prefix)
    return params["encoder"], stats["encoder"]


DECODER_CONVERTERS = {
    ModelType.U_NET: _convert_unet_decoder,
    ModelType.U_NET_PLUS_PLUS: _convert_unetpp_decoder,
    ModelType.FPN: _convert_fpn_decoder,
    ModelType.DEEPLABV3: _convert_deeplabv3_decoder,
    ModelType.DEEPLABV3_PLUS: _convert_deeplabv3plus_decoder,
    ModelType.MA_NET: _convert_manet_decoder,
    ModelType.LINKNET: _convert_linknet_decoder,
    ModelType.PAN: _convert_pan_decoder,
}


def convert_smp_state_dict(torch_sd: Dict[str, np.ndarray], struc: dict):
    """Convert an smp model state_dict to {"params", "batch_stats"}.

    Covers every architecture the reference can save (reference
    model/model_2d.py:15-38): all 8 smp decoders plus the resnet/
    efficientnet/resnest encoder families. The reference rebuilds any saved
    arch from its checkpoint (reference model/model_2d.py:42-57); this is
    the equivalent drop-in path for ``.pytorch`` files.
    """
    encoder_name = struc.get("encoder_name", "")
    model_type = struc.get("type")
    supported_enc = encoder_name.startswith(("resnet", "resnext")) or any(
        k in encoder_name for k in ("efficientnet", "resnest")
    )
    if not supported_enc:
        raise NotImplementedError(
            f"Torch weight conversion for encoder '{encoder_name}' is not "
            "implemented; supported families: resnet/resnext, efficientnet, "
            "resnest."
        )
    decoder_fn = DECODER_CONVERTERS.get(model_type)
    if decoder_fn is None:
        raise NotImplementedError(
            f"Torch weight conversion for architecture {model_type} is not "
            "implemented."
        )
    params: dict = {}
    stats: dict = {}
    enc_params, enc_stats = convert_encoder_state_dict(torch_sd, encoder_name)
    params["encoder"] = enc_params
    stats["encoder"] = enc_stats
    decoder_fn(torch_sd, params, stats)
    _convert_head(torch_sd, params)
    logging.info(
        f"Converted torch state_dict ({model_type}, {encoder_name}) to a "
        "flax parameter tree."
    )
    return {"params": params, "batch_stats": stats}
