"""PyTorch checkpoint interop: load reference-format torch.save files.

The reference's checkpoint is a torch-pickled dict (reference
utilities/early_stopping.py:50-63). This module unpickles it (tolerating the
reference package's enum classes via stub modules) and converts the
segmentation_models_pytorch state_dict to this framework's Flax parameter
tree. Round-1 coverage: ResNet-family encoders + U-Net decoder; other
architectures load structure/label codes with an informative error for
weights.
"""

import logging
import sys
import types
from pathlib import Path
from typing import Any, Dict

import numpy as np

from volume_segmantics_tpu.utils.base_data_utils import ModelType


def _install_reference_stubs():
    """Allow unpickling of reference-package enums without the reference
    package installed."""
    if "volume_segmantics" in sys.modules:
        return
    pkg = types.ModuleType("volume_segmantics")
    utilities = types.ModuleType("volume_segmantics.utilities")
    bdu = types.ModuleType("volume_segmantics.utilities.base_data_utils")
    bdu.ModelType = ModelType
    from volume_segmantics_tpu.utils.base_data_utils import Axis, Quality

    bdu.Axis = Axis
    bdu.Quality = Quality
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


ENCODER_CONVERTERS = {
    "resnet": _convert_resnet_encoder,
    "efficientnet": _convert_efficientnet_encoder,
    "resnest": _convert_resnest_encoder,
}


def convert_encoder_state_dict(torch_sd: Dict[str, np.ndarray], encoder_name: str,
                               prefix: str = "encoder"):
    """Convert a torch encoder state_dict (torchvision/timm naming) to our
    {"params", "batch_stats"} encoder subtrees."""
    if encoder_name.startswith(("resnet", "resnext")):
        fn = _convert_resnet_encoder
    elif "efficientnet" in encoder_name:
        fn = _convert_efficientnet_encoder
    elif "resnest" in encoder_name:
        fn = _convert_resnest_encoder
    else:
        raise NotImplementedError(f"No converter for encoder '{encoder_name}'.")
    params, stats = {}, {}
    fn(torch_sd, params, stats, prefix=prefix)
    return params["encoder"], stats["encoder"]


def convert_smp_state_dict(torch_sd: Dict[str, np.ndarray], struc: dict):
    """Convert an smp model state_dict to {"params", "batch_stats"}.

    Supported: ResNet-family encoders (resnet34/50, resnext50_32x4d) with the
    U-Net decoder. Other combinations raise with guidance.
    """
    encoder_name = struc.get("encoder_name", "")
    model_type = struc.get("type")
    supported_enc = encoder_name.startswith(("resnet", "resnext")) or any(
        k in encoder_name for k in ("efficientnet", "resnest")
    )
    supported_arch = model_type == ModelType.U_NET
    if not (supported_enc and supported_arch):
        raise NotImplementedError(
            f"Torch weight conversion for {model_type} + {encoder_name} is not "
            "implemented yet; re-train natively or convert the encoder with "
            "tools/convert_torch_encoder.py."
        )
    params: dict = {}
    stats: dict = {}
    enc_params, enc_stats = convert_encoder_state_dict(torch_sd, encoder_name)
    params["encoder"] = enc_params
    stats["encoder"] = enc_stats
    _convert_unet_decoder(torch_sd, params, stats)
    _convert_head(torch_sd, params)
    logging.info("Converted torch state_dict to flax parameter tree.")
    return {"params": params, "batch_stats": stats}
