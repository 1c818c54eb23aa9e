"""Export checkpoints in the reference's torch format.

The reference's model-exchange format is a torch-pickled dict of five keys
{model_state_dict, model_struc_dict, optimizer_state_dict, loss_val,
label_codes} with segmentation_models_pytorch parameter names (reference
utilities/early_stopping.py:50-63). `load_torch_checkpoint`
(models/torch_convert.py) imports that format; this module is the inverse:
it maps our Flax {params, batch_stats} trees back to smp-named torch tensors
and writes a file the reference CLI — and downstream consumers like SuRVoS2
(reference README.md:78-80) — can `torch.load` and run.

Covers every (decoder, encoder-family) pair the converter covers: all 8
architectures x resnet/resnext (torchvision naming), efficientnet and
resnest (timm naming).
"""

import logging
from pathlib import Path
from typing import Any, Dict

import numpy as np

from volume_segmantics_tpu.utils.base_data_utils import ModelType

# ---------------------------------------------------------------------------
# Leaf inverses (flax -> torch layouts)
# ---------------------------------------------------------------------------


def _inverse_conv(sd, name, kernel, bias=None):
    """flax HWIO kernel -> torch OIHW conv weight."""
    sd[f"{name}.weight"] = np.transpose(np.asarray(kernel), (3, 2, 0, 1))
    if bias is not None:
        sd[f"{name}.bias"] = np.asarray(bias)


def _inverse_convbn(sd, tree, stats, t_conv, t_bn):
    sd[f"{t_conv}.weight"] = np.transpose(
        np.asarray(tree["conv"]["kernel"]), (3, 2, 0, 1)
    )
    sd[f"{t_bn}.weight"] = np.asarray(tree["bn"]["scale"])
    sd[f"{t_bn}.bias"] = np.asarray(tree["bn"]["bias"])
    sd[f"{t_bn}.running_mean"] = np.asarray(stats["bn"]["mean"])
    sd[f"{t_bn}.running_var"] = np.asarray(stats["bn"]["var"])


def _inverse_gn(sd, name, gn):
    sd[f"{name}.weight"] = np.asarray(gn["scale"])
    sd[f"{name}.bias"] = np.asarray(gn["bias"])


def _inverse_convT(sd, name, kernel):
    """flax ConvTranspose kernel -> torch ConvTranspose2d weight (IOHW,
    spatially flipped — see torch_convert._convT_kernel)."""
    sd[f"{name}.weight"] = np.transpose(
        np.flip(np.asarray(kernel), axis=(0, 1)), (2, 3, 0, 1)
    )


# ---------------------------------------------------------------------------
# Encoder inverses
# ---------------------------------------------------------------------------


def _inverse_resnet_encoder(sd, p, s):
    """Our ResNetEncoder tree -> torchvision/smp resnet naming."""
    _inverse_convbn(sd, p["stem_conv"], s["stem_conv"], "encoder.conv1",
                    "encoder.bn1")
    for name in p:
        if not name.startswith("layer"):
            continue
        st, bl = name.replace("layer", "").split("_")
        t = f"encoder.layer{st}.{bl}"
        blk, bst = p[name], s[name]
        for ci in (1, 2, 3):
            if f"convbn{ci}" in blk:
                _inverse_convbn(sd, blk[f"convbn{ci}"], bst[f"convbn{ci}"],
                                f"{t}.conv{ci}", f"{t}.bn{ci}")
        if "conv_down" in blk:
            _inverse_convbn(sd, blk["conv_down"], bst["conv_down"],
                            f"{t}.downsample.0", f"{t}.downsample.1")


def _inverse_efficientnet_encoder(sd, p, s):
    """Our EfficientNetEncoder tree -> timm efficientnet naming."""
    _inverse_conv(sd, "encoder.conv_stem", p["conv_stem"]["kernel"])
    sd["encoder.bn1.weight"] = np.asarray(p["bnact_stem"]["bn"]["scale"])
    sd["encoder.bn1.bias"] = np.asarray(p["bnact_stem"]["bn"]["bias"])
    sd["encoder.bn1.running_mean"] = np.asarray(s["bnact_stem"]["bn"]["mean"])
    sd["encoder.bn1.running_var"] = np.asarray(s["bnact_stem"]["bn"]["var"])
    for name in p:
        if not name.startswith("stage"):
            continue
        st, bl = name.replace("stage", "").split("_block")
        t = f"encoder.blocks.{int(st) - 1}.{bl}"
        blk, bst = p[name], s[name]

        def bn_out(t_bn, f_name):
            sd[f"{t_bn}.weight"] = np.asarray(blk[f_name]["bn"]["scale"])
            sd[f"{t_bn}.bias"] = np.asarray(blk[f_name]["bn"]["bias"])
            sd[f"{t_bn}.running_mean"] = np.asarray(bst[f_name]["bn"]["mean"])
            sd[f"{t_bn}.running_var"] = np.asarray(bst[f_name]["bn"]["var"])

        if "conv_expand" in blk:
            _inverse_conv(sd, f"{t}.conv_pw", blk["conv_expand"]["kernel"])
            bn_out(f"{t}.bn1", "bnact_expand")
            _inverse_conv(sd, f"{t}.conv_dw", blk["conv_depthwise"]["kernel"])
            bn_out(f"{t}.bn2", "bnact_depthwise")
            _inverse_conv(sd, f"{t}.conv_pwl", blk["conv_project"]["kernel"])
            bn_out(f"{t}.bn3", "bnact_project")
        else:
            _inverse_conv(sd, f"{t}.conv_dw", blk["conv_depthwise"]["kernel"])
            bn_out(f"{t}.bn1", "bnact_depthwise")
            _inverse_conv(sd, f"{t}.conv_pw", blk["conv_project"]["kernel"])
            bn_out(f"{t}.bn2", "bnact_project")
        _inverse_conv(sd, f"{t}.se.conv_reduce",
                      blk["se"]["conv_reduce"]["kernel"],
                      blk["se"]["conv_reduce"]["bias"])
        _inverse_conv(sd, f"{t}.se.conv_expand",
                      blk["se"]["conv_expand"]["kernel"],
                      blk["se"]["conv_expand"]["bias"])


def _inverse_resnest_encoder(sd, p, s):
    """Our ResNeStEncoder tree -> timm resnest naming."""
    stem = [("conv1.0", "conv1.1", "stem_conv1"),
            ("conv1.3", "conv1.4", "stem_conv2"),
            ("conv1.6", "bn1", "stem_conv3")]
    for t_conv, t_bn, f_name in stem:
        _inverse_convbn(sd, p[f_name], s[f_name],
                        f"encoder.{t_conv}", f"encoder.{t_bn}")
    for name in p:
        if not name.startswith("layer"):
            continue
        st, bl = name.replace("layer", "").split("_")
        t = f"encoder.layer{st}.{bl}"
        blk, bst = p[name], s[name]
        _inverse_convbn(sd, blk["convbn1"], bst["convbn1"],
                        f"{t}.conv1", f"{t}.bn1")
        sp, sps = blk["splat"], bst["splat"]
        _inverse_conv(sd, f"{t}.conv2.conv", sp["conv"]["kernel"])
        for fb, tb in (("bn0", "bn0"), ("bn1", "bn1")):
            sd[f"{t}.conv2.{tb}.weight"] = np.asarray(sp[fb]["scale"])
            sd[f"{t}.conv2.{tb}.bias"] = np.asarray(sp[fb]["bias"])
            sd[f"{t}.conv2.{tb}.running_mean"] = np.asarray(sps[fb]["mean"])
            sd[f"{t}.conv2.{tb}.running_var"] = np.asarray(sps[fb]["var"])
        for ff, tf in (("conv_fc1", "fc1"), ("conv_fc2", "fc2")):
            _inverse_conv(sd, f"{t}.conv2.{tf}", sp[ff]["kernel"], sp[ff]["bias"])
        _inverse_convbn(sd, blk["convbn3"], bst["convbn3"],
                        f"{t}.conv3", f"{t}.bn3")
        if "conv_down" in blk:
            _inverse_convbn(sd, blk["conv_down"], bst["conv_down"],
                            f"{t}.downsample.1", f"{t}.downsample.2")


# Width multipliers for the reference's "efficientnet-bX" encoder names
# (smp 0.2.x dispatches those to the lukemelas efficientnet_pytorch package,
# whose state dicts use flat `_blocks.{i}` naming).
_EFFNET_WIDTH_MULTS = {"efficientnet-b3": 1.2, "efficientnet-b4": 1.4}


def _efficientnet_timm_to_lukemelas(sd, width_mult):
    """Rename an exported timm-style efficientnet encoder dict to the
    lukemelas naming smp's "efficientnet-bX" modules strict-load, and add
    the inert classification tail (`_conv_head` zero conv + identity
    `_bn1`) those modules still carry (only `_fc` is deleted by smp's
    encoder subclass); the segmentation forward never runs it."""
    from volume_segmantics_tpu.models.encoders.efficientnet import (
        _round_channels,
    )

    suffixes = ("weight", "bias", "running_mean", "running_var")
    out = {}

    def move(src_mod, dst_mod):
        for suffix in suffixes:
            k = f"{src_mod}.{suffix}"
            if k in sd:
                out[f"{dst_mod}.{suffix}"] = sd[k]

    move("encoder.conv_stem", "encoder._conv_stem")
    move("encoder.bn1", "encoder._bn0")
    blocks = sorted(
        {
            tuple(int(p) for p in k.split(".")[2:4])
            for k in sd
            if k.startswith("encoder.blocks.")
        }
    )
    for flat, (s, b) in enumerate(blocks):
        src = f"encoder.blocks.{s}.{b}"
        dst = f"encoder._blocks.{flat}"
        if f"{src}.conv_pwl.weight" in sd:
            pairs = (("conv_pw", "_expand_conv"), ("bn1", "_bn0"),
                     ("conv_dw", "_depthwise_conv"), ("bn2", "_bn1"),
                     ("conv_pwl", "_project_conv"), ("bn3", "_bn2"))
        else:
            pairs = (("conv_dw", "_depthwise_conv"), ("bn1", "_bn1"),
                     ("conv_pw", "_project_conv"), ("bn2", "_bn2"))
        pairs += (("se.conv_reduce", "_se_reduce"),
                  ("se.conv_expand", "_se_expand"))
        for new, old in pairs:
            move(f"{src}.{new}", f"{dst}.{old}")
    for k, v in sd.items():
        if not k.startswith("encoder."):
            out[k] = v
    head_ch = _round_channels(1280 * width_mult)
    last_ch = _round_channels(320 * width_mult)
    out["encoder._conv_head.weight"] = np.zeros(
        (head_ch, last_ch, 1, 1), np.float32
    )
    out["encoder._bn1.weight"] = np.ones((head_ch,), np.float32)
    out["encoder._bn1.bias"] = np.zeros((head_ch,), np.float32)
    out["encoder._bn1.running_mean"] = np.zeros((head_ch,), np.float32)
    out["encoder._bn1.running_var"] = np.ones((head_ch,), np.float32)
    return out


# ---------------------------------------------------------------------------
# Decoder inverses (smp naming; inverse of torch_convert.DECODER_CONVERTERS)
# ---------------------------------------------------------------------------


def _inverse_unet_decoder(sd, p, s):
    for name in p:
        i = name.replace("block", "")
        t = f"decoder.blocks.{i}"
        _inverse_convbn(sd, p[name]["convbn1"], s[name]["convbn1"],
                        f"{t}.conv1.0", f"{t}.conv1.1")
        _inverse_convbn(sd, p[name]["convbn2"], s[name]["convbn2"],
                        f"{t}.conv2.0", f"{t}.conv2.1")


def _inverse_unetpp_decoder(sd, p, s):
    for name in p:  # nodes already named x_{a}_{b}
        t = f"decoder.blocks.{name}"
        _inverse_convbn(sd, p[name]["convbn1"], s[name]["convbn1"],
                        f"{t}.conv1.0", f"{t}.conv1.1")
        _inverse_convbn(sd, p[name]["convbn2"], s[name]["convbn2"],
                        f"{t}.conv2.0", f"{t}.conv2.1")


def _inverse_fpn_decoder(sd, p, s):
    _inverse_conv(sd, "decoder.p5", p["conv_p5"]["kernel"], p["conv_p5"]["bias"])
    for lvl in (4, 3, 2):
        lat = p[f"fpn_p{lvl}"]["conv_lateral"]
        _inverse_conv(sd, f"decoder.p{lvl}.skip_conv", lat["kernel"], lat["bias"])
    for i, lvl in enumerate((5, 4, 3, 2)):
        seg = p[f"seg_p{lvl}"]
        for name in seg:
            j = name.replace("convgn", "")
            t = f"decoder.seg_blocks.{i}.block.{j}.block"
            _inverse_conv(sd, f"{t}.0", seg[name]["conv"]["kernel"])
            _inverse_gn(sd, f"{t}.1", seg[name]["gn"])


def _inverse_aspp(sd, p, s, t_prefix, separable):
    _inverse_convbn(sd, p["convbn_1x1"], s["convbn_1x1"],
                    f"{t_prefix}.convs.0.0", f"{t_prefix}.convs.0.1")
    for i, rate in enumerate((12, 24, 36), start=1):
        t = f"{t_prefix}.convs.{i}"
        if separable:
            sp, ss = p[f"sepconv_r{rate}"], s[f"sepconv_r{rate}"]
            _inverse_conv(sd, f"{t}.0.0", sp["conv_depthwise"]["kernel"])
            _inverse_conv(sd, f"{t}.0.1", sp["conv_pointwise"]["kernel"])
            sd[f"{t}.1.weight"] = np.asarray(sp["bn"]["scale"])
            sd[f"{t}.1.bias"] = np.asarray(sp["bn"]["bias"])
            sd[f"{t}.1.running_mean"] = np.asarray(ss["bn"]["mean"])
            sd[f"{t}.1.running_var"] = np.asarray(ss["bn"]["var"])
        else:
            _inverse_convbn(sd, p[f"convbn_r{rate}"], s[f"convbn_r{rate}"],
                            f"{t}.0", f"{t}.1")
    _inverse_convbn(sd, p["convbn_pool"], s["convbn_pool"],
                    f"{t_prefix}.convs.4.1", f"{t_prefix}.convs.4.2")
    _inverse_convbn(sd, p["convbn_project"], s["convbn_project"],
                    f"{t_prefix}.project.0", f"{t_prefix}.project.1")


def _inverse_sep_convbn(sd, sp, ss, t_sep, t_bn):
    _inverse_conv(sd, f"{t_sep}.0", sp["conv_depthwise"]["kernel"])
    _inverse_conv(sd, f"{t_sep}.1", sp["conv_pointwise"]["kernel"])
    sd[f"{t_bn}.weight"] = np.asarray(sp["bn"]["scale"])
    sd[f"{t_bn}.bias"] = np.asarray(sp["bn"]["bias"])
    sd[f"{t_bn}.running_mean"] = np.asarray(ss["bn"]["mean"])
    sd[f"{t_bn}.running_var"] = np.asarray(ss["bn"]["var"])


def _inverse_deeplabv3_decoder(sd, p, s):
    _inverse_aspp(sd, p["aspp"], s["aspp"], "decoder.0", separable=False)
    _inverse_convbn(sd, p["convbn_out"], s["convbn_out"], "decoder.1",
                    "decoder.2")


def _inverse_deeplabv3plus_decoder(sd, p, s):
    _inverse_aspp(sd, p["aspp"], s["aspp"], "decoder.aspp.0", separable=True)
    _inverse_sep_convbn(sd, p["sepconv_aspp"], s["sepconv_aspp"],
                        "decoder.aspp.1", "decoder.aspp.2")
    _inverse_convbn(sd, p["convbn_highres"], s["convbn_highres"],
                    "decoder.block1.0", "decoder.block1.1")
    _inverse_sep_convbn(sd, p["sepconv_fuse"], s["sepconv_fuse"],
                        "decoder.block2.0", "decoder.block2.1")


def _inverse_manet_decoder(sd, p, s):
    for t_name, f_name in (("top_conv", "conv_top"),
                           ("center_conv", "conv_center"),
                           ("bottom_conv", "conv_bottom"),
                           ("out_conv", "conv_map")):
        cv = p["pab"][f_name]
        _inverse_conv(sd, f"decoder.center.{t_name}", cv["kernel"], cv["bias"])
    for name in p:
        if name.startswith("mfab"):
            i = name.replace("mfab", "")
            t = f"decoder.blocks.{i}"
            blk, bst = p[name], s[name]
            _inverse_convbn(sd, blk["convbn_hl1"], bst["convbn_hl1"],
                            f"{t}.hl_conv.0.0", f"{t}.hl_conv.0.1")
            _inverse_convbn(sd, blk["convbn_hl2"], bst["convbn_hl2"],
                            f"{t}.hl_conv.1.0", f"{t}.hl_conv.1.1")
            for f_se, t_se in (("se_hl", "SE_hl"), ("se_ll", "SE_ll")):
                sq, ex = blk[f_se]["conv_squeeze"], blk[f_se]["conv_excite"]
                _inverse_conv(sd, f"{t}.{t_se}.1", sq["kernel"], sq["bias"])
                _inverse_conv(sd, f"{t}.{t_se}.3", ex["kernel"], ex["bias"])
            _inverse_convbn(sd, blk["convbn1"], bst["convbn1"],
                            f"{t}.conv1.0", f"{t}.conv1.1")
            _inverse_convbn(sd, blk["convbn2"], bst["convbn2"],
                            f"{t}.conv2.0", f"{t}.conv2.1")
        elif name.startswith("block"):
            i = name.replace("block", "")
            t = f"decoder.blocks.{i}"
            _inverse_convbn(sd, p[name]["convbn1"], s[name]["convbn1"],
                            f"{t}.conv1.0", f"{t}.conv1.1")
            _inverse_convbn(sd, p[name]["convbn2"], s[name]["convbn2"],
                            f"{t}.conv2.0", f"{t}.conv2.1")


def _inverse_linknet_decoder(sd, p, s):
    for name in p:
        i = name.replace("block", "")
        t = f"decoder.blocks.{i}.block"
        blk, bst = p[name], s[name]
        _inverse_convbn(sd, blk["convbn1"], bst["convbn1"], f"{t}.0.0",
                        f"{t}.0.1")
        _inverse_convT(sd, f"{t}.1.0", blk["transpose"]["convT"]["kernel"])
        sd[f"{t}.1.1.weight"] = np.asarray(blk["transpose"]["bn"]["scale"])
        sd[f"{t}.1.1.bias"] = np.asarray(blk["transpose"]["bn"]["bias"])
        sd[f"{t}.1.1.running_mean"] = np.asarray(
            bst["transpose"]["bn"]["mean"])
        sd[f"{t}.1.1.running_var"] = np.asarray(bst["transpose"]["bn"]["var"])
        _inverse_convbn(sd, blk["convbn2"], bst["convbn2"], f"{t}.2.0",
                        f"{t}.2.1")


def _inverse_pan_decoder(sd, p, s):
    def inv_cbr(t_prefix, node, snode):
        _inverse_conv(sd, f"{t_prefix}.conv", node["conv"]["kernel"],
                      node["conv"]["bias"])
        sd[f"{t_prefix}.bn.weight"] = np.asarray(node["bn"]["scale"])
        sd[f"{t_prefix}.bn.bias"] = np.asarray(node["bn"]["bias"])
        sd[f"{t_prefix}.bn.running_mean"] = np.asarray(snode["bn"]["mean"])
        sd[f"{t_prefix}.bn.running_var"] = np.asarray(snode["bn"]["var"])

    fpa_map = (("branch1.1", "branch1"), ("mid.0", "mid"), ("down1.1", "down1"),
               ("down2.1", "down2"), ("down3.1", "down3a"),
               ("down3.2", "down3b"), ("conv2", "conv2"), ("conv1", "conv1"))
    for t_name, f_name in fpa_map:
        inv_cbr(f"decoder.fpa.{t_name}", p["fpa"][f_name], s["fpa"][f_name])
    for k in (3, 2, 1):
        inv_cbr(f"decoder.gau{k}.conv1.1", p[f"gau{k}"]["conv1"],
                s[f"gau{k}"]["conv1"])
        inv_cbr(f"decoder.gau{k}.conv2", p[f"gau{k}"]["conv2"],
                s[f"gau{k}"]["conv2"])


DECODER_INVERSES = {
    ModelType.U_NET: _inverse_unet_decoder,
    ModelType.U_NET_PLUS_PLUS: _inverse_unetpp_decoder,
    ModelType.FPN: _inverse_fpn_decoder,
    ModelType.DEEPLABV3: _inverse_deeplabv3_decoder,
    ModelType.DEEPLABV3_PLUS: _inverse_deeplabv3plus_decoder,
    ModelType.MA_NET: _inverse_manet_decoder,
    ModelType.LINKNET: _inverse_linknet_decoder,
    ModelType.PAN: _inverse_pan_decoder,
}


# ---------------------------------------------------------------------------
# Public export API
# ---------------------------------------------------------------------------


def smp_state_dict_from_variables(
    variables: Dict[str, Any], struc: dict
) -> Dict[str, np.ndarray]:
    """Our Flax {params, batch_stats} -> flat smp-named numpy state dict
    (the exact inverse of torch_convert.convert_smp_state_dict)."""
    from flax import serialization

    import jax

    params = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(variables["params"])
    )
    stats = jax.tree_util.tree_map(
        np.asarray, serialization.to_state_dict(variables.get("batch_stats", {}))
    )
    encoder_name = struc.get("encoder_name", "resnet34")
    model_type = struc.get("type")
    if isinstance(model_type, str):
        model_type = ModelType[model_type.upper()]
    sd: Dict[str, np.ndarray] = {}
    if encoder_name.startswith(("resnet", "resnext")):
        _inverse_resnet_encoder(sd, params["encoder"], stats["encoder"])
    elif "efficientnet" in encoder_name:
        _inverse_efficientnet_encoder(sd, params["encoder"], stats["encoder"])
        if encoder_name in _EFFNET_WIDTH_MULTS:
            # The reference's "efficientnet-bX" modules use lukemelas
            # naming; a "timm-efficientnet-bX" name keeps timm naming.
            renamed = _efficientnet_timm_to_lukemelas(
                sd, _EFFNET_WIDTH_MULTS[encoder_name]
            )
            sd.clear()
            sd.update(renamed)
    elif "resnest" in encoder_name:
        _inverse_resnest_encoder(sd, params["encoder"], stats["encoder"])
    else:
        raise NotImplementedError(
            f"Torch export for encoder '{encoder_name}' is not implemented."
        )
    DECODER_INVERSES[model_type](sd, params["decoder"], stats.get("decoder", {}))
    _inverse_conv(sd, "segmentation_head.0", params["head_conv"]["kernel"],
                  params["head_conv"]["bias"])
    # torch BatchNorm modules carry num_batches_tracked in their state dict;
    # strict load_state_dict in the reference requires the key to exist.
    for key in [k for k in sd if k.endswith(".running_mean")]:
        sd[key[: -len("running_mean")] + "num_batches_tracked"] = np.array(
            0, dtype=np.int64
        )
    return sd


def export_torch_checkpoint(out_path: Path, checkpoint: Dict[str, Any]) -> Path:
    """Write a native checkpoint dict (as produced by models/checkpoint.py:
    {model_state_dict (flax tree), model_struc_dict, loss_val, label_codes})
    as a reference-format torch file (reference
    utilities/early_stopping.py:50-63 key schema)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "Exporting torch checkpoints requires the torch (CPU) wheel."
        ) from e

    from volume_segmantics_tpu.models.torch_convert import (
        _install_reference_stubs,
    )

    struc = dict(checkpoint["model_struc_dict"])
    sd = smp_state_dict_from_variables(
        {
            "params": checkpoint["model_state_dict"]["params"],
            "batch_stats": checkpoint["model_state_dict"].get(
                "batch_stats", {}
            ),
        },
        struc,
    )
    # Pickle the ModelType under the reference's module path so the
    # reference package can unpickle it without this package installed.
    _install_reference_stubs()
    t = struc.get("type")
    if hasattr(t, "name"):
        import sys

        ref_mod = sys.modules.get("volume_segmantics.utilities.base_data_utils")
        if ref_mod is not None and hasattr(ref_mod, "ModelType"):
            struc["type"] = ref_mod.ModelType[t.name]
    blob = {
        "model_state_dict": {
            k: torch.as_tensor(np.ascontiguousarray(v)) for k, v in sd.items()
        },
        "model_struc_dict": struc,
        "optimizer_state_dict": {},
        "loss_val": float(checkpoint.get("loss_val", np.inf)),
        "label_codes": checkpoint.get("label_codes", {}),
    }
    out_path = Path(out_path)
    torch.save(blob, out_path)
    logging.info(
        f"Exported reference-format torch checkpoint to {out_path} "
        f"({len(sd)} tensors)."
    )
    return out_path


def export_checkpoint_file(src_path: Path, out_path: Path) -> Path:
    """Convert a native (msgpack) checkpoint file to the reference's torch
    format."""
    from volume_segmantics_tpu.models.checkpoint import load_checkpoint

    return export_torch_checkpoint(Path(out_path), load_checkpoint(Path(src_path)))
