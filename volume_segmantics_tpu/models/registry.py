"""Model factory: ModelType + encoder name -> Flax segmentation model.

TPU-native counterpart of reference volume_segmantics/model/model_2d.py:10-39
(which dispatches to segmentation_models_pytorch). Models are NHWC; the
public `apply` helpers accept/return NCHW to preserve the reference's array
conventions at the API boundary.
"""

import logging
from typing import Any, Callable, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from volume_segmantics_tpu.models.layers import resize_to
from volume_segmantics_tpu.utils.base_data_utils import ModelType

# ---------------------------------------------------------------------------
# Encoder registry
# ---------------------------------------------------------------------------


def _get_encoder(name: str, dtype, output_stride: int = 32):
    from volume_segmantics_tpu.models.encoders import resnet

    builders = {
        "resnet34": resnet.resnet34,
        "resnet50": resnet.resnet50,
        "resnext50_32x4d": resnet.resnext50_32x4d,
    }
    try:
        from volume_segmantics_tpu.models.encoders import efficientnet

        builders.update(
            {
                "efficientnet-b3": efficientnet.efficientnet_b3,
                "efficientnet-b4": efficientnet.efficientnet_b4,
            }
        )
    except ImportError:
        pass
    try:
        from volume_segmantics_tpu.models.encoders import resnest

        builders.update(
            {
                "timm-resnest50d": resnest.resnest50d,
                "timm-resnest101e": resnest.resnest101e,
            }
        )
    except ImportError:
        pass
    if name not in builders:
        raise ValueError(
            f"Encoder '{name}' is not supported. Available: {sorted(builders)}"
        )
    return builders[name](dtype=dtype, output_stride=output_stride)


def available_encoders() -> Sequence[str]:
    names = ["resnet34", "resnet50", "resnext50_32x4d"]
    try:
        from volume_segmantics_tpu.models.encoders import efficientnet  # noqa: F401

        names += ["efficientnet-b3", "efficientnet-b4"]
    except ImportError:
        pass
    try:
        from volume_segmantics_tpu.models.encoders import resnest  # noqa: F401

        names += ["timm-resnest50d", "timm-resnest101e"]
    except ImportError:
        pass
    return names


# ---------------------------------------------------------------------------
# Generic encoder-decoder wrapper
# ---------------------------------------------------------------------------


class SegmentationModel(nn.Module):
    """Encoder + decoder + 3x3 segmentation head (smp SegmentationHead
    analogue). Input/output NHWC."""

    encoder: nn.Module
    decoder: nn.Module
    classes: int
    head_upsampling: int = 1
    head_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_h, in_w = x.shape[1], x.shape[2]
        features = self.encoder(x, train)
        decoded = self.decoder(features, train)
        k = self.head_kernel
        logits = nn.Conv(
            self.classes,
            (k, k),
            padding=[(k // 2, k // 2), (k // 2, k // 2)],
            dtype=self.dtype,
            name="head_conv",
        )(decoded)
        if self.head_upsampling > 1:
            # smp's SegmentationHead upsamples with nn.UpsamplingBilinear2d,
            # i.e. align_corners=True (pinned by tests/test_torch_oracle.py).
            logits = resize_to(
                logits,
                decoded.shape[1] * self.head_upsampling,
                decoded.shape[2] * self.head_upsampling,
                "bilinear",
                align_corners=True,
            )
        # Guard: decoders whose output stride != 1 return logits at input res.
        if logits.shape[1] != in_h or logits.shape[2] != in_w:
            logits = resize_to(logits, in_h, in_w, "bilinear")
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Architecture registry
# ---------------------------------------------------------------------------


def _build_unet(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.unet import UnetDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=UnetDecoder(dtype=dtype),
        classes=classes,
        dtype=dtype,
    )


def _build_unetpp(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.unetpp import UnetPlusPlusDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=UnetPlusPlusDecoder(dtype=dtype),
        classes=classes,
        dtype=dtype,
    )


def _build_fpn(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.fpn import FPNDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=FPNDecoder(dtype=dtype),
        classes=classes,
        head_upsampling=4,
        head_kernel=1,
        dtype=dtype,
    )


def _build_deeplabv3(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.deeplab import DeepLabV3Decoder

    return SegmentationModel(
        encoder=encoder,
        decoder=DeepLabV3Decoder(dtype=dtype),
        classes=classes,
        head_upsampling=8,
        head_kernel=1,
        dtype=dtype,
    )


def _build_deeplabv3plus(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.deeplab import DeepLabV3PlusDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=DeepLabV3PlusDecoder(dtype=dtype),
        classes=classes,
        head_upsampling=4,
        head_kernel=1,
        dtype=dtype,
    )


def _build_manet(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.manet import MAnetDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=MAnetDecoder(dtype=dtype),
        classes=classes,
        dtype=dtype,
    )


def _build_linknet(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.linknet import LinknetDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=LinknetDecoder(dtype=dtype),
        classes=classes,
        head_kernel=1,
        dtype=dtype,
    )


def _build_pan(encoder, enc_channels, classes, dtype):
    from volume_segmantics_tpu.models.decoders.pan import PANDecoder

    return SegmentationModel(
        encoder=encoder,
        decoder=PANDecoder(dtype=dtype),
        classes=classes,
        head_upsampling=4,
        dtype=dtype,
    )


_ARCH_BUILDERS: Dict[ModelType, Tuple[Callable, int]] = {
    # builder, encoder output_stride
    ModelType.U_NET: (_build_unet, 32),
    ModelType.U_NET_PLUS_PLUS: (_build_unetpp, 32),
    ModelType.FPN: (_build_fpn, 32),
    ModelType.DEEPLABV3: (_build_deeplabv3, 8),
    ModelType.DEEPLABV3_PLUS: (_build_deeplabv3plus, 16),
    ModelType.MA_NET: (_build_manet, 32),
    ModelType.LINKNET: (_build_linknet, 32),
    ModelType.PAN: (_build_pan, 16),
}


def create_model(model_struc_dict: dict, dtype=None) -> nn.Module:
    """Build a Flax segmentation model from a reference-format structure
    dict: {type: ModelType|str, encoder_name, encoder_weights, in_channels,
    classes} (reference model_2d.py:10-39 input contract)."""
    struct = dict(model_struc_dict)
    model_type = struct.pop("type")
    if isinstance(model_type, str):
        from volume_segmantics_tpu.utils.base_data_utils import (
            create_enum_from_setting,
        )

        model_type = create_enum_from_setting(model_type, ModelType)
    encoder_name = struct.get("encoder_name", "resnet34")
    classes = struct.get("classes", 2)
    if dtype is None:
        dtype = jnp.float32
    builder, output_stride = _ARCH_BUILDERS[model_type]
    if model_type == ModelType.PAN and "resnest" in encoder_name:
        raise ValueError("ResNeSt encoders are not compatible with PAN.")
    encoder, enc_channels = _get_encoder(encoder_name, dtype, output_stride)
    model = builder(encoder, enc_channels, classes, dtype)
    logging.info(
        f"Built {model_type.name} with encoder {encoder_name} "
        f"({classes} classes, dtype={jnp.dtype(dtype).name})."
    )
    return model
