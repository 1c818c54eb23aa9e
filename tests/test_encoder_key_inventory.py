"""Encoder state-dict NAME-inventory pins (VERDICT r3 #7).

The torch interop layer must speak the exact tensor names of the upstream
packages the reference loads its encoders from (reference README.md:67-76,
model/model_2d.py:42-57): torchvision resnets, lukemelas
efficientnet_pytorch (smp's "efficientnet-bX"), and timm resnest. None of
those packages exist in this environment, so the canonical key inventories
are DERIVED IN THIS TEST from first principles of each package's module
structure (block counts, submodule attribute names, BatchNorm state keys) —
independently of the converter code under test — and the exported smp
checkpoint keys must match them 1:1. Together with the import/export
roundtrip tests in test_torch_convert.py (import(export(x)) == x), this
pins BOTH conversion directions to the real naming.

Inventories model the SMP CHECKPOINT form: smp's encoder subclasses delete
the classifier (`fc` for resnet/resnest, `_fc` for efficientnet) but keep
everything else, including efficientnet's inert `_conv_head`/`_bn1` tail.
"""

import math

import pytest

import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.utils.base_data_utils import ModelType

pytestmark = pytest.mark.slow


def _bn(name):
    """torch.nn.BatchNorm2d state-dict entries."""
    return [
        f"{name}.weight",
        f"{name}.bias",
        f"{name}.running_mean",
        f"{name}.running_var",
        f"{name}.num_batches_tracked",
    ]


def torchvision_resnet_keys(layers, bottleneck):
    """torchvision.models.resnet.ResNet state-dict names (minus fc/avgpool,
    which smp's ResNetEncoder deletes). Blocks: BasicBlock has conv1/bn1/
    conv2/bn2; Bottleneck conv1..3/bn1..3; the first block of a stage gets
    `downsample.0` (conv) + `downsample.1` (bn) whenever the residual shape
    changes — every stage for Bottleneck, stages 2-4 for BasicBlock."""
    keys = ["conv1.weight"] + _bn("bn1")
    n_convs = 3 if bottleneck else 2
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            for ci in range(1, n_convs + 1):
                keys += [f"{p}.conv{ci}.weight"] + _bn(f"{p}.bn{ci}")
            if bi == 0 and (bottleneck or li > 1):
                keys += [f"{p}.downsample.0.weight"] + _bn(f"{p}.downsample.1")
    return keys


def lukemelas_efficientnet_keys(depth_coefficient):
    """efficientnet_pytorch.EfficientNet state-dict names (minus `_fc`).
    Stage plan from the EfficientNet-B0 base (repeats 1,2,2,3,3,4,1; expand
    ratio 1 for stage 0 else 6), depth-scaled with int(ceil(d * r)) exactly
    as efficientnet_pytorch.utils.round_repeats does. MBConvBlock:
    `_expand_conv`/`_bn0` (skipped when expand_ratio == 1),
    `_depthwise_conv`/`_bn1`, SE `_se_reduce`/`_se_expand` (conv, with
    bias), `_project_conv`/`_bn2`. Model tail: `_conv_head` + `_bn1`."""
    base_repeats = (1, 2, 2, 3, 3, 4, 1)
    expand_ratios = (1, 6, 6, 6, 6, 6, 6)
    keys = ["_conv_stem.weight"] + _bn("_bn0")
    i = 0
    for repeats, expand in zip(base_repeats, expand_ratios):
        for _ in range(int(math.ceil(depth_coefficient * repeats))):
            p = f"_blocks.{i}"
            if expand != 1:
                keys += [f"{p}._expand_conv.weight"] + _bn(f"{p}._bn0")
            keys += [f"{p}._depthwise_conv.weight"] + _bn(f"{p}._bn1")
            keys += [
                f"{p}._se_reduce.weight",
                f"{p}._se_reduce.bias",
                f"{p}._se_expand.weight",
                f"{p}._se_expand.bias",
            ]
            keys += [f"{p}._project_conv.weight"] + _bn(f"{p}._bn2")
            i += 1
    keys += ["_conv_head.weight"] + _bn("_bn1")
    return keys


def timm_resnest_keys(layers):
    """timm.models.resnet.ResNet state-dict names for the resnest50d /
    resnest101e configs (minus fc, which smp's encoder deletes): deep stem
    (`conv1.0/3/6` convs with bns at `conv1.1/4` then `bn1`), ResNestBottleneck
    blocks whose conv2 is a SplitAttn module (`conv`, `bn0`, `fc1`, `bn1`,
    `fc2` — fc are 1x1 convs WITH bias), and avg-down shortcuts
    (`downsample.1` conv + `downsample.2` bn behind an unparameterised
    AvgPool2d at index 0) on every first block of a stage."""
    keys = (
        ["conv1.0.weight"]
        + _bn("conv1.1")
        + ["conv1.3.weight"]
        + _bn("conv1.4")
        + ["conv1.6.weight"]
        + _bn("bn1")
    )
    for li, blocks in enumerate(layers, start=1):
        for bi in range(blocks):
            p = f"layer{li}.{bi}"
            keys += [f"{p}.conv1.weight"] + _bn(f"{p}.bn1")
            keys += [f"{p}.conv2.conv.weight"] + _bn(f"{p}.conv2.bn0")
            keys += [f"{p}.conv2.fc1.weight", f"{p}.conv2.fc1.bias"]
            keys += _bn(f"{p}.conv2.bn1")
            keys += [f"{p}.conv2.fc2.weight", f"{p}.conv2.fc2.bias"]
            keys += [f"{p}.conv3.weight"] + _bn(f"{p}.bn3")
            if bi == 0:
                keys += [f"{p}.downsample.1.weight"] + _bn(f"{p}.downsample.2")
    return keys


CANONICAL_INVENTORIES = {
    "resnet34": torchvision_resnet_keys((3, 4, 6, 3), bottleneck=False),
    "resnet50": torchvision_resnet_keys((3, 4, 6, 3), bottleneck=True),
    "resnext50_32x4d": torchvision_resnet_keys((3, 4, 6, 3), bottleneck=True),
    "efficientnet-b3": lukemelas_efficientnet_keys(1.4),
    "efficientnet-b4": lukemelas_efficientnet_keys(1.8),
    "timm-resnest50d": timm_resnest_keys((3, 4, 6, 3)),
    "timm-resnest101e": timm_resnest_keys((3, 4, 23, 3)),
}


@pytest.mark.parametrize("encoder_name", sorted(CANONICAL_INVENTORIES))
def test_exported_encoder_keys_match_canonical_inventory(encoder_name):
    """Exported smp checkpoints must carry EXACTLY the upstream packages'
    tensor names for each encoder — no missing keys (strict load in the
    reference would fail), no extras (strict load would also fail)."""
    import jax

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.torch_export import (
        smp_state_dict_from_variables,
    )

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": encoder_name,
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(0))
    sd = smp_state_dict_from_variables(bundle.variables, struc)
    exported = {
        k[len("encoder."):] for k in sd if k.startswith("encoder.")
    }
    canonical = set(CANONICAL_INVENTORIES[encoder_name])
    missing = sorted(canonical - exported)
    extra = sorted(exported - canonical)
    assert not missing and not extra, (
        f"{encoder_name}: {len(missing)} canonical keys missing from export "
        f"(first 10: {missing[:10]}); {len(extra)} extra exported keys "
        f"(first 10: {extra[:10]})"
    )


@pytest.mark.parametrize(
    "encoder_name", ["resnet34", "efficientnet-b3", "timm-resnest50d"]
)
def test_import_consumes_full_canonical_inventory(encoder_name):
    """The pretrained-import direction reads every canonical key: feed the
    exported dict (whose names the test above pins to canon) through
    convert_encoder_state_dict with access tracking and assert no canonical
    encoder key goes unread, so a real downloaded checkpoint is consumed
    1:1 rather than silently partially."""
    import jax

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.torch_convert import (
        convert_encoder_state_dict,
    )
    from volume_segmantics_tpu.models.torch_export import (
        smp_state_dict_from_variables,
    )

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": encoder_name,
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(1))
    sd = smp_state_dict_from_variables(bundle.variables, struc)
    enc_sd = {k: v for k, v in sd.items() if k.startswith("encoder.")}

    accessed = set()

    class Recorder(dict):
        def __getitem__(self, key):
            accessed.add(key)
            return dict.__getitem__(self, key)

        def get(self, key, default=None):
            accessed.add(key)
            return dict.get(self, key, default)

    convert_encoder_state_dict(Recorder(enc_sd), encoder_name)
    unread = {
        k
        for k in CANONICAL_INVENTORIES[encoder_name]
        # num_batches_tracked carries no information (torch bookkeeping);
        # the converter is allowed to skip it. Likewise efficientnet's
        # `_conv_head`/`_bn1` classification tail: it has no counterpart in
        # the segmentation model (smp never runs it), so import ignores it
        # (export still emits an inert one because strict load needs the
        # keys to EXIST).
        if not k.endswith("num_batches_tracked")
        and not k.startswith(("_conv_head.", "_bn1."))
        and f"encoder.{k}" not in accessed
    }
    assert not unread, (
        f"{encoder_name}: canonical keys never read on import "
        f"(first 10: {sorted(unread)[:10]})"
    )
