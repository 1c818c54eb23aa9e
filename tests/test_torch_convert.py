"""Torch-checkpoint interop: synthesize a reference-format (smp U-Net +
ResNet-34) torch checkpoint and verify conversion into the Flax model."""

import numpy as np
import pytest

import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.utils.base_data_utils import ModelType

BASIC_LAYERS = (3, 4, 6, 3)
STAGE_CH = (64, 128, 256, 512)


def _bn(sd, name, ch):
    sd[f"{name}.weight"] = np.random.randn(ch).astype(np.float32)
    sd[f"{name}.bias"] = np.random.randn(ch).astype(np.float32)
    sd[f"{name}.running_mean"] = np.zeros(ch, np.float32)
    sd[f"{name}.running_var"] = np.ones(ch, np.float32)
    sd[f"{name}.num_batches_tracked"] = np.array(0)


def make_smp_unet_resnet34_state_dict(in_channels=1, classes=4):
    """Builds a state_dict with segmentation_models_pytorch's names/shapes
    for Unet(resnet34) — the reference's default architecture."""
    sd = {}
    sd["encoder.conv1.weight"] = np.random.randn(64, in_channels, 7, 7).astype(
        np.float32
    )
    _bn(sd, "encoder.bn1", 64)
    in_ch = 64
    for stage, (n_blocks, ch) in enumerate(zip(BASIC_LAYERS, STAGE_CH), start=1):
        for b in range(n_blocks):
            pre = f"encoder.layer{stage}.{b}"
            stride_in = in_ch if b == 0 else ch
            sd[f"{pre}.conv1.weight"] = np.random.randn(ch, stride_in, 3, 3).astype(
                np.float32
            )
            _bn(sd, f"{pre}.bn1", ch)
            sd[f"{pre}.conv2.weight"] = np.random.randn(ch, ch, 3, 3).astype(
                np.float32
            )
            _bn(sd, f"{pre}.bn2", ch)
            if b == 0 and (stage > 1):
                sd[f"{pre}.downsample.0.weight"] = np.random.randn(
                    ch, in_ch, 1, 1
                ).astype(np.float32)
                _bn(sd, f"{pre}.downsample.1", ch)
        in_ch = ch
    # smp UnetDecoder: in [512+256, 256+128, 128+64, 64+64, 32+0] -> out
    dec_in = [512 + 256, 256 + 128, 128 + 64, 64 + 64, 32]
    dec_out = [256, 128, 64, 32, 16]
    for i, (ic, oc) in enumerate(zip(dec_in, dec_out)):
        pre = f"decoder.blocks.{i}"
        sd[f"{pre}.conv1.0.weight"] = np.random.randn(oc, ic, 3, 3).astype(np.float32)
        _bn(sd, f"{pre}.conv1.1", oc)
        sd[f"{pre}.conv2.0.weight"] = np.random.randn(oc, oc, 3, 3).astype(np.float32)
        _bn(sd, f"{pre}.conv2.1", oc)
    sd["segmentation_head.0.weight"] = np.random.randn(classes, 16, 3, 3).astype(
        np.float32
    )
    sd["segmentation_head.0.bias"] = np.random.randn(classes).astype(np.float32)
    return sd


@pytest.fixture()
def torch_checkpoint_path(tmp_path):
    torch = pytest.importorskip("torch")
    sd = make_smp_unet_resnet34_state_dict()
    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": 4,
    }
    blob = {
        "model_state_dict": {k: torch.tensor(v) for k, v in sd.items()},
        "model_struc_dict": struc,
        "optimizer_state_dict": {},
        "loss_val": 0.25,
        "label_codes": {"0": "bg"},
    }
    path = tmp_path / "ref_model.pytorch"
    torch.save(blob, path)
    return path


def test_convert_smp_state_dict_shapes():
    from volume_segmantics_tpu.models.torch_convert import convert_smp_state_dict

    sd = make_smp_unet_resnet34_state_dict()
    struc = {"type": ModelType.U_NET, "encoder_name": "resnet34", "classes": 4}
    state = convert_smp_state_dict(sd, struc)
    k = state["params"]["encoder"]["stem_conv"]["conv"]["kernel"]
    assert k.shape == (7, 7, 1, 64)
    assert np.allclose(k, np.transpose(sd["encoder.conv1.weight"], (2, 3, 1, 0)))
    assert state["params"]["head_conv"]["kernel"].shape == (3, 3, 16, 4)
    assert "mean" in state["batch_stats"]["encoder"]["stem_conv"]["bn"]


@pytest.mark.slow
def test_load_reference_torch_checkpoint(torch_checkpoint_path):
    import jax.numpy as jnp

    from volume_segmantics_tpu.model.model_2d import create_model_from_file

    bundle, classes, label_codes = create_model_from_file(torch_checkpoint_path)
    assert classes == 4
    assert label_codes == {"0": "bg"}
    y = bundle.apply_nchw(jnp.zeros((1, 1, 64, 64), jnp.float32))
    assert y.shape == (1, 4, 64, 64)


@pytest.mark.slow
def test_pretrained_encoder_cache(tmp_path, monkeypatch):
    """Encoder weights from a VOLSEG_TPU_WEIGHTS_DIR cache are merged (with
    3->1 channel first-conv adaptation)."""
    from flax import serialization

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.torch_convert import _convert_resnet_encoder

    sd = make_smp_unet_resnet34_state_dict(in_channels=3)
    params, stats = {}, {}
    _convert_resnet_encoder(sd, params, stats, prefix="encoder")
    blob = {"params": params["encoder"], "batch_stats": stats["encoder"]}
    (tmp_path / "resnet34.vstpu").write_bytes(serialization.msgpack_serialize(blob))
    monkeypatch.setenv("VOLSEG_TPU_WEIGHTS_DIR", str(tmp_path))

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": "imagenet",
        "in_channels": 1,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    got = np.asarray(bundle.params["encoder"]["stem_conv"]["conv"]["kernel"])
    expected = np.transpose(sd["encoder.conv1.weight"], (2, 3, 1, 0)).sum(
        axis=2, keepdims=True
    )
    assert got.shape == (7, 7, 1, 64)
    assert np.allclose(got, expected, atol=1e-6)
