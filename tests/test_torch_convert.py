"""Torch-checkpoint interop: synthesize a reference-format (smp U-Net +
ResNet-34) torch checkpoint and verify conversion into the Flax model."""

from pathlib import Path

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


def _timm_sd_from_ours(encoder_name, params, stats):
    """Inverse of the converter: emit a timm-named state dict from our
    initialised encoder tree via the package's export inverses
    (models/torch_export.py). converter(inverse(x)) == x proves full
    coverage + correct transposition."""
    from volume_segmantics_tpu.models import torch_export as tex

    sd = {}
    if "efficientnet" in encoder_name:
        tex._inverse_efficientnet_encoder(sd, params, stats)
    elif "resnest" in encoder_name:
        tex._inverse_resnest_encoder(sd, params, stats)
    else:
        tex._inverse_resnet_encoder(sd, params, stats)
    return sd


# ---------------------------------------------------------------------------
# Whole-model (encoder + decoder + head) roundtrip per architecture
# ---------------------------------------------------------------------------


from volume_segmantics_tpu.models.torch_export import (  # noqa: E402
    DECODER_INVERSES as _DECODER_INVERSES,
    _inverse_conv,
    _inverse_resnet_encoder,
)


@pytest.mark.slow
@pytest.mark.parametrize("model_type", list(ModelType))
def test_model_conversion_roundtrip(model_type):
    """For every architecture: build our model, emit an smp-named torch
    state dict from its parameters (the inverse map), run the converter,
    and require every leaf to round-trip exactly with full coverage.
    This is the drop-in guarantee for reference .pytorch checkpoints
    (reference model/model_2d.py:42-57)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.torch_convert import convert_smp_state_dict

    struc = {
        "type": model_type,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 3,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(7))
    params = jax.tree_util.tree_map(np.asarray, bundle.variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, bundle.variables.get("batch_stats", {})
    )

    sd = {}
    _inverse_resnet_encoder(sd, params["encoder"], stats["encoder"])
    _DECODER_INVERSES[model_type](
        sd, params["decoder"], stats.get("decoder", {})
    )
    _inverse_conv(sd, "segmentation_head.0", params["head_conv"]["kernel"],
                  params["head_conv"]["bias"])

    state = convert_smp_state_dict(sd, struc)

    merged = serialization.from_state_dict(params, state["params"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    n_ours = len(jax.tree_util.tree_leaves(params))
    n_conv = len(jax.tree_util.tree_leaves(state["params"]))
    assert n_conv == n_ours, f"converter covered {n_conv}/{n_ours} leaves"

    if stats:
        merged_stats = serialization.from_state_dict(
            stats, state["batch_stats"]
        )
        for a, b in zip(jax.tree_util.tree_leaves(stats),
                        jax.tree_util.tree_leaves(merged_stats)):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        assert len(jax.tree_util.tree_leaves(state["batch_stats"])) == len(
            jax.tree_util.tree_leaves(stats)
        )

    # The converted tree must also run: forward a tiny input.
    y = bundle.module.apply(
        {"params": merged, "batch_stats": stats} if stats else {"params": merged},
        jnp.zeros((1, 64, 64, 1), jnp.float32),
        train=False,
    )
    assert y.shape == (1, 64, 64, 3)


@pytest.mark.slow
@pytest.mark.parametrize(
    "encoder_name", ["efficientnet-b3", "timm-resnest50d"]
)
def test_encoder_conversion_roundtrip(encoder_name):
    """converter(inverse(our_params)) must reproduce our params exactly,
    proving the timm name map covers every leaf with correct layout."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from volume_segmantics_tpu.models.registry import _get_encoder
    from volume_segmantics_tpu.models.torch_convert import (
        convert_encoder_state_dict,
    )

    encoder, _ = _get_encoder(encoder_name, jnp.float32)
    variables = jax.jit(lambda r, d: encoder.init(r, d, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = _timm_sd_from_ours(encoder_name, params, stats)
    name = encoder_name.replace("timm-", "")
    conv_params, conv_stats = convert_encoder_state_dict(sd, name)
    # Every leaf must round-trip exactly
    merged = serialization.from_state_dict(params, conv_params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(merged)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    merged_stats = serialization.from_state_dict(stats, conv_stats)
    for a, b in zip(
        jax.tree_util.tree_leaves(stats), jax.tree_util.tree_leaves(merged_stats)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    # And the converter must have produced every leaf (no silent fallbacks
    # to the init template).
    n_ours = len(jax.tree_util.tree_leaves(params))
    n_conv = len(jax.tree_util.tree_leaves(conv_params))
    assert n_conv == n_ours


# ---------------------------------------------------------------------------
# Pretrained pipeline end-to-end, every encoder family (VERDICT r1 item 9):
# torch .pth -> tools/convert_torch_encoder.py -> $VOLSEG_TPU_WEIGHTS_DIR
# cache -> create_model_on_device(encoder_weights="imagenet") -> one
# frozen-phase train step. Reference dependency: README.md:11 (ImageNet
# encoders are what the two-phase training schedule assumes).
# ---------------------------------------------------------------------------

ALL_ENCODERS = [
    "resnet34",
    "resnet50",
    "resnext50_32x4d",
    "efficientnet-b3",
    "efficientnet-b4",
    "timm-resnest50d",
    "timm-resnest101e",
]


def _tree_compare_loaded(model_enc, source_enc, path=()):
    """Walk the model's encoder params against the converted source tree.
    Returns the list of leaf paths whose shapes differ (expected: exactly
    the 3->1 adapted stem kernel); asserts equality everywhere else."""
    mismatched = []
    for key in source_enc:
        a, b = model_enc[key], source_enc[key]
        if isinstance(b, dict):
            mismatched += _tree_compare_loaded(a, b, path + (key,))
        else:
            a, b = np.asarray(a), np.asarray(b)
            if a.shape != b.shape:
                mismatched.append(path + (key,))
            else:
                assert np.allclose(a, b, atol=1e-6), path + (key,)
    return mismatched


@pytest.mark.slow
@pytest.mark.parametrize("encoder_name", ALL_ENCODERS)
def test_pretrained_pipeline_end_to_end(encoder_name, tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    import sys as _sys

    import jax
    import jax.numpy as jnp
    import optax

    from volume_segmantics_tpu.data.losses import get_loss_fn
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.model.operations.vol_seg_2d_trainer import (
        _freeze_mask,
    )
    from volume_segmantics_tpu.models.registry import _get_encoder
    from volume_segmantics_tpu.parallel.mesh import get_mesh
    from volume_segmantics_tpu.parallel.train import build_dp_train_step

    # 1. A realistically-shaped torch state dict: 3-channel ImageNet stem,
    #    torchvision/timm naming (generated by inverting our converter).
    encoder, _ = _get_encoder(encoder_name, jnp.float32)
    variables = jax.jit(lambda r, d: encoder.init(r, d, train=False))(
        jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    stats = jax.tree_util.tree_map(np.asarray, variables["batch_stats"])
    sd = {}
    if "efficientnet" in encoder_name or "resnest" in encoder_name:
        sd = _timm_sd_from_ours(encoder_name, params, stats)
    else:
        _inverse_resnet_encoder(sd, params, stats)
    torch_sd = {
        k[len("encoder."):]: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in sd.items()
    }
    pth = tmp_path / f"{encoder_name}.pth"
    torch.save(torch_sd, pth)

    # 2. Drive the conversion tool exactly as a user would.
    repo_root = str(Path(__file__).resolve().parent.parent)
    if repo_root not in _sys.path:
        _sys.path.insert(0, repo_root)
    from tools import convert_torch_encoder as tool

    monkeypatch.setattr(
        _sys, "argv",
        ["convert_torch_encoder", encoder_name, str(pth),
         "--out-dir", str(tmp_path)],
    )
    tool.main()
    cache_file = tmp_path / f"{encoder_name}.vstpu"
    assert cache_file.exists()

    # 3. Model factory picks the cache up and adapts the stem to 1 channel.
    monkeypatch.setenv("VOLSEG_TPU_WEIGHTS_DIR", str(tmp_path))
    struc = {
        "type": ModelType.U_NET,
        "encoder_name": encoder_name,
        "encoder_weights": "imagenet",
        "in_channels": 1,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc)
    assert bundle.pretrained_loaded
    model_enc = jax.tree_util.tree_map(np.asarray, bundle.params["encoder"])
    mismatched = _tree_compare_loaded(model_enc, params)
    # Exactly one leaf may differ in shape: the 3->1 adapted first conv.
    assert len(mismatched) == 1, mismatched
    stem_path = mismatched[0]
    node_m, node_s = model_enc, params
    for k in stem_path:
        node_m, node_s = node_m[k], node_s[k]
    assert np.allclose(node_m, node_s.sum(axis=2, keepdims=True), atol=1e-5)

    # 4. One frozen-phase train step from the cache: encoder conv kernels
    #    stay fixed, decoder moves.
    from types import SimpleNamespace

    loss_fn = get_loss_fn(SimpleNamespace(loss_criterion="BCEDiceLoss",
                                          alpha=0.75, beta=0.25))
    from volume_segmantics_tpu.parallel.train import make_base_optimizer
    tx = make_base_optimizer(weight_decay=0.01)
    mask = _freeze_mask(bundle.params, frozen=True)
    step = build_dp_train_step(
        bundle.module, loss_fn, tx, mask, num_labels=2, image_size=64,
        mesh=get_mesh(), compute_dtype=jnp.float32, augment=False,
    )
    opt_state = tx.init(bundle.params)
    rng = np.random.default_rng(0)
    n_dev = jax.device_count()
    images = jnp.asarray(rng.integers(0, 255, (2 * n_dev, 64, 64), np.uint8))
    masks = jnp.asarray(rng.integers(0, 2, (2 * n_dev, 64, 64), np.uint8))
    # The step donates params/opt_state buffers — snapshot comparison leaves
    # as numpy BEFORE stepping.
    dec_before = np.asarray(jax.tree_util.tree_leaves(bundle.params["decoder"])[0])
    new_params, _, _, loss = step(
        bundle.params, bundle.batch_stats, opt_state, images, masks, 1e-3,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))
    stem_before = model_enc[stem_path[0]]
    node = jax.tree_util.tree_map(np.asarray, new_params["encoder"])[stem_path[0]]
    for k in stem_path[1:]:
        stem_before, node = stem_before[k], node[k]
    assert np.array_equal(node, stem_before), "frozen encoder stem moved"
    dec_after = jax.tree_util.tree_leaves(new_params["decoder"])[0]
    assert not np.array_equal(dec_before, np.asarray(dec_after))


@pytest.mark.slow
def test_export_torch_checkpoint_roundtrip(tmp_path):
    """Torch-format checkpoint EXPORT (interop is two-way): a native
    checkpoint exported via models/torch_export.py must (a) torch.load
    cleanly, (b) carry the reference's exact 5-key schema with smp tensor
    names (key-set equality against the synthetic smp U-Net schema incl.
    num_batches_tracked), and (c) re-import through load_torch_checkpoint
    with every weight identical."""
    torch = pytest.importorskip("torch")
    import jax

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.checkpoint import save_checkpoint
    from volume_segmantics_tpu.models.torch_convert import load_torch_checkpoint
    from volume_segmantics_tpu.models.torch_export import export_checkpoint_file

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 4,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(3))
    native = tmp_path / "model.pytorch"
    save_checkpoint(
        native,
        model_state=bundle.variables,
        model_struc_dict=struc,
        optimizer_state={},
        loss_val=0.125,
        label_codes={"0": "bg", "1": "fg"},
    )
    exported = tmp_path / "model_torch.pytorch"
    export_checkpoint_file(native, exported)

    blob = torch.load(exported, map_location="cpu", weights_only=False)
    assert set(blob) == {
        "model_state_dict", "model_struc_dict", "optimizer_state_dict",
        "loss_val", "label_codes",
    }
    assert blob["loss_val"] == 0.125
    assert blob["label_codes"] == {"0": "bg", "1": "fg"}
    assert blob["model_struc_dict"]["type"].name == "U_NET"
    # The pickled enum must resolve under the REFERENCE package's module
    # path so the reference CLI can unpickle it.
    assert type(blob["model_struc_dict"]["type"]).__module__ == (
        "volume_segmantics.utilities.base_data_utils"
    )
    ref_schema = set(make_smp_unet_resnet34_state_dict(classes=4))
    ref_schema |= {
        k.rsplit(".", 1)[0] + ".num_batches_tracked"
        for k in ref_schema if k.endswith(".running_mean")
    }
    assert set(blob["model_state_dict"]) == ref_schema

    # Re-import: every weight must survive the round trip exactly.
    back = load_torch_checkpoint(exported)
    orig_leaves = jax.tree_util.tree_leaves_with_path(
        {"params": bundle.variables["params"],
         "batch_stats": bundle.variables["batch_stats"]}
    )
    from flax import serialization

    restored = serialization.from_state_dict(
        {"params": bundle.variables["params"],
         "batch_stats": bundle.variables["batch_stats"]},
        back["model_state_dict"],
    )
    for (path, a), b in zip(orig_leaves,
                            jax.tree_util.tree_leaves(restored)):
        assert np.array_equal(np.asarray(a), np.asarray(b)), path


@pytest.mark.slow
def test_efficientnet_lukemelas_checkpoint_interop():
    """The reference's "efficientnet-bX" encoders are the lukemelas
    efficientnet_pytorch modules (flat `_blocks.{i}` naming, `_conv_stem`/
    `_bn0` stem, inert `_conv_head`/`_bn1` classification tail). Export
    must emit exactly that naming and import must accept it, round-tripping
    every leaf."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.models.torch_convert import convert_smp_state_dict
    from volume_segmantics_tpu.models.torch_export import (
        smp_state_dict_from_variables,
    )

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "efficientnet-b3",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 3,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(5))
    sd = smp_state_dict_from_variables(bundle.variables, struc)

    # Exported naming is lukemelas style with the classification tail.
    assert "encoder._conv_stem.weight" in sd
    assert "encoder._bn0.weight" in sd
    # b3 stage 1 = ceil(1.4 * 1) = 2 no-expand blocks; stage 2 starts at
    # flat index 2 with the first expanded MBConv.
    assert "encoder._blocks.0._depthwise_conv.weight" in sd
    assert "encoder._blocks.1._expand_conv.weight" not in sd
    assert "encoder._blocks.2._expand_conv.weight" in sd
    # b3: depth multiplier 1.4 -> ceil(1.4 * [1,2,2,3,3,4,1]) = 26 blocks.
    assert "encoder._blocks.25._project_conv.weight" in sd
    assert "encoder._blocks.26._depthwise_conv.weight" not in sd
    assert sd["encoder._conv_head.weight"].shape == (1536, 384, 1, 1)
    assert "encoder._bn1.running_var" in sd
    assert "encoder._bn1.num_batches_tracked" in sd
    assert not any(".conv_pw." in k or ".conv_stem." in k for k in sd)

    # Import accepts the lukemelas naming and round-trips every leaf.
    state = convert_smp_state_dict(sd, struc)
    params = jax.tree_util.tree_map(np.asarray, bundle.variables["params"])
    stats = jax.tree_util.tree_map(
        np.asarray, bundle.variables["batch_stats"]
    )
    merged = serialization.from_state_dict(params, state["params"])
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(merged)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
    assert len(jax.tree_util.tree_leaves(state["params"])) == len(
        jax.tree_util.tree_leaves(params)
    )
    merged_stats = serialization.from_state_dict(stats, state["batch_stats"])
    for a, b in zip(jax.tree_util.tree_leaves(stats),
                    jax.tree_util.tree_leaves(merged_stats)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
