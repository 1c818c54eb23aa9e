"""Model construction + forward tests (reference tests/test_model_2d.py
equivalent; runs on CPU with the JAX backend instead of being gpu-marked)."""

import jax.numpy as jnp
import numpy as np
import pytest

import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.model.model_2d import (
    create_model_from_file,
    create_model_on_device,
)
from volume_segmantics_tpu.models.registry import available_encoders
from volume_segmantics_tpu.utils.base_data_utils import ModelType

ARCHS = [m for m in ModelType]


def _struc(model_type, encoder="resnet34", classes=2):
    return {
        "type": model_type,
        "encoder_name": encoder,
        "encoder_weights": None,
        "in_channels": cfg.MODEL_INPUT_CHANNELS,
        "classes": classes,
    }


@pytest.mark.slow
@pytest.mark.parametrize("model_type", ARCHS)
def test_all_architectures_forward(model_type):
    try:
        bundle = create_model_on_device(0, _struc(model_type))
    except (ImportError, ModuleNotFoundError):
        pytest.skip(f"decoder for {model_type} not implemented yet")
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    y = bundle.apply_nchw(x)
    assert y.shape == (1, 2, 64, 64)


@pytest.mark.slow
@pytest.mark.parametrize("encoder", available_encoders())
def test_all_encoders_unet(encoder):
    bundle = create_model_on_device(0, _struc(ModelType.U_NET, encoder))
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    y = bundle.apply_nchw(x)
    assert y.shape == (1, 2, 64, 64)


def test_model_from_file(model_path):
    bundle, classes, label_codes = create_model_from_file(model_path)
    assert classes == 4
    x = jnp.zeros((1, 1, 64, 64), jnp.float32)
    y = bundle.apply_nchw(x)
    assert y.shape == (1, 4, 64, 64)


def test_checkpoint_round_trip(tmp_path):
    from flax import serialization

    from volume_segmantics_tpu.models.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    struc = _struc(ModelType.U_NET, classes=3)
    bundle = create_model_on_device(0, struc)
    path = tmp_path / "m.vstpu"
    save_checkpoint(
        path,
        model_state=bundle.variables,
        model_struc_dict=struc,
        loss_val=0.5,
        label_codes={"0": "bg"},
    )
    ckpt = load_checkpoint(path)
    assert ckpt["loss_val"] == 0.5
    assert ckpt["label_codes"] == {"0": "bg"}
    assert ckpt["model_struc_dict"]["type"] == ModelType.U_NET
    restored = serialization.from_state_dict(
        bundle.variables, ckpt["model_state_dict"]
    )
    k0 = np.asarray(
        bundle.variables["params"]["encoder"]["stem_conv"]["conv"]["kernel"]
    )
    k1 = np.asarray(restored["params"]["encoder"]["stem_conv"]["conv"]["kernel"])
    assert np.array_equal(k0, k1)


def test_pan_rejects_resnest():
    """Reference README.md:76: ResNeSt encoders incompatible with PAN."""
    with pytest.raises(ValueError, match="not compatible with PAN"):
        create_model_on_device(0, _struc(ModelType.PAN, "timm-resnest50d"))


def test_apply_nchw_train_mode_updates_batch_stats():
    """apply_nchw(train=True) must run training-mode BatchNorm and store
    the mutated running statistics back on the bundle (it previously
    ignored the flag and silently ran eval mode)."""
    import jax
    import numpy as np

    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    struc = {"type": ModelType.U_NET, "encoder_name": "resnet34",
             "encoder_weights": None, "in_channels": 1, "classes": 2}
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(2))
    before = jax.tree_util.tree_map(np.asarray, bundle.batch_stats)
    x = np.random.default_rng(0).normal(size=(2, 1, 64, 64)).astype(np.float32)

    eval_out = bundle.apply_nchw(x)  # default eval: no mutation
    after_eval = jax.tree_util.tree_map(np.asarray, bundle.batch_stats)
    assert all(
        np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before),
                        jax.tree_util.tree_leaves(after_eval))
    )

    train_out = bundle.apply_nchw(x, train=True)
    assert train_out.shape == eval_out.shape == (2, 2, 64, 64)
    after_train = jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(np.asarray, bundle.batch_stats)
    )
    changed = sum(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree_util.tree_leaves(before), after_train)
    )
    assert changed > 0, "train=True did not update batch statistics"
