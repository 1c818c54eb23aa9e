"""Golden-value regression: a seeded tiny forward pass must keep producing
the recorded logits (tolerance-based; catches silent numeric drift from
model/layer refactors across rounds)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from volume_segmantics_tpu.model.model_2d import create_model_on_device
from volume_segmantics_tpu.utils.base_data_utils import ModelType

GOLDEN = Path(__file__).parent / "golden" / "unet_r34_seed42_logits.npz"


@pytest.mark.slow
def test_seeded_forward_matches_golden():
    blob = np.load(GOLDEN)
    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 3,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(42))
    logits = np.asarray(
        bundle.module.apply(bundle.variables, jnp.asarray(blob["x"]), train=False)
    )
    assert logits.shape == blob["logits"].shape
    assert np.allclose(logits, blob["logits"], atol=1e-4), (
        "Seeded forward drifted from the recorded golden logits — if this "
        "was an intentional architecture change, regenerate "
        "tests/golden/unet_r34_seed42_logits.npz."
    )
