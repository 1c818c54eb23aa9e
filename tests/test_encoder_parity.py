"""Structural parity: encoder parameter counts vs the torch originals.

A wrong block count, width rounding, or missing SE/attention module shifts
the total by far more than the tolerance here, so this pins the
architectures to their torchvision/timm definitions without needing the
torch packages installed.
"""

import jax
import numpy as np
import pytest

# Published torch parameter counts (torchvision/timm, classifier excluded
# is NOT what these are — they are full-backbone counts minus the fc head,
# which smp also drops; our in_channels=1 stem loses (3-1)*k*k*64 weights).
EXPECTED = {
    "resnet34": 21.28e6,
    "resnet50": 23.5e6,
    "resnext50_32x4d": 23.0e6,
    # EfficientNet counts exclude timm's conv_head (stem->1536 1x1) because
    # the smp feature-pyramid contract stops at the last block (384/448 ch);
    # 10.7M/17.5M are the with-head figures minus 0.59M/0.80M.
    "efficientnet-b3": 10.11e6,
    "efficientnet-b4": 16.7e6,
    "timm-resnest50d": 25.4e6,
    "timm-resnest101e": 46.2e6,
}


def _count(tree):
    return sum(np.prod(np.asarray(x).shape) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.slow
@pytest.mark.parametrize("name,expected", sorted(EXPECTED.items()))
def test_encoder_param_counts(name, expected):
    import jax.numpy as jnp

    from volume_segmantics_tpu.models.registry import _get_encoder

    encoder, _ = _get_encoder(name, jnp.float32)
    variables = jax.jit(
        lambda r, d: encoder.init(r, d, train=False)
    )(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1), jnp.float32))
    n = _count(variables["params"])
    # 4% tolerance: covers the 1-channel stem, fc-head differences, and
    # minor bn bookkeeping.
    assert abs(n - expected) / expected < 0.04, (
        f"{name}: {n / 1e6:.2f}M params vs expected ~{expected / 1e6:.1f}M"
    )
