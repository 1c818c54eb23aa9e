"""Capture a jax.profiler trace of the fused/noaug train step and print the
top self-time HLO ops (via tools/xplane_ops.py's raw protobuf parser — the
tensorboard_plugin_profile converters fail to import in this image).
Complements tools/profile_train.py's stage wall-clocks with an op-level
view of where the model-only milliseconds go.

Usage: python tools/trace_ops.py [batch] [--aug] [arch] [encoder]
"""

import glob
import sys
import tempfile
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from volume_segmantics_tpu.model.model_2d import create_model_on_device
from volume_segmantics_tpu.data.losses import get_loss_fn
from volume_segmantics_tpu.parallel.mesh import get_mesh
from volume_segmantics_tpu.parallel.train import (
    build_dp_train_step,
    make_base_optimizer,
)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    augment = "--aug" in sys.argv
    batch = int(args[0]) if args else 128
    arch = args[1] if len(args) > 1 else "U_Net"
    encoder = args[2] if len(args) > 2 else "resnet34"
    size, num_labels = 256, 2

    bundle = create_model_on_device(
        0,
        {
            "type": arch,
            "encoder_name": encoder,
            "encoder_weights": None,
            "in_channels": 1,
            "classes": num_labels,
        },
        dtype=jnp.bfloat16,
    )
    loss_fn = get_loss_fn(
        SimpleNamespace(loss_criterion="BCEDiceLoss", alpha=0.75, beta=0.25)
    )
    mesh = get_mesh()
    tx = make_base_optimizer(weight_decay=0.01)
    mask_tree = jax.tree_util.tree_map(lambda _: 1.0, bundle.params)
    opt_state = tx.init(bundle.params)
    step = build_dp_train_step(
        bundle.module, loss_fn, tx, mask_tree, num_labels=num_labels,
        image_size=size, mesh=mesh, compute_dtype=jnp.bfloat16,
        augment=augment,
    )

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, size, size), dtype=np.uint8))
    msks = jnp.asarray(rng.integers(0, num_labels, (batch, size, size), dtype=np.uint8))
    key = jax.random.PRNGKey(1)
    state = [bundle.params, bundle.batch_stats, opt_state]

    def one():
        state[0], state[1], state[2], loss = step(
            state[0], state[1], state[2], imgs, msks, 1e-3, key
        )
        return loss

    for _ in range(3):
        out = one()
    jax.block_until_ready(out)

    logdir = tempfile.mkdtemp(prefix="trace_ops_")
    with jax.profiler.trace(logdir):
        for _ in range(10):
            out = one()
        jax.block_until_ready(out)

    xplane = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    if not xplane:
        print("no xplane captured under", logdir)
        return
    import subprocess

    print(xplane[0])
    subprocess.run(
        [sys.executable, str(Path(__file__).parent / "xplane_ops.py"),
         xplane[0], "10", "40"],
        check=False,
    )


if __name__ == "__main__":
    main()
