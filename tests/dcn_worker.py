"""Worker for the multi-host (DCN) simulation test: one JAX process in a
2-process CPU cluster. Runs the data-parallel train step over the GLOBAL
mesh with process-local batch feeding and prints the final loss.

Launched by tests/test_parallel.py::test_two_process_dcn_training with
JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID set and 2
virtual CPU devices per process (4 global).
"""

import sys

import numpy as np


def main():
    # Apply VOLSEG_TPU_PLATFORM before any backend initialisation (this
    # image's TPU plugin ignores the JAX_PLATFORMS env var).
    from volume_segmantics_tpu.utils.device import configure_platform

    configure_platform()

    import jax
    import jax.numpy as jnp
    from types import SimpleNamespace

    from volume_segmantics_tpu.data.losses import get_loss_fn
    from volume_segmantics_tpu.model.model_2d import create_model_on_device
    from volume_segmantics_tpu.parallel.mesh import (
        get_mesh,
        maybe_initialize_distributed,
        replicate,
        shard_batch,
    )
    from volume_segmantics_tpu.parallel.train import build_dp_train_step
    from volume_segmantics_tpu.utils.base_data_utils import ModelType

    assert maybe_initialize_distributed(), "distributed runtime did not start"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    mesh = get_mesh()

    struc = {
        "type": ModelType.U_NET,
        "encoder_name": "resnet34",
        "encoder_weights": None,
        "in_channels": 1,
        "classes": 2,
    }
    bundle = create_model_on_device(0, struc, rng=jax.random.PRNGKey(0))
    loss_fn = get_loss_fn(SimpleNamespace(loss_criterion="BCEDiceLoss",
                                          alpha=0.75, beta=0.25))
    from volume_segmantics_tpu.parallel.train import make_base_optimizer
    tx = make_base_optimizer(weight_decay=0.01)
    mask = jax.tree_util.tree_map(lambda _: 1.0, bundle.params)
    step = build_dp_train_step(
        bundle.module, loss_fn, tx, mask, num_labels=2, image_size=32,
        mesh=mesh, compute_dtype=jnp.float32, augment=False,
    )
    params = replicate(bundle.params, mesh)
    batch_stats = replicate(bundle.batch_stats, mesh)
    opt_state = replicate(tx.init(bundle.params), mesh)

    rng = np.random.default_rng(0)
    global_images = rng.integers(0, 255, (8, 32, 32), dtype=np.uint8)
    global_masks = rng.integers(0, 2, (8, 32, 32), dtype=np.uint8)
    pid = jax.process_index()
    local_sl = slice(pid * 4, (pid + 1) * 4)

    loss = None
    for i in range(3):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state,
            shard_batch(global_images[local_sl], mesh),
            shard_batch(global_masks[local_sl], mesh),
            1e-3,
            jax.random.PRNGKey(i),
        )
    print(f"FINAL_LOSS={float(loss):.8f}")

    # ---- Multi-host prediction phase (SURVEY §7 stage 9) ----
    # Each process feeds its local slice block; per-host partial HDF5
    # writes must stitch to the single-process sweep result.
    if len(sys.argv) > 1:
        import tempfile
        from pathlib import Path
        from types import SimpleNamespace as NS

        from volume_segmantics_tpu.model.operations.vol_seg_2d_predictor import (
            VolSeg2dPredictor,
        )
        from volume_segmantics_tpu.models.checkpoint import save_checkpoint
        from volume_segmantics_tpu.parallel.multihost_predict import (
            local_slice_range,
            predict_local_block_to_hdf5,
        )

        out_dir = Path(sys.argv[1])
        # Fresh SEEDED model (identical on every process and in the
        # single-process ground-truth run).
        pred_bundle = create_model_on_device(
            0, struc, rng=jax.random.PRNGKey(42)
        )
        with tempfile.TemporaryDirectory() as td:
            ckpt = Path(td) / f"m{jax.process_index()}.pytorch"
            save_checkpoint(ckpt, pred_bundle.variables, struc, label_codes={})
            pset = NS(
                clip_data=False, st_dev_factor=2.575, downsample=False,
                data_hdf5_path="/data", cuda_device=0, one_hot=False,
                output_probs=False, prediction_batch_size=4,
                compute_dtype="float32",
            )
            predictor = VolSeg2dPredictor(ckpt, pset)
            vol = np.random.default_rng(7).integers(
                0, 255, (8, 32, 32)).astype(np.uint8)
            start, stop = local_slice_range(vol.shape[0])
            part = predict_local_block_to_hdf5(
                predictor, vol[start:stop], out_dir / "mh_pred"
            )
            print(f"PRED_PART={part}")


if __name__ == "__main__":
    main()
