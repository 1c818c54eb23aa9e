"""Break down the fused train step's wall-clock on the live chip.

Times, at a given batch size (bf16 model + compute dtype, matching bench.py's
train metric): (a) the full fused step (augment + fwd + bwd + AdamW), (b) the
same step with augment=False, (c) the augmentation program alone, and (d) each
augmentation stage in isolation (geometric coordinate fields, the MXU warp
kernel, CLAHE, pointwise intensity). The (a)-(b) gap is the serial
augmentation tax the TPU's single compute stream pays per step; (b) bounds
the model-only MFU.

Usage: python tools/profile_train.py [batch] [arch] [encoder]
"""

import sys
import time
from types import SimpleNamespace
from pathlib import Path

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
from volume_segmantics_tpu.ops import augment as aug
from volume_segmantics_tpu.ops.clahe import clahe
from volume_segmantics_tpu.ops.warp import warp_batch_u8_mxu, warp_pair_u8


def _time(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _record(results, batch, name, fn, *args, **kw):
    """Measure and print IMMEDIATELY (flushed): over the tunneled backend a
    cold compile can cost minutes per stage, and a deadline/timeout must not
    discard the stages already measured (observed: a 590 s timeout ate a
    whole profiling run whose first stages had long finished)."""
    t0 = time.perf_counter()
    v = _time(fn, *args, **kw)
    results[name] = v
    print(
        f"  {name:14s} {v * 1e3:8.2f} ms  ({batch / v:8.1f} slices/s)"
        f"   [stage took {time.perf_counter() - t0:.0f}s incl compile]",
        flush=True,
    )
    return v


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    arch = sys.argv[2] if len(sys.argv) > 2 else "U_Net"
    encoder = sys.argv[3] if len(sys.argv) > 3 else "resnet34"
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
    module, params, batch_stats = bundle.module, bundle.params, bundle.batch_stats
    loss_fn = get_loss_fn(
        SimpleNamespace(loss_criterion="BCEDiceLoss", alpha=0.75, beta=0.25)
    )
    mesh = get_mesh()
    tx = make_base_optimizer(weight_decay=0.01)
    mask_tree = jax.tree_util.tree_map(lambda _: 1.0, params)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 256, (batch, size, size), dtype=np.uint8))
    msks = jnp.asarray(rng.integers(0, num_labels, (batch, size, size), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    print(f"\narch={arch} encoder={encoder} batch={batch} size={size} (bf16)",
          flush=True)
    results = {}
    for name, augment in (("full_step", True), ("noaug_step", False)):
        step = build_dp_train_step(
            module, loss_fn, tx, mask_tree, num_labels=num_labels,
            image_size=size, mesh=mesh, compute_dtype=jnp.bfloat16,
            augment=augment,
        )
        state = list(
            jax.tree_util.tree_map(jnp.copy, (params, batch_stats, opt_state))
        )

        def looped(_=None):
            state[0], state[1], state[2], loss = step(
                state[0], state[1], state[2], imgs, msks, 1e-3, key
            )
            return loss

        _record(results, batch, name, looped)

    # --- augmentation program + its stages in isolation -------------------
    _record(
        results, batch, "augment_only",
        jax.jit(lambda k, i, m: aug.augment_batch_u8(k, i, m, size)),
        key, imgs, msks,
    )

    def coords_only(k, n):
        keys = jax.random.split(k, n)
        k_geo, _ = jax.vmap(jax.random.split, out_axes=1)(keys)
        return jax.vmap(lambda kk: aug._geometric_coords(kk, size))(k_geo)

    coords = jax.jit(coords_only, static_argnums=1)(key, batch)
    jax.block_until_ready(coords)
    _record(results, batch, "coords_only",
            jax.jit(coords_only, static_argnums=1), key, batch)
    if jax.default_backend() == "tpu":
        _record(results, batch, "warp_mxu",
                jax.jit(warp_batch_u8_mxu), imgs, msks, coords)
        _record(results, batch, "warp_gather",
                jax.jit(jax.vmap(warp_pair_u8)), imgs, msks, coords)
    imgs_f = imgs.astype(jnp.float32) / 255.0
    _record(results, batch, "clahe_only",
            jax.jit(jax.vmap(lambda im: clahe(im, 2.0))), imgs_f)
    keys_b = jax.random.split(key, batch)
    _record(results, batch, "intensity",
            jax.jit(jax.vmap(aug._intensity)), keys_b, imgs_f)

    flops_fwd = None
    try:
        x = jnp.zeros((batch, size, size, 1), jnp.bfloat16)
        lowered = jax.jit(
            lambda v: module.apply(v, x, train=False)
        ).lower(bundle.variables)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_fwd = float(cost.get("flops", 0.0))
    except Exception as e:
        print("cost analysis failed:", e)

    tax = results["full_step"] - results["noaug_step"]
    print(f"  aug tax        {tax*1e3:8.2f} ms ({100*tax/results['full_step']:.1f}% of full step)")
    if flops_fwd:
        model_flops = 3.0 * flops_fwd  # fwd + bwd ~ 3x fwd
        peak = 197e12  # v5e bf16
        for k in ("full_step", "noaug_step"):
            mfu = model_flops / results[k] / peak * 100
            print(f"  MFU[{k:10s}] {mfu:5.2f}%")


if __name__ == "__main__":
    main()
