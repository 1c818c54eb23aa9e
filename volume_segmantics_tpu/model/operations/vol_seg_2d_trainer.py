"""2D segmentation trainer: jitted train/eval steps, LR finder, OneCycle
schedule, encoder freezing, early stopping, output figures.

Behavioral parity with reference
volume_segmantics/model/operations/vol_seg_2d_trainer.py:35-535, redesigned
TPU-first:

- ONE jitted train step fuses: uint8->float conversion, the full random
  augmentation stack (ops/augment.py), ImageNet normalisation, one-hot
  target prep, forward, loss, backward, and the AdamW update. The host only
  feeds uint8 numpy batches.
- Learning rate is a scalar *argument* to the step (no recompile when the
  schedule changes between LR-finder and OneCycle phases).
- Encoder-conv freezing (reference :102-116) is a static mask pytree: the
  train step applies `stop_gradient` to masked leaves inside the loss, so
  autodiff never builds the encoder backward chain and XLA dead-code
  eliminates it (measured: gradient-multiply-by-zero masking alone did
  NOT — XLA cannot fold f32 x*0 because of NaN/Inf — and the frozen step
  ran at 1.00x the unfrozen step until the stop_gradient form landed).
- BatchNorm statistics live in `batch_stats` and always update in training
  mode, matching torch's behaviour for requires_grad=False convs.
"""

import csv
import logging
import math
import time
from pathlib import Path
from types import SimpleNamespace
from typing import Optional, Union

import jax
import jax.numpy as jnp
import matplotlib as mpl
import numpy as np
import optax

mpl.use("Agg")
from matplotlib import pyplot as plt
from tqdm import tqdm

import volume_segmantics_tpu.utils.base_data_utils as utils
import volume_segmantics_tpu.utils.config as cfg
from volume_segmantics_tpu.data.dataloaders import (
    PrefetchToDevice,
    get_2d_training_dataloaders,
)
from volume_segmantics_tpu.data.losses import get_loss_fn
from volume_segmantics_tpu.data.metrics import get_eval_metric_fn
from volume_segmantics_tpu.model.model_2d import ModelBundle, create_model_on_device
from volume_segmantics_tpu.utils.early_stopping import EarlyStopping


def _freeze_mask(params, frozen: bool):
    """0/1 mask pytree: 0 for encoder conv kernels when frozen (the
    reference freezes parameters whose names contain both 'encoder' and
    'conv', reference trainer :102-108)."""

    def label(path, leaf):
        names = [getattr(p, "key", str(p)) for p in path]
        is_enc_conv = any("encoder" in n for n in names) and any(
            "conv" in n for n in names
        )
        return 0.0 if (frozen and is_enc_conv) else 1.0

    return jax.tree_util.tree_map_with_path(label, params)


class VolSeg2dTrainer:
    """Trains a 2d model and outputs loss curves and example predictions.

    `image_dir_path`/`label_dir_path` may be PNG slice directories
    (reference workflow) or in-memory slice lists (zero-disk fast path; see
    `from_slicer`).
    """

    @classmethod
    def from_slicer(cls, slicer, labels, settings):
        """Build a trainer directly from a TrainingDataSlicer without the
        PNG disk round-trip (TPU-first fast path)."""
        data_slices, label_slices = slicer.get_slice_arrays()
        return cls(data_slices, label_slices, labels, settings)

    # Keys the training flow reads WITHOUT defaults; checked up front so a
    # hand-built settings object fails with a clear message instead of a
    # deep AttributeError.
    REQUIRED_SETTINGS = (
        "image_size", "training_set_proportion", "loss_criterion",
        "eval_metric", "starting_lr", "end_lr", "lr_find_epochs",
        "lr_reduce_factor", "patience", "model",
    )

    def __init__(
        self,
        image_dir_path: Path,
        label_dir_path: Path,
        labels: Union[int, dict],
        settings: SimpleNamespace,
    ):
        from volume_segmantics_tpu.data.settings_data import require_settings
        from volume_segmantics_tpu.utils.host_memory import (
            tune_malloc_for_large_buffers,
        )

        require_settings(settings, self.REQUIRED_SETTINGS, "training")
        # Slice stacks and epoch shuffles churn large host buffers; keep
        # freed pages in-process (see utils/host_memory.py).
        tune_malloc_for_large_buffers()
        self.training_loader, self.validation_loader = get_2d_training_dataloaders(
            image_dir_path, label_dir_path, settings
        )
        self.label_no = labels if isinstance(labels, int) else len(labels)
        self.codes = labels if isinstance(labels, dict) else {}
        self.settings = settings
        # Params for learning rate finder (reference trainer :62-67)
        self.starting_lr = float(settings.starting_lr)
        self.end_lr = float(settings.end_lr)
        self.log_lr_ratio = self._calculate_log_lr_ratio()
        self.lr_find_epochs = settings.lr_find_epochs
        self.lr_reduce_factor = settings.lr_reduce_factor
        # Params for model training
        self.model_device_num = int(getattr(settings, "cuda_device", 0))
        self.patience = settings.patience
        self.loss_fn = get_loss_fn(settings)
        self.eval_metric_fn = get_eval_metric_fn(settings)
        self.model_struc_dict = self._get_model_struc_dict(settings)
        self.image_size = int(settings.image_size)
        self.compute_dtype = jnp.dtype(
            getattr(settings, "compute_dtype", cfg.COMPUTE_DTYPE)
        )
        self.augment_on_device = bool(getattr(settings, "augment", True))
        seed = int(getattr(settings, "seed", 0))
        self._rng = jax.random.PRNGKey(seed)
        self.avg_train_losses = []
        self.avg_valid_losses = []
        self.avg_eval_scores = []
        self.bundle: Optional[ModelBundle] = None
        self.opt_state = None
        self._train_step = None
        self._eval_step = None
        self._weight_decay = float(getattr(settings, "weight_decay", 0.01))
        from volume_segmantics_tpu.parallel.mesh import get_mesh, space_size

        # `spatial_partitions: N` (optional, default 1) turns the mesh 2-D:
        # batch over `data`, image height over `space` — for image sizes
        # whose activations exceed one chip's HBM (see parallel/train.py).
        self.mesh = get_mesh(
            space=int(getattr(settings, "spatial_partitions", 1) or 1)
        )
        if len(self.mesh.devices.flat) > 1:
            sp = space_size(self.mesh)
            shape = (
                f"{len(self.mesh.devices.flat) // sp} data x {sp} space"
                if sp > 1
                else f"{len(self.mesh.devices.flat)} devices"
            )
            logging.info(f"Data-parallel training over {shape}.")

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------

    def _get_model_struc_dict(self, settings):
        model_struc_dict = dict(settings.model)
        model_struc_dict["type"] = utils.get_model_type(settings)
        model_struc_dict["in_channels"] = cfg.MODEL_INPUT_CHANNELS
        model_struc_dict["classes"] = self.label_no
        return model_struc_dict

    def _calculate_log_lr_ratio(self):
        return math.log(self.end_lr / self.starting_lr)

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _create_model_and_optimiser(self, learning_rate, frozen=False):
        logging.info("Setting up the model on device.")
        self.bundle = create_model_on_device(
            self.model_device_num,
            self.model_struc_dict,
            rng=self._next_rng(),
            dtype=self.compute_dtype,
        )
        n_params = self.bundle.count_parameters()
        n_trainable = self._count_trainable_parameters(frozen)
        logging.info(
            f"Model has {n_trainable} trainable parameters, "
            f"{n_params} total parameters."
        )
        if frozen and not self.bundle.pretrained_loaded:
            logging.warning(
                "Training with a FROZEN encoder that has RANDOM weights: the "
                "frozen phase will learn poorly (especially for DeepLabV3/+ "
                "and PAN). Provide pretrained encoder weights via "
                "VOLSEG_TPU_WEIGHTS_DIR, or set num_cyc_frozen: 0 and train "
                "unfrozen."
            )
        from volume_segmantics_tpu.parallel.train import make_base_optimizer

        self._tx = make_base_optimizer(self._weight_decay)
        self.opt_state = self._tx.init(self.bundle.params)
        self._frozen = frozen
        self._build_steps(frozen)
        logging.info("Trainer created.")

    def _build_steps(self, frozen: bool):
        """Build the fused data-parallel train/eval steps for the current
        freeze configuration (single device: trivial 1-device mesh). Batches
        are sharded along the data axis; params/optimizer replicated."""
        from volume_segmantics_tpu.parallel.mesh import replicate
        from volume_segmantics_tpu.parallel.train import (
            build_dp_eval_step,
            build_dp_train_step,
        )

        mask_tree = _freeze_mask(self.bundle.params, frozen)
        self._train_step = build_dp_train_step(
            self.bundle.module,
            self.loss_fn,
            self._tx,
            mask_tree,
            num_labels=self.label_no,
            image_size=self.image_size,
            mesh=self.mesh,
            compute_dtype=self.compute_dtype,
            augment=self.augment_on_device,
        )
        self._eval_step = build_dp_eval_step(
            self.bundle.module,
            self.loss_fn,
            self.eval_metric_fn,
            num_labels=self.label_no,
            mesh=self.mesh,
            compute_dtype=self.compute_dtype,
        )
        self.bundle.variables = replicate(self.bundle.variables, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)

    # ------------------------------------------------------------------
    # Loss / metric / freezing helpers kept for API parity
    # ------------------------------------------------------------------

    def _count_parameters(self) -> int:
        return self.bundle.count_parameters()

    def _count_trainable_parameters(self, frozen: Optional[bool] = None) -> int:
        """Parameters receiving updates under the current freeze mask
        (reference trainer :118-119)."""
        if frozen is None:
            frozen = getattr(self, "_frozen", False)
        mask = _freeze_mask(self.bundle.params, frozen)
        return int(
            sum(
                float(m) * np.prod(np.asarray(p).shape)
                for m, p in zip(
                    jax.tree_util.tree_leaves(mask),
                    jax.tree_util.tree_leaves(self.bundle.params),
                )
            )
        )

    def _freeze_model(self):
        """Freeze encoder conv kernels (reference trainer :102-108).
        Rebuilds the jitted step with the frozen-update mask."""
        logging.info(
            f"Freezing model with {self._count_trainable_parameters(False)} "
            f"trainable parameters, {self._count_parameters()} total parameters."
        )
        self._frozen = True
        self._build_steps(frozen=True)

    def _unfreeze_model(self):
        """Unfreeze all parameters (reference trainer :110-116)."""
        logging.info(
            f"Unfreezing model with {self._count_trainable_parameters(True)} "
            f"trainable parameters, {self._count_parameters()} total parameters."
        )
        self._frozen = False
        self._build_steps(frozen=False)

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------

    def train_model(
        self,
        output_path: Path,
        num_epochs: int,
        patience: int,
        create: bool = True,
        frozen: bool = False,
    ) -> None:
        """Train for `num_epochs` with an automatically determined learning
        rate (reference trainer :163-274)."""
        train_losses, valid_losses, eval_scores = [], [], []

        # Preemption-tolerant resume (no reference equivalent): when
        # `autosave: True` is set, each epoch writes <output>.autosave with
        # full optimizer/epoch state; an interrupted run restarts from the
        # last completed epoch instead of from scratch.
        autosave = bool(getattr(self.settings, "autosave", False))
        autosave_path = Path(f"{output_path}.autosave")
        resume = self._try_resume(autosave_path, frozen) if autosave else None
        if resume is not None:
            lr_to_use = resume["lr_to_use"]
            start_epoch = resume["epoch"] + 1
            global_step = resume["global_step"]
            early_stopping = self._create_early_stopping(
                output_path, patience, best_score=resume["best_score"]
            )
            early_stopping.counter = resume["es_counter"]
            logging.info(
                f"Resuming training from autosave at epoch {start_epoch}."
            )
        elif create:
            self._create_model_and_optimiser(self.starting_lr, frozen=frozen)
            lr_to_use = self._run_lr_finder()
            self._create_model_and_optimiser(lr_to_use, frozen=frozen)
            early_stopping = self._create_early_stopping(output_path, patience)
        else:
            # Model already partially trained: reduce LR bounds and reload
            self.starting_lr /= self.lr_reduce_factor
            self.end_lr /= self.lr_reduce_factor
            self.log_lr_ratio = self._calculate_log_lr_ratio()
            self._load_in_model_and_optimizer(
                self.starting_lr, output_path, frozen=frozen, optimizer=False
            )
            lr_to_use = self._run_lr_finder()
            min_loss = self._load_in_model_and_optimizer(
                self.starting_lr, output_path, frozen=frozen, optimizer=False
            )
            early_stopping = self._create_early_stopping(
                output_path, patience, best_score=-min_loss
            )

        lr_schedule = self._create_oc_lr_schedule(num_epochs, lr_to_use)
        if resume is None:
            global_step = 0
            start_epoch = 1

        # Optional XLA profiling of the first epoch (reference has only
        # per-epoch wall-clock logging, SURVEY.md §5; the TPU build adds a
        # jax.profiler trace behind a settings flag).
        profile_dir = getattr(self.settings, "profile_dir", None)
        if profile_dir:
            jax.profiler.start_trace(str(profile_dir))

        for epoch in range(start_epoch, num_epochs + 1):
            tic = time.perf_counter()
            logging.info(f"Epoch {epoch} of {num_epochs}")
            for images, masks, _ in tqdm(
                PrefetchToDevice(self.training_loader, self._shard),
                desc="Training batch",
                bar_format=cfg.TQDM_BAR_FORMAT,
            ):
                lr = float(lr_schedule(global_step))
                loss = self._train_one_batch_async(images, masks, lr)
                global_step += 1
                train_losses.append(loss)

            valid_weights = []
            for images, masks, n_valid in tqdm(
                PrefetchToDevice(self.validation_loader, self._shard),
                desc="Validation batch",
                bar_format=cfg.TQDM_BAR_FORMAT,
            ):
                loss, score = self._eval_step(
                    self.bundle.params,
                    self.bundle.batch_stats,
                    self._shard(images),
                    self._shard(masks),
                    n_valid,
                )
                valid_losses.append(loss)
                eval_scores.append(score)
                valid_weights.append(n_valid)

            # Pull all per-step scalars in ONE device round-trip.
            train_losses = list(np.asarray(jnp.stack(train_losses)))
            valid_losses = list(np.asarray(jnp.stack(valid_losses)))
            eval_scores = list(np.asarray(jnp.stack(eval_scores)))

            toc = time.perf_counter()
            self.avg_train_losses.append(float(np.average(train_losses)))
            # Weight per-batch validation stats by their real sample counts
            # so the padded remainder batch does not bias the epoch average.
            self.avg_valid_losses.append(
                float(np.average(valid_losses, weights=valid_weights))
            )
            self.avg_eval_scores.append(
                float(np.average(eval_scores, weights=valid_weights))
            )
            logging.info(
                f"Epoch {epoch}. Training loss: {self.avg_train_losses[-1]}, "
                f"Validation Loss: {self.avg_valid_losses[-1]}. "
                f"{self.settings.eval_metric}: {self.avg_eval_scores[-1]}"
            )
            logging.info(f"Time taken for epoch {epoch}: {toc - tic:0.2f} seconds")
            train_losses, valid_losses, eval_scores = [], [], []

            if profile_dir and epoch == 1:
                jax.profiler.stop_trace()
                profile_dir = None
                logging.info("Saved XLA profile trace for epoch 1.")

            early_stopping(
                self.avg_valid_losses[-1], self, None, self.codes
            )
            if autosave:
                self._write_autosave(
                    autosave_path,
                    epoch=epoch,
                    global_step=global_step,
                    lr_to_use=lr_to_use,
                    early_stopping=early_stopping,
                    frozen=frozen,
                )
            if early_stopping.early_stop:
                logging.info("Early stopping")
                break

        if profile_dir:
            jax.profiler.stop_trace()
        if autosave and autosave_path.exists():
            autosave_path.unlink()
        self._load_in_weights(output_path)

    def _write_autosave(
        self, autosave_path, epoch, global_step, lr_to_use, early_stopping, frozen
    ):
        from volume_segmantics_tpu.models.checkpoint import save_checkpoint

        save_checkpoint(
            autosave_path,
            model_state=self.bundle.variables,
            model_struc_dict=self.model_struc_dict,
            optimizer_state=self.opt_state,
            loss_val=self.avg_valid_losses[-1],
            label_codes=self.codes,
            extra={
                "epoch": int(epoch),
                "global_step": int(global_step),
                "lr_to_use": float(lr_to_use),
                "best_score": float(early_stopping.best_score),
                "es_counter": int(early_stopping.counter),
                "frozen": bool(frozen),
                "avg_train_losses": [float(x) for x in self.avg_train_losses],
                "avg_valid_losses": [float(x) for x in self.avg_valid_losses],
                "avg_eval_scores": [float(x) for x in self.avg_eval_scores],
            },
        )

    def _try_resume(self, autosave_path, frozen):
        """Load an epoch-level autosave if present; returns its `extra`
        dict (with model/optimizer state restored) or None."""
        if not autosave_path.exists():
            return None
        from flax import serialization

        from volume_segmantics_tpu.models.checkpoint import load_checkpoint
        from volume_segmantics_tpu.parallel.mesh import replicate

        ckpt = load_checkpoint(autosave_path)
        extra = ckpt.get("extra")
        if not extra or bool(extra.get("frozen")) != bool(frozen):
            return None
        self._create_model_and_optimiser(extra["lr_to_use"], frozen=frozen)
        self.bundle.variables = replicate(
            serialization.from_state_dict(
                self.bundle.variables, ckpt["model_state_dict"]
            ),
            self.mesh,
        )
        self.opt_state = replicate(
            serialization.from_state_dict(
                self.opt_state, ckpt["optimizer_state_dict"]
            ),
            self.mesh,
        )
        self.avg_train_losses = list(extra.get("avg_train_losses", []))
        self.avg_valid_losses = list(extra.get("avg_valid_losses", []))
        self.avg_eval_scores = list(extra.get("avg_eval_scores", []))
        return extra

    def _shard(self, batch):
        import jax

        if isinstance(batch, jax.Array):  # already placed (prefetcher)
            return batch
        from volume_segmantics_tpu.parallel.mesh import shard_batch

        return shard_batch(np.ascontiguousarray(batch), self.mesh)

    def _train_one_batch_async(self, images, masks, lr):
        """Dispatch one fused train step; returns the loss as a DEVICE
        scalar without blocking, so steps pipeline on-device instead of
        paying a host round-trip per batch (the tunnel RTT dominates
        otherwise)."""
        params, bs, opt_state, loss = self._train_step(
            self.bundle.params,
            self.bundle.batch_stats,
            self.opt_state,
            self._shard(images),
            self._shard(masks),
            lr,
            self._next_rng(),
        )
        self.bundle.variables = {"params": params, "batch_stats": bs}
        self.opt_state = opt_state
        return loss

    def _train_one_batch(self, images, masks, lr) -> float:
        return float(self._train_one_batch_async(images, masks, lr))

    # ------------------------------------------------------------------
    # Checkpoint load
    # ------------------------------------------------------------------

    def _load_in_model_and_optimizer(
        self, learning_rate, output_path, frozen=False, optimizer=False
    ):
        self._create_model_and_optimiser(learning_rate, frozen=frozen)
        logging.info("Loading in weights from saved checkpoint.")
        return self._load_in_weights(output_path, optimizer=optimizer)

    def _load_in_weights(self, output_path, optimizer=False):
        from flax import serialization

        from volume_segmantics_tpu.models.checkpoint import load_checkpoint

        ckpt = load_checkpoint(output_path)
        logging.info("Loading model weights.")
        from volume_segmantics_tpu.parallel.mesh import replicate

        restored = serialization.from_state_dict(
            self.bundle.variables, ckpt["model_state_dict"]
        )
        # Replicate restored host arrays onto the mesh once (avoids silent
        # re-upload of all params on every jitted step).
        self.bundle.variables = replicate(restored, self.mesh)
        if optimizer and ckpt.get("optimizer_state_dict"):
            logging.info("Loading optimizer weights.")
            self.opt_state = replicate(
                serialization.from_state_dict(
                    self.opt_state, ckpt["optimizer_state_dict"]
                ),
                self.mesh,
            )
        return ckpt.get("loss_val", np.inf)

    # ------------------------------------------------------------------
    # LR finder (reference trainer :298-383)
    # ------------------------------------------------------------------

    def _run_lr_finder(self):
        logging.info("Finding learning rate for model.")
        lr_find_loss, lr_find_lr = self._lr_finder()
        lr_to_use = self._find_lr_from_graph(lr_find_loss, lr_find_lr)
        logging.info(f"LR to use {lr_to_use}")
        return lr_to_use

    def _lr_find_epochs_effective(self) -> int:
        """Finder epochs, raised so the exponential sweep covers at least
        cfg.MIN_LR_FIND_STEPS steps. The reference sweeps `lr_find_epochs`
        epochs of a batch-12 loader (~50+ steps for the tutorial volume);
        at `performance_profile: throughput` the same volume is 4-5 batches
        per epoch and a 4-point sweep over [1e-6, 50] made the min-gradient
        heuristic pick a divergent LR (observed: 0.198 -> the frozen phase
        never learned, final Dice 0.0). Parity-batch runs with a normal
        loader length are unaffected."""
        steps_per_epoch = max(len(self.training_loader), 1)
        need = -(-cfg.MIN_LR_FIND_STEPS // steps_per_epoch)  # ceil
        return max(self.lr_find_epochs, need)

    def _lr_exp_stepper(self, step, find_epochs=None):
        """Exponentially increase LR from starting_lr towards end_lr over
        the finder epochs (reference trainer :385-393)."""
        if find_epochs is None:
            find_epochs = self._lr_find_epochs_effective()
        total = find_epochs * max(len(self.training_loader), 1)
        return self.starting_lr * math.exp(step * self.log_lr_ratio / total)

    def _lr_finder(self, smoothing=0.05):
        lr_find_loss = []
        lr_find_lr = []
        iters = 0
        find_epochs = self._lr_find_epochs_effective()
        if find_epochs != self.lr_find_epochs:
            logging.info(
                f"Raising LR-finder epochs {self.lr_find_epochs} -> "
                f"{find_epochs} so the sweep has >= "
                f"{cfg.MIN_LR_FIND_STEPS} steps at this batch size."
            )
        logging.info(
            f"Training for {find_epochs} epochs to create a learning "
            "rate plot."
        )
        stop = False
        for i in range(find_epochs):
            if stop:
                break
            for images, masks, _ in tqdm(
                PrefetchToDevice(self.training_loader, self._shard),
                desc=f"Epoch {i + 1}, batch number",
                bar_format=cfg.TQDM_BAR_FORMAT,
            ):
                lr_step = self._lr_exp_stepper(iters)
                loss = self._train_one_batch(images, masks, lr_step)
                lr_find_lr.append(lr_step)
                if iters == 0:
                    lr_find_loss.append(loss)
                else:
                    loss = smoothing * loss + (1 - smoothing) * lr_find_loss[-1]
                    lr_find_loss.append(loss)
                # Reference early-stop (:337-340): abort once the loss
                # exceeds 1 past ~75% of the sweep. The threshold scales
                # with the TOTAL sweep (identical to the reference for
                # find_epochs == 1): at one throughput-profile epoch of 4
                # batches the per-epoch form stopped after 4 steps —
                # DiceLoss STARTS above 1 — and the 4-point sweep made the
                # LR pick catastrophic (Dice 0.0, measured).
                total_steps = find_epochs * max(len(self.training_loader), 1)
                if loss > 1 and iters > total_steps // 1.333:
                    stop = True
                    break
                iters += 1
        if getattr(self.settings, "plot_lr_graph", False):
            try:
                import termplotlib as tpl

                fig = tpl.figure()
                fig.plot(
                    np.log10(lr_find_lr),
                    lr_find_loss,
                    width=50,
                    height=30,
                    xlabel="Log10 Learning Rate",
                )
                fig.show()
            except ImportError:
                logging.info("termplotlib not available; skipping LR plot.")
        return lr_find_loss, lr_find_lr

    @staticmethod
    def _find_lr_from_graph(lr_find_loss, lr_find_lr) -> float:
        """LR at the steepest loss descent / LR_DIVISOR, with a default
        fallback (reference trainer :347-383)."""
        default_min_lr = cfg.DEFAULT_MIN_LR
        losses = np.array([float(x) for x in lr_find_loss])
        try:
            gradients = np.gradient(losses)
            min_gradient = gradients.min()
            if min_gradient < 0:
                min_loss_grad_idx = gradients.argmin()
            else:
                logging.info(
                    f"Minimum gradient: {min_gradient} was positive, "
                    "returning default value instead."
                )
                return default_min_lr
        except Exception as e:
            logging.info(f"Failed to compute gradients, returning default value. {e}")
            return default_min_lr
        min_lr = lr_find_lr[min_loss_grad_idx]
        return min_lr / cfg.LR_DIVISOR

    # ------------------------------------------------------------------
    # Schedules / early stopping
    # ------------------------------------------------------------------

    def _create_oc_lr_schedule(self, num_epochs, lr_to_use):
        """OneCycle (cosine) schedule with torch OneCycleLR defaults
        (div_factor=25, final_div_factor=1e4), reference trainer :401-408.
        Hand-rolled host function: robust for tiny step counts where
        optax.cosine_onecycle_schedule divides by a zero interval."""
        total_steps = max(num_epochs * max(len(self.training_loader), 1), 1)
        pct_start = float(self.settings.pct_lr_inc)
        initial_lr = lr_to_use / 25.0
        min_lr = initial_lr / 1e4
        warm_steps = pct_start * total_steps

        def schedule(step):
            if step < warm_steps:
                frac = step / max(warm_steps, 1.0)
                return initial_lr + (lr_to_use - initial_lr) * (
                    1 - math.cos(math.pi * frac)
                ) / 2.0
            frac = (step - warm_steps) / max(total_steps - warm_steps, 1.0)
            frac = min(frac, 1.0)
            return min_lr + (lr_to_use - min_lr) * (1 + math.cos(math.pi * frac)) / 2.0

        return schedule

    def _create_early_stopping(self, output_path, patience, best_score=None):
        return EarlyStopping(
            patience=patience,
            verbose=True,
            path=output_path,
            model_dict=self.model_struc_dict,
            best_score=best_score,
        )

    # ------------------------------------------------------------------
    # Output figures (reference trainer :434-535)
    # ------------------------------------------------------------------

    def output_loss_fig(self, model_out_path: Path) -> None:
        """Save training/validation loss curves (with the best-epoch marker)
        and a per-epoch CSV of losses + eval scores."""
        out_dir = model_out_path.parent
        stem = model_out_path.stem
        epochs = np.arange(1, len(self.avg_train_losses) + 1)

        fig, ax = plt.subplots(figsize=(10, 8))
        ax.plot(epochs, self.avg_train_losses, label="Training Loss")
        ax.plot(epochs, self.avg_valid_losses, label="Validation Loss")
        best_epoch = int(np.argmin(self.avg_valid_losses)) + 1
        ax.axvline(best_epoch, linestyle="--", color="r",
                   label="Early Stopping Checkpoint")
        ax.set_xlabel("epochs")
        ax.set_ylabel("loss")
        ax.set_xlim(0, len(epochs) + 1)
        ax.grid(True)
        ax.legend()
        fig.tight_layout()
        fig_path = out_dir / f"{stem}_loss_plot.png"
        logging.info(f"Saving figure of training/validation losses to {fig_path}")
        fig.savefig(fig_path, bbox_inches="tight")
        plt.close(fig)

        # CSV column names are a de-facto contract with downstream tooling.
        # Epoch numbers are 0-based like the reference's
        # (trainer :472 `range(len(self.avg_train_losses))`), even though
        # the loss plot labels epochs 1-based — parity over polish.
        csv_path = out_dir / f"{stem}_train_stats.csv"
        with open(csv_path, "w", newline="") as f:
            writer = csv.writer(f)
            writer.writerow(("Epoch", "Train Loss", "Valid Loss", "Eval Score"))
            writer.writerows(
                zip(range(len(epochs)), self.avg_train_losses,
                    self.avg_valid_losses, self.avg_eval_scores)
            )

    def output_prediction_figure(self, model_path: Path) -> None:
        """Save a data / ground-truth / prediction montage over up to 4
        validation samples."""
        images, masks, _ = next(iter(self.validation_loader))
        x = (images.astype(np.float32) / 255.0 - cfg.IMAGENET_MEAN) / cfg.IMAGENET_STD
        logits = self.bundle.module.apply(
            self.bundle.variables,
            jnp.asarray(x)[..., None].astype(self.compute_dtype),
            train=False,
        )
        predictions = np.asarray(jnp.argmax(logits, axis=-1))

        n_rows = min(images.shape[0], 4)
        fig, axes = plt.subplots(n_rows, 3, figsize=(12, 16), squeeze=False)
        for row in range(n_rows):
            panels = (images[row], masks[row], predictions[row])
            for ax, panel in zip(axes[row], panels):
                ax.imshow(panel, cmap="gray")
        for ax, title in zip(axes[0], ("Data", "Ground Truth", "Prediction")):
            ax.set_title(title)
        fig.suptitle(f"Predictions for {model_path.name}", fontsize=16)
        fig_path = model_path.parent / f"{model_path.stem}_prediction_image.png"
        logging.info(f"Saving example image predictions to {fig_path}")
        fig.savefig(fig_path, dpi=300)
        plt.close(fig)
