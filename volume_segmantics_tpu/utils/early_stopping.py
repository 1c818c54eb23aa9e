"""Early stopping on validation loss, with best-model checkpointing.

Semantics match reference volume_segmantics/utilities/early_stopping.py:7-63
(patience counter on validation loss; checkpoint snapshot on improvement;
resumable ``best_score`` for two-phase training), but the implementation is
structured around an explicit improvement predicate and delegates all
serialisation to models/checkpoint.py (msgpack, torch-exportable).
"""

import logging

import numpy as np

from volume_segmantics_tpu.models.checkpoint import save_checkpoint


class EarlyStopping:
    """Tracks validation loss across epochs; snapshots the best model and
    flags ``early_stop`` after ``patience`` epochs without improvement."""

    def __init__(
        self,
        patience=7,
        verbose=False,
        delta=0,
        path="checkpoint.pytorch",
        model_dict=None,
        best_score=None,
    ):
        self.patience = patience
        self.verbose = verbose
        self.delta = delta
        self.path = path
        self.model_struc_dict = model_dict or {}
        self.counter = 0
        self.early_stop = False
        # Scores are negated losses; `best_score` may be seeded from a prior
        # phase's checkpoint so phase-2 patience resumes against it.
        self.best_score = best_score
        self.val_loss_min = np.inf if best_score is None else -best_score

    def _improved(self, score) -> bool:
        """An epoch improves when its score reaches best + delta (ties at
        delta=0 count as improvement, matching the reference's strict-`<`
        stagnation test)."""
        return self.best_score is None or score >= self.best_score + self.delta

    def __call__(self, val_loss, trainer, optimizer, label_codes):
        """`trainer` exposes `.bundle.variables` and `.opt_state` (the
        functional analogue of the reference's (model, optimizer) pair)."""
        score = -val_loss
        if not self._improved(score):
            self.counter += 1
            logging.info(
                f"EarlyStopping counter: {self.counter} out of {self.patience}"
            )
            if self.counter >= self.patience:
                self.early_stop = True  # sticky once raised
            return
        self.counter = 0
        self.best_score = score
        self.save_checkpoint(val_loss, trainer, optimizer, label_codes)

    def save_checkpoint(self, val_loss, trainer, optimizer, label_codes):
        """Snapshot the current model as the new best."""
        if self.verbose:
            logging.info(
                f"Validation loss decreased ({self.val_loss_min:.6f} --> "
                f"{val_loss:.6f}).  Saving model ..."
            )
        save_checkpoint(
            self.path,
            model_state=trainer.bundle.variables,
            model_struc_dict=self.model_struc_dict,
            optimizer_state=trainer.opt_state,
            loss_val=val_loss,
            label_codes=label_codes,
        )
        self.val_loss_min = val_loss
