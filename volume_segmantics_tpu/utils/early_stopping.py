"""Early stopping with best-on-validation checkpointing.

Parity with reference volume_segmantics/utilities/early_stopping.py:7-63:
patience counter on validation loss; on improvement, saves a self-describing
checkpoint dict {model_state_dict, model_struc_dict, optimizer_state_dict,
loss_val, label_codes} (written as msgpack instead of torch.save).
"""

import logging

import numpy as np

from volume_segmantics_tpu.models.checkpoint import save_checkpoint


class EarlyStopping:
    """Stops training when validation loss stops improving."""

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
        self.counter = 0
        self.best_score = best_score
        self.val_loss_min = np.inf if best_score is None else best_score * -1
        self.early_stop = False
        self.delta = delta
        self.path = path
        self.model_struc_dict = model_dict or {}

    def __call__(self, val_loss, trainer, optimizer, label_codes):
        """`trainer` exposes `.bundle.variables` and `.opt_state` (the
        functional analogue of the reference's (model, optimizer) pair)."""
        score = -val_loss
        if self.best_score is None:
            self.best_score = score
            self.save_checkpoint(val_loss, trainer, optimizer, label_codes)
        elif score < self.best_score + self.delta:
            self.counter += 1
            logging.info(
                f"EarlyStopping counter: {self.counter} out of {self.patience}"
            )
            if self.counter >= self.patience:
                self.early_stop = True
        else:
            self.best_score = score
            self.save_checkpoint(val_loss, trainer, optimizer, label_codes)
            self.counter = 0

    def save_checkpoint(self, val_loss, trainer, optimizer, label_codes):
        """Saves model when validation loss decreases."""
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
