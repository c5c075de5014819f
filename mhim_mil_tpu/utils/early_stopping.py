"""Early stopping on validation loss (reference: utils.py:229-294).

Patience counter with an earliest-stop epoch; serialisable for crash-resume.
"""

from __future__ import annotations

import math


class EarlyStopping:
    def __init__(self, patience: int = 20, stop_epoch: int = 50, save_best_model_stage: float = 0.0):
        self.patience = patience
        self.stop_epoch = stop_epoch
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.val_loss_min = math.inf
        self.save_best_model_stage = save_best_model_stage
        self.improved = False  # True after a call that improved the best score

    def __call__(self, epoch: int, val_loss: float) -> bool:
        score = -val_loss if epoch >= self.save_best_model_stage else 0.0
        self.improved = False
        if self.best_score is None or score > self.best_score:
            self.best_score = score
            self.val_loss_min = min(self.val_loss_min, val_loss)
            self.counter = 0
            self.improved = True
        else:
            self.counter += 1
            if self.counter >= self.patience and epoch > self.stop_epoch:
                self.early_stop = True
        return self.early_stop

    def state_dict(self):
        return {
            "patience": self.patience,
            "stop_epoch": self.stop_epoch,
            "counter": self.counter,
            "best_score": self.best_score,
            "early_stop": self.early_stop,
            "val_loss_min": self.val_loss_min,
        }

    def load_state_dict(self, d):
        for k, v in d.items():
            setattr(self, k, v)
