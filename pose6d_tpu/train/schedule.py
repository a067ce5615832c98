"""Host-side ReduceLROnPlateau state machine.

The reference drives training with torch's ReduceLROnPlateau(mode='max',
factor=0.5, patience=5[, min_lr=1e-7]) stepped on val ADD-0.1d
(scripts/training/train_rgb.py:71,141). Under jit the learning rate is an
injected hyperparameter (optax.inject_hyperparams), so the scheduler lives
on the host across jit boundaries — this reproduces torch's exact semantics
including the relative threshold and cooldown, and serializes its state for
checkpoint/resume (which the reference forgets to do; we fix that).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ReduceLROnPlateau:
    lr: float
    mode: str = "max"
    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    threshold_mode: str = "rel"
    cooldown: int = 0
    min_lr: float = 0.0

    best: float | None = None
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def _is_better(self, a: float, best: float) -> bool:
        # Mirrors torch.optim.lr_scheduler.ReduceLROnPlateau.is_better exactly:
        # rel mode uses best*(1+threshold) for max / best*(1-threshold) for min
        # regardless of sign.
        if self.mode == "max":
            if self.threshold_mode == "rel":
                return a > best * (self.threshold + 1.0)
            return a > best + self.threshold
        else:
            if self.threshold_mode == "rel":
                return a < best * (1.0 - self.threshold)
            return a < best - self.threshold

    def step(self, metric: float) -> float:
        """Update with this epoch's metric; returns the (possibly reduced) lr."""
        if self.best is None or self._is_better(metric, self.best):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {
            "lr": self.lr,
            "best": self.best if self.best is not None else float("-inf"),
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        best = float(d["best"])
        self.best = None if best == float("-inf") else best
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])
