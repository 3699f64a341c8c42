"""Optimiser + LR scheduling parity with the reference experiments:
Adam (``gnn_experiment.py:74``) and torch-semantics ReduceLROnPlateau stepped
once per epoch on the mean epoch loss (``trainer.py:82-83``).

The LR lives in ``opt_state.hyperparams['learning_rate']`` via
``optax.inject_hyperparams`` so the host-side scheduler can rewrite it
between epochs without re-jitting the train step.
"""

from __future__ import annotations

import dataclasses

import optax


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """Adam with torch-default betas/eps, injectable learning rate."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8
    )


@dataclasses.dataclass
class PlateauScheduler:
    """Exact ``torch.optim.lr_scheduler.ReduceLROnPlateau`` (mode='min',
    threshold_mode='rel') semantics. The GNN experiment uses factor=0.25,
    patience=5 (gnn_experiment.py:75); the ContConv experiment keeps torch
    defaults factor=0.1, patience=10 (contconv_experiment.py:79)."""

    lr: float
    factor: float = 0.1
    patience: int = 10
    threshold: float = 1e-4
    min_lr: float = 0.0
    cooldown: int = 0

    best: float = float("inf")
    num_bad_epochs: int = 0
    cooldown_counter: int = 0

    def step(self, metric: float) -> float:
        """Update with this epoch's metric; returns the (possibly reduced)
        lr. Mirrors torch's order exactly: best/num_bad update, then cooldown
        decrement (which zeroes num_bad), then the patience check."""
        if metric < self.best * (1.0 - self.threshold):
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
            "best": self.best,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
        }

    def load_state_dict(self, d: dict) -> None:
        self.lr = float(d["lr"])
        self.best = float(d["best"])
        self.num_bad_epochs = int(d["num_bad_epochs"])
        self.cooldown_counter = int(d["cooldown_counter"])
