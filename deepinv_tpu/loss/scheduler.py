"""Loss schedulers (reference deepinv/loss/scheduler.py, 208 LoC).

Select which losses are active at each step/epoch. Host-side control flow
(the choice changes the computation graph, so it happens outside jit — the
trainer jits per active-loss-set, cached by XLA).
"""

from __future__ import annotations

import random as _random
from typing import List

from .base import Loss

__all__ = [
    "BaseLossScheduler",
    "RandomLossScheduler",
    "InterleavedLossScheduler",
    "StepLossScheduler",
    "InterleavedEpochLossScheduler",
]


class BaseLossScheduler(Loss):
    """Base: wraps a list of losses and selects a subset per call."""

    def __init__(self, *losses: Loss, seed: int = 0):
        self.losses = list(losses)
        self.rng = _random.Random(seed)

    def select(self, epoch: int = 0, step: int = 0) -> List[Loss]:
        return self.losses

    def schedule(self, epoch: int = 0) -> List[Loss]:
        """Reference-named alias of :meth:`select` (scheduler.py:22)."""
        return self.select(epoch=epoch)

    def __call__(self, epoch: int = 0, step: int = 0, **kwargs):
        total = 0.0
        for l in self.select(epoch=epoch, step=step):
            total = total + l(**kwargs)
        return total

    def adapt_model(self, model):
        for l in self.losses:
            model = l.adapt_model(model)
        return model


class RandomLossScheduler(BaseLossScheduler):
    """Pick one loss at random each step, optionally weighted — e.g.
    ``weightings=[3, 1]`` picks the first loss 3x as often (reference
    scheduler.py:109-125)."""

    def __init__(self, *losses: Loss, seed: int = 0, weightings=None):
        super().__init__(*losses, seed=seed)
        self.weightings = weightings
        if weightings is not None:
            if len(self.losses) != len(weightings):
                raise ValueError("losses and weightings must be same length")

    def select(self, epoch=0, step=0):
        if self.weightings is None:
            return [self.rng.choice(self.losses)]
        return [self.rng.choices(self.losses, weights=self.weightings, k=1)[0]]


class InterleavedLossScheduler(BaseLossScheduler):
    """Cycle through losses step by step."""

    def select(self, epoch=0, step=0):
        return [self.losses[step % len(self.losses)]]


class InterleavedEpochLossScheduler(BaseLossScheduler):
    """Cycle through losses epoch by epoch."""

    def select(self, epoch=0, step=0):
        return [self.losses[epoch % len(self.losses)]]


class StepLossScheduler(BaseLossScheduler):
    """Activate losses strictly after ``epoch_thresh`` (reference
    scheduler.py:209: ``epoch > epoch_thresh``)."""

    def __init__(self, *losses: Loss, epoch_thresh: int = 0):
        super().__init__(*losses)
        self.epoch_thresh = epoch_thresh

    def select(self, epoch=0, step=0):
        return list(self.losses) if epoch > self.epoch_thresh else []
