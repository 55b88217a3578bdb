"""Loss base class (reference deepinv/loss/loss.py:15).

Signature: ``loss(x_net=..., x=..., y=..., physics=..., model=..., key=...)``
returning per-sample values of shape (B,) (reduce in the trainer). Stochastic
losses (SURE, splitting, EI) take an explicit ``key``.

``adapt_model`` (loss.py:60) lets a loss wrap the model (e.g. splitting
losses multiply inputs by a mask) — returns a new model, functionally.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import Module

__all__ = ["Loss", "StackedPhysicsLoss"]


class Loss(Module):
    def __init__(self):
        pass

    def __call__(self, x_net=None, x=None, y=None, physics=None, model=None, key=None, **kwargs):
        raise NotImplementedError

    forward = __call__

    @property
    def name(self) -> str:
        """Deprecated loss name (reference loss.py:26 — deprecated in favor
        of the class name)."""
        import warnings

        warnings.warn(
            "The attribute 'name' is deprecated in favor of the class name.",
            DeprecationWarning, stacklevel=2,
        )
        return getattr(self, "_name", type(self).__name__)

    def adapt_model(self, model):
        """Optionally wrap the model (reference loss.py:60). Default: no-op."""
        return model


class StackedPhysicsLoss(Loss):
    """Apply per-operator losses to stacked measurements (loss.py:69)."""

    def __init__(self, losses):
        self.losses = list(losses)

    def __call__(self, x_net=None, x=None, y=None, physics=None, model=None, key=None, **kwargs):
        total = 0.0
        for loss, yi, p in zip(self.losses, y, physics.physics_list):
            total = total + loss(
                x_net=x_net, x=x, y=yi, physics=p, model=model, key=key, **kwargs
            )
        return total
