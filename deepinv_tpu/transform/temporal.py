"""Temporal and stochastic transforms (reference deepinv/transform/
{temporal.py ShiftTime, augmentation.py RandomNoise/RandomPhaseError}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import Transform

__all__ = ["ShiftTime", "RandomNoise", "RandomPhaseError"]


class ShiftTime(Transform):
    """Cyclic shift along the time axis of (B, C, T, H, W) data."""

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        T = x.shape[2]
        n = self.n_trans * x.shape[0]
        return {"t_shift": jax.random.randint(key, (n,), -T // 2, T // 2 + 1)}

    def transform(self, x, t_shift=None):
        x = self._repeat(x) if x.shape[0] != t_shift.shape[0] else x
        return jax.vmap(lambda v, s: jnp.roll(v, s, axis=1))(x, t_shift)


class RandomNoise(Transform):
    """Additive noise 'transform' for augmentation (reference
    augmentation.py): not a group action; inverse is identity."""

    def __init__(self, sigma: float = 0.1, noise_type: str = "gaussian", **kwargs):
        super().__init__(**kwargs)
        self.sigma = sigma
        self.noise_type = noise_type

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        shape = (self.n_trans * x.shape[0],) + x.shape[1:]
        if self.noise_type == "gaussian":
            eps = jax.random.normal(key, shape) * self.sigma
        else:
            eps = (jax.random.uniform(key, shape) * 2 - 1) * self.sigma
        return {"eps": eps}

    def invert_params(self, params):
        return {"eps": jnp.zeros_like(params["eps"])}

    def transform(self, x, eps=None):
        x = self._repeat(x) if x.shape[0] != eps.shape[0] else x
        return x + eps


class RandomPhaseError(Transform):
    """Random k-space phase error for MRI augmentation (reference
    augmentation.py RandomPhaseError): multiply each k-space line by a
    random unit phase."""

    def __init__(self, scale: float = 0.1, **kwargs):
        super().__init__(**kwargs)
        self.scale = scale

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        n = self.n_trans * x.shape[0]
        W = x.shape[-1]
        phase = jax.random.normal(key, (n, W)) * self.scale * jnp.pi
        return {"phase": phase}

    def invert_params(self, params):
        return {"phase": -params["phase"]}

    def transform(self, x, phase=None):
        x = self._repeat(x) if x.shape[0] != phase.shape[0] else x
        # x: (B, 2, ..., H, W) real/imag channels
        c = x[:, 0:1] + 1j * x[:, 1:2]
        ph = jnp.exp(1j * phase)[:, None, ...]
        while ph.ndim < c.ndim:
            ph = ph[..., None, :] if ph.ndim == c.ndim - 1 else ph[..., None]
        c = c * ph
        return jnp.concatenate([jnp.real(c), jnp.imag(c)], axis=1)
