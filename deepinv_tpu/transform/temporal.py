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
    """Shift along the time axis of (B, C, T, H, W) data (reference
    temporal.py:7): ``padding='reflect'`` (default) mirrors at the clip
    ends, ``'wrap'`` rolls cyclically."""

    def __init__(self, *args, padding: str = "reflect", **kwargs):
        super().__init__(*args, **kwargs)
        if padding not in ("reflect", "wrap"):
            raise ValueError(
                f"padding must be one of ('reflect', 'wrap'), got {padding}"
            )
        self.padding = padding

    @staticmethod
    def roll_reflect_1d(x, by=0, axis: int = 0):
        """Roll with reflect padding (reference temporal.py:29): pad both
        sides with the flipped signal (length T-1 each), roll circularly,
        take the central window. Traced-safe: ``by`` may be a jax scalar."""
        T = x.shape[axis]
        by = jnp.asarray(by)
        by = by % (2 * T - 2)
        by = jnp.where(by > T - 1, by - (2 * T - 2), by)
        x_flip = jnp.flip(x, axis=axis)
        x_pad = jnp.concatenate(
            [
                jax.lax.slice_in_dim(x_flip, 0, T - 1, axis=axis),
                x,
                jax.lax.slice_in_dim(x_flip, 1, T, axis=axis),
            ],
            axis=axis,
        )
        P = 3 * T - 2
        idx = (jnp.arange(T) + (T - 1) - by) % P
        return jnp.take(x_pad, idx, axis=axis)

    def get_params(self, x, key=None):
        key = ensure_key(key, self.seed)
        T = x.shape[2]
        n = self.n_trans * x.shape[0]
        return {"t_shift": jax.random.randint(key, (n,), -T // 2, T // 2 + 1)}

    def transform(self, x, t_shift=None):
        x = self._repeat(x) if x.shape[0] != t_shift.shape[0] else x
        if self.padding == "wrap":
            return jax.vmap(lambda v, s: jnp.roll(v, s, axis=1))(x, t_shift)
        return jax.vmap(
            lambda v, s: self.roll_reflect_1d(v, s, axis=1)
        )(x, t_shift)


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
        # the per-line phase indexes the LAST (readout, W) axis; new axes
        # must be inserted before it so 5D (B, 2, T, H, W) data broadcasts
        # the phase over T and H, not onto them
        while ph.ndim < c.ndim:
            ph = ph[..., None, :]
        c = c * ph
        return jnp.concatenate([jnp.real(c), jnp.imag(c)], axis=1)
