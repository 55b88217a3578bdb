"""Denoiser / Reconstructor bases (reference deepinv/models/base.py:11,119)
and sigma handling (_handle_sigma, base.py:47)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = ["Denoiser", "Reconstructor", "handle_sigma"]


def handle_sigma(sigma, x):
    """Normalize sigma to a (B, 1, *spatial) noise-level map
    (reference models/base.py:47, drunet.py:212-250)."""
    B = x.shape[0]
    spatial = x.shape[2:]
    s = jnp.asarray(sigma, x.dtype)
    if s.ndim == 0:
        return jnp.full((B, 1) + spatial, s, x.dtype)
    if s.shape == (B,) or s.shape == (B, 1) or s.shape == (B,) + (1,) * len(spatial):
        s = s.reshape((B, 1) + (1,) * len(spatial))
        return jnp.broadcast_to(s, (B, 1) + spatial)
    if s.shape == (B, 1) + spatial:
        return s
    if s.shape == (1,):
        return jnp.full((B, 1) + spatial, s[0], x.dtype)
    raise ValueError(f"cannot broadcast sigma of shape {s.shape} to {x.shape}")


class Denoiser(Module):
    """Base denoiser: ``xhat = denoiser(x, sigma)`` (base.py:11).

    :Examples:

        Every denoiser is a pytree: jit/vmap/grad apply directly.

        >>> import jax
        >>> from deepinv_tpu.models import DnCNN
        >>> den = DnCNN(1, 1, pretrained=None)
        >>> x = jax.random.uniform(jax.random.key(0), (2, 1, 16, 16))
        >>> jax.jit(lambda m, v: m(v, 0.05))(den, x).shape
        (2, 1, 16, 16)
    """

    def __call__(self, x, sigma=None, **kwargs):
        raise NotImplementedError

    def forward(self, x, sigma=None, **kwargs):
        return self(x, sigma=sigma, **kwargs)


class Reconstructor(Module):
    """Base reconstructor: ``xhat = model(y, physics)`` (base.py:119)."""

    def __call__(self, y, physics, **kwargs):
        raise NotImplementedError

    def forward(self, y, physics, **kwargs):
        return self(y, physics, **kwargs)
