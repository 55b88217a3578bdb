"""Noise-level generators (reference deepinv/physics/generator/noise.py:115
SigmaGenerator, GainGenerator; DownsamplingGenerator :153)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .base import PhysicsGenerator

__all__ = ["SigmaGenerator", "GainGenerator", "DownsamplingGenerator"]


class SigmaGenerator(PhysicsGenerator):
    """sigma ~ U(sigma_min, sigma_max) per sample."""

    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 0.5, seed: int = 0):
        super().__init__(seed=seed)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def sample(self, batch_size, key, **kwargs):
        s = jax.random.uniform(
            key, (batch_size,), minval=self.sigma_min, maxval=self.sigma_max
        )
        return {"sigma": s}


class GainGenerator(PhysicsGenerator):
    """gain ~ U(gain_min, gain_max) per sample."""

    def __init__(self, gain_min: float = 0.1, gain_max: float = 0.4, seed: int = 0):
        super().__init__(seed=seed)
        self.gain_min = gain_min
        self.gain_max = gain_max

    def sample(self, batch_size, key, **kwargs):
        g = jax.random.uniform(
            key, (batch_size,), minval=self.gain_min, maxval=self.gain_max
        )
        return {"gain": g}


class DownsamplingGenerator(PhysicsGenerator):
    """Random (filter, factor) pairs for Downsampling physics
    (reference DownsamplingGenerator). Factors must share a static shape, so
    one factor is drawn per step (host-side) like the reference's per-batch
    single factor constraint (blur.py check_factor)."""

    def __init__(self, filters=("gaussian", "bilinear", "bicubic"), factors=(2, 4), seed: int = 0):
        super().__init__(seed=seed)
        self.filters = list(filters)
        self.factors = list(factors)

    def sample(self, batch_size, key, **kwargs):
        import numpy as np

        k1, k2 = jax.random.split(key)
        f_idx = int(jax.random.randint(k1, (), 0, len(self.filters)))
        d_idx = int(jax.random.randint(k2, (), 0, len(self.factors)))
        return {"filter": self.filters[f_idx], "factor": self.factors[d_idx]}
