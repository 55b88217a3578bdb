"""Sampling utilities (reference deepinv/sampling/utils.py:6 Welford,
sde_solver.py:15 SDEOutput)."""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Welford", "SDEOutput", "projbox"]


class Welford:
    """Online mean/variance accumulator (reference sampling/utils.py:6).

    Functional usage inside scans is built into BaseSampling; this class
    covers the reference's imperative API.
    """

    def __init__(self, x0):
        self.k = 1
        self.M = x0
        self.S = jnp.zeros_like(x0)

    def update(self, x):
        self.k += 1
        delta = x - self.M
        self.M = self.M + delta / self.k
        self.S = self.S + delta * (x - self.M)
        return self

    def mean(self):
        return self.M

    def var(self):
        return self.S / max(self.k - 1, 1)


class SDEOutput(dict):
    """Output container for SDE solvers (reference sde_solver.py:15)."""

    def __init__(self, sample, trajectory=None, nfe: int = 0):
        super().__init__(sample=sample, trajectory=trajectory, nfe=nfe)
        self.sample = sample
        self.trajectory = trajectory
        self.nfe = nfe


def projbox(x, lo, hi):
    return jnp.clip(x, lo, hi)
