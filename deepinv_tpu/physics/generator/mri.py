"""MRI k-space mask generators (reference deepinv/physics/generator/mri.py,
389 LoC: Gaussian / Random / Equispaced / PolyOrder mask generators).

Cartesian acceleration masks of shape (B, C, H, W) (or (B, C, T, H, W) for
dynamic): full central lines plus randomly selected outer lines along the
phase-encode (W) axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .base import PhysicsGenerator

__all__ = [
    "BaseMaskGenerator",
    "GaussianMaskGenerator",
    "RandomMaskGenerator",
    "EquispacedMaskGenerator",
    "PolyOrderMaskGenerator",
]


class BaseMaskGenerator(PhysicsGenerator):
    """Common acceleration-mask machinery (generator/mri.py base)."""

    def __init__(self, img_size, acceleration: int = 4, center_fraction: float = None, n_channels: int = 2, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size)
        self.acc = acceleration
        self.center_fraction = (
            center_fraction if center_fraction is not None else 0.32 / acceleration
        )
        self.n_channels = n_channels

    @property
    def _hw(self):
        return self.img_size[-2], self.img_size[-1]

    def _n_center(self, W):
        return max(int(round(W * self.center_fraction)), 1)

    def sample_line_mask(self, batch_size, key):
        raise NotImplementedError

    def sample(self, batch_size, key, **kwargs):
        H, W = self._hw
        lines = self.sample_line_mask(batch_size, key)  # (B, W)
        mask = jnp.broadcast_to(lines[:, None, None, :], (batch_size, self.n_channels, H, W))
        if len(self.img_size) == 3:  # (T, H, W): repeat over time
            T = self.img_size[0]
            mask = jnp.broadcast_to(
                lines[:, None, None, None, :], (batch_size, self.n_channels, T, H, W)
            )
        return {"mask": mask.astype(jnp.float32)}


class RandomMaskGenerator(BaseMaskGenerator):
    """Uniform random outer lines (generator/mri.py RandomMaskGenerator)."""

    def sample_line_mask(self, batch_size, key):
        H, W = self._hw
        nc = self._n_center(W)
        p = (W / self.acc - nc) / max(W - nc, 1)
        m = jax.random.bernoulli(key, jnp.clip(p, 0.0, 1.0), (batch_size, W)).astype(jnp.float32)
        c0 = (W - nc) // 2
        m = m.at[:, c0 : c0 + nc].set(1.0)
        return m


class GaussianMaskGenerator(BaseMaskGenerator):
    """Gaussian-density outer lines (more samples near the center)."""

    def sample_line_mask(self, batch_size, key):
        H, W = self._hw
        nc = self._n_center(W)
        x = (jnp.arange(W) - W / 2) / (W / 4)
        density = jnp.exp(-(x**2) / 2)
        density = density / jnp.sum(density)
        target = W / self.acc - nc
        p = jnp.clip(density * target, 0.0, 1.0)
        m = (jax.random.uniform(key, (batch_size, W)) < p[None]).astype(jnp.float32)
        c0 = (W - nc) // 2
        m = m.at[:, c0 : c0 + nc].set(1.0)
        return m


class EquispacedMaskGenerator(BaseMaskGenerator):
    """Equispaced outer lines with random offset (fastMRI convention)."""

    def sample_line_mask(self, batch_size, key):
        H, W = self._hw
        nc = self._n_center(W)
        offsets = jax.random.randint(key, (batch_size,), 0, self.acc)
        idx = jnp.arange(W)

        def one(off):
            m = ((idx - off) % self.acc == 0).astype(jnp.float32)
            return m

        m = jax.vmap(one)(offsets)
        c0 = (W - nc) // 2
        m = m.at[:, c0 : c0 + nc].set(1.0)
        return m


class PolyOrderMaskGenerator(BaseMaskGenerator):
    """Polynomial-order variable density (generator/mri.py PolyOrder)."""

    def __init__(self, img_size, acceleration=4, poly_order: int = 2, **kwargs):
        super().__init__(img_size, acceleration=acceleration, **kwargs)
        self.poly_order = poly_order

    def sample_line_mask(self, batch_size, key):
        H, W = self._hw
        nc = self._n_center(W)
        x = jnp.abs(jnp.arange(W) - W / 2) / (W / 2)
        density = (1 - x) ** self.poly_order
        density = density / jnp.sum(density)
        target = W / self.acc - nc
        p = jnp.clip(density * target, 0.0, 1.0)
        m = (jax.random.uniform(key, (batch_size, W)) < p[None]).astype(jnp.float32)
        c0 = (W - nc) // 2
        m = m.at[:, c0 : c0 + nc].set(1.0)
        return m
