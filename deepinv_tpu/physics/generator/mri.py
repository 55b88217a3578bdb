"""MRI k-space mask generators (reference deepinv/physics/generator/mri.py,
389 LoC: Base / Random / Gaussian / Equispaced / PolyOrder mask generators).

Cartesian acceleration masks: full central phase-encode lines plus
undersampled outer lines along the W axis, repeated across channels, varying
across batch (and, for the k-t generators, across time).  The sampling
algorithms follow the reference exactly:

- ``RandomMaskGenerator``: exactly ``n_lines`` outer columns drawn without
  replacement from a uniform pdf (reference mri.py:170-196).
- ``GaussianMaskGenerator``: same, with the tail-adjusted Gaussian pdf
  ``exp(-(x-W/2)^2 / (2 (W/10)^2)) + 1/(2 acc)`` (mri.py:314-324).
- ``EquispacedMaskGenerator``: fastMRI equispaced columns at the
  low-frequency-adjusted acceleration with a random per-batch offset,
  sheared across time (mri.py:358-389).
- ``PolyOrderMaskGenerator``: Bernoulli column sampling from the
  binary-search-scaled polynomial pdf ``clamp((1-r)^p + c, 0, 1)``
  (mri.py:234-281).

Without-replacement weighted draws use the Gumbel-top-k trick, which is
distributionally equivalent to sequential multinomial sampling without
replacement (Plackett-Luce), i.e. to the reference's ``random_choice``.
"""

from __future__ import annotations

import math
import warnings

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


def _ceildiv(a, b):
    return -(a // -b)


class BaseMaskGenerator(PhysicsGenerator):
    """Common acceleration-mask machinery (reference generator/mri.py:15-133).

    :param img_size: ``(H, W)``, ``(C, H, W)`` or ``(C, T, H, W)``.
    :param acceleration: acceleration factor (default 4).
    :param center_fraction: fraction of fully-sampled central columns;
        defaults to 0.08 for ``acceleration < 8`` and 0.04 otherwise.
    """

    def __init__(self, img_size, acceleration: int = 4,
                 center_fraction: float | None = None, seed: int = 0):
        super().__init__(seed=seed)
        self.img_size = tuple(img_size)
        self.acc = acceleration
        if center_fraction is not None:
            self.center_fraction = center_fraction
        elif acceleration < 8:
            self.center_fraction = 0.08
        else:
            self.center_fraction = 0.04

        if len(self.img_size) == 2:
            self.H, self.W = self.img_size
            self.C, self.T = 1, 0
        elif len(self.img_size) == 3:
            self.C, self.H, self.W = self.img_size
            self.T = 0
        elif len(self.img_size) == 4:
            self.C, self.T, self.H, self.W = self.img_size
        else:
            raise ValueError(
                "img_size must be (H, W) or (C, H, W) or (C, T, H, W)"
            )

        self.calculate_lines(self.W)

    def calculate_lines(self, W: int):
        """Number of outer lines and central lines for a mask of width W
        (reference mri.py:63-78)."""
        self.n_center = int(self.center_fraction * W)
        self.n_lines = int(W // self.acc - self.n_center)
        if self.n_lines < 0:
            raise ValueError(
                "center_fraction is too high for this acceleration factor."
            )
        elif self.n_lines == 0:
            warnings.warn(
                "Number of high frequency lines to be sampled is 0. Reduce "
                "acceleration factor or reduce center_fraction."
            )
        return self

    def _center_slice(self, W: int) -> slice:
        return slice(W // 2 - self.n_center // 2,
                     W // 2 + _ceildiv(self.n_center, 2))

    def get_pdf(self, W: int):
        """Unnormalized 1D sampling density across mask columns (reference
        generator/mri.py:92) — defined by weighted-line strategies."""
        raise NotImplementedError

    def sample_mask(self, key, B: int, T: int, H: int, W: int):
        """Sample line indicators of shape (B, T, W) (strategy-specific)."""
        raise NotImplementedError

    def sample(self, batch_size: int = 1, key=None, img_size=None, **kwargs):
        _B = 1 if batch_size == 0 else batch_size
        _T = self.T if self.T > 0 else 1
        _H, _W = (self.H, self.W) if img_size is None else tuple(img_size)
        self.calculate_lines(_W)

        if self.n_lines + self.n_center >= _W:
            lines = jnp.ones((_B, _T, _W), dtype=jnp.float32)
        else:
            lines = self.sample_mask(key, _B, _T, _H, _W)

        mask = jnp.broadcast_to(lines[:, None, :, None, :],
                                (_B, self.C, _T, _H, _W)).astype(jnp.float32)
        if self.T == 0:
            mask = mask[:, :, 0, :, :]
        if batch_size == 0:
            mask = mask[0]
        return {"mask": mask}


class _WeightedLineMaskGenerator(BaseMaskGenerator):
    """Shared draw-without-replacement path for Random/Gaussian generators
    (reference mri.py:170-196)."""

    def get_pdf(self, W: int):
        raise NotImplementedError

    def sample_mask(self, key, B, T, H, W):
        pdf = jnp.asarray(self.get_pdf(W), dtype=jnp.float32)
        pdf = pdf.at[self._center_slice(W)].set(0.0)
        pdf = pdf / jnp.sum(pdf)

        lines = jnp.zeros((B, T, W), dtype=jnp.float32)
        if self.n_lines > 0:
            keys = jax.random.split(key, B * T).reshape(B, T)

            def one(k):
                # Gumbel top-k == weighted sampling without replacement
                g = jax.random.gumbel(k, (W,))
                scores = jnp.where(pdf > 0, jnp.log(pdf) + g, -jnp.inf)
                idx = jax.lax.top_k(scores, self.n_lines)[1]
                return jnp.zeros((W,), jnp.float32).at[idx].set(1.0)

            lines = jax.vmap(jax.vmap(one))(keys)
        return lines.at[:, :, self._center_slice(W)].set(1.0)


class RandomMaskGenerator(_WeightedLineMaskGenerator):
    """Uniform random undersampling (reference mri.py:136-196).

    :Examples:

        Random k-t mask generator for an 8x64x64 video:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import RandomMaskGenerator
        >>> generator = RandomMaskGenerator((2, 8, 64, 64), acceleration=8,
        ...                                 center_fraction=0.04)
        >>> generator.step(batch_size=1, key=jax.random.key(0))["mask"].shape
        (1, 2, 8, 64, 64)
    """

    def get_pdf(self, W: int):
        return jnp.ones((W,), dtype=jnp.float32)


class GaussianMaskGenerator(_WeightedLineMaskGenerator):
    """Gaussian-density undersampling (reference mri.py:284-324): outer
    columns drawn from a tail-adjusted Gaussian so the expected number of
    selected columns is W / acceleration.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import GaussianMaskGenerator
        >>> generator = GaussianMaskGenerator((2, 64, 64), acceleration=4)
        >>> generator.step(batch_size=2, key=jax.random.key(0))["mask"].shape
        (2, 2, 64, 64)
    """

    def get_pdf(self, W: int):
        x = jnp.arange(W, dtype=jnp.float32)
        pdf = jnp.exp(-(0.5 / (W / 10.0) ** 2) * (x - W / 2) ** 2)
        return pdf + (W / (2.0 * self.acc)) / W


class EquispacedMaskGenerator(BaseMaskGenerator):
    """Equispaced undersampling with random offset, sheared across time
    (reference mri.py:327-389, after the fastMRI convention).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import EquispacedMaskGenerator
        >>> generator = EquispacedMaskGenerator((2, 8, 64, 64), acceleration=8)
        >>> generator.step(batch_size=1, key=jax.random.key(0))["mask"].shape
        (1, 2, 8, 64, 64)
    """

    def get_pdf(self):
        raise NotImplementedError(
            "get_pdf is undefined for this mask generator."
        )

    def sample_mask(self, key, B, T, H, W):
        lines = jnp.zeros((B, T, W), dtype=jnp.float32)
        pad = (W - self.n_center + 1) // 2
        lines = lines.at[:, :, pad:pad + self.n_center].set(1.0)

        # acceleration of the outer region once the fully-sampled center is
        # accounted for (reference mri.py:364-366)
        adjusted_accel = (self.acc * (self.n_center - W)) / (
            self.n_center * self.acc - W
        )
        offset = jax.random.randint(key, (B,), 0, round(adjusted_accel))

        ks = jnp.arange(W, dtype=jnp.float32)

        def one(b_off, t):
            start = (t + b_off) % adjusted_accel
            pos = start + ks * adjusted_accel
            valid = pos < W - 1
            idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0, W - 1)
            return jnp.zeros((W,), jnp.float32).at[idx].max(
                valid.astype(jnp.float32)
            )

        ts = jnp.arange(T, dtype=jnp.float32)
        sheared = jax.vmap(lambda o: jax.vmap(lambda t: one(o, t))(ts))(
            offset.astype(jnp.float32)
        )
        return jnp.maximum(lines, sheared)


class PolyOrderMaskGenerator(BaseMaskGenerator):
    """Polynomial variable-density Bernoulli sampling (reference
    mri.py:199-281, algorithm of Millard & Chiew 2023): the pdf
    ``clamp((1-r)^p + c, 0, 1)`` is scaled by binary search on ``c`` so its
    mean matches ``1/acceleration``, then each (batch, time) draws one
    Bernoulli realization per column.

    :param poly_order: polynomial order of the sampling pdf (default 8).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator.mri import PolyOrderMaskGenerator
        >>> generator = PolyOrderMaskGenerator((2, 128, 128), acceleration=8,
        ...                                    center_fraction=0.04, poly_order=8)
        >>> generator.step(batch_size=1, key=jax.random.key(0))["mask"].shape
        (1, 2, 128, 128)
    """

    def __init__(self, *args, poly_order: int = 8, **kwargs):
        super().__init__(*args, **kwargs)
        self.poly_order = poly_order
        self.pdf = jnp.asarray(self.get_pdf(), dtype=jnp.float32)

    def get_pdf(self, max_iter: int = 100, tol: float = 1e-3):
        W = self.W
        r = np.abs(np.linspace(-1, 1, W))
        pdf = (1 - r) ** self.poly_order
        center = self._center_slice(W)
        pdf[center] = 1.0

        a, b = -1.0, 1.0
        target = 1.0 / self.acc
        for _ in range(max_iter):
            c = (a + b) / 2
            scaled = np.clip(pdf + c, 0, 1)
            scaled[center] = 1.0
            frac = scaled.mean()
            if frac < target - tol:
                a = c
            elif frac > target + tol:
                b = c
            else:
                return scaled
        raise ValueError(f"get_pdf did not converge after {max_iter} iterations")

    def sample_mask(self, key, B, T, H, W):
        if (H, W) != (self.H, self.W):
            raise ValueError(
                "PolyOrderMaskGenerator pdf is precomputed for the "
                "constructor img_size; step-time img_size override is not "
                "supported."
            )
        draws = jax.random.uniform(key, (B, T, W))
        return (draws < self.pdf[None, None, :]).astype(jnp.float32)
