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
    """Random (filter, factor) parameters for
    :class:`deepinv_tpu.physics.Downsampling`
    (reference generator/downsampling.py:7).

    Per-batch-element filter kernels are drawn from ``filters`` (padded to
    ``psf_size`` so they stack); when ``batch_size > 1`` and several factors
    are given, a single factor is drawn for the whole batch so all
    measurements share a static shape (reference downsampling.py:119).

    :param filters: filter names among "gaussian"/"bilinear"/"bicubic".
    :param factors: candidate integer downsampling factors.
    :param psf_size: pad all kernels to this (h, w); required to mix filter
        types with different support in one batch.

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics.generator import DownsamplingGenerator
        >>> gen = DownsamplingGenerator(filters=["bilinear", "bicubic"],
        ...                             factors=[2, 4], psf_size=(17, 17))
        >>> params = gen.step(batch_size=3, key=jax.random.key(0))
        >>> sorted(params), params["filter"].shape, params["factor"].shape
        (['factor', 'filter'], (3, 1, 17, 17), (3,))
    """

    def __init__(self, filters=("gaussian", "bilinear", "bicubic"),
                 factors=(2, 4), psf_size=None, seed: int = 0):
        super().__init__(seed=seed)
        self.filters = [filters] if isinstance(filters, str) else list(filters)
        self.factors = [factors] if isinstance(factors, int) else list(factors)
        self.psf_size = tuple(psf_size) if psf_size is not None else None

    def get_kernel(self, filter_str: str = None, factor=None):
        """Filter tensor for a given name/factor (reference
        downsampling.py:96)."""
        return self.str2filter(filter_str, factor)

    def str2filter(self, filter_name: str, factor: int):
        """Kernel for a named filter at the given factor, padded to
        ``psf_size`` (reference downsampling.py:59)."""
        from ...ops.conv import gaussian_blur, bilinear_filter, bicubic_filter

        if filter_name == "gaussian":
            filt = gaussian_blur(sigma=(factor, factor))
        elif filter_name == "bilinear":
            filt = bilinear_filter(factor)
        elif filter_name == "bicubic":
            filt = bicubic_filter(factor)
        else:
            raise ValueError(f"unknown filter {filter_name!r}")

        if self.psf_size is not None:
            # torch.nn.functional.pad semantics: negative pads crop
            for ax, target in ((-2, self.psf_size[0]), (-1, self.psf_size[1])):
                d = target - filt.shape[ax]
                lo, hi = d // 2, d - d // 2
                if d >= 0:
                    pads = [(0, 0)] * filt.ndim
                    pads[ax] = (lo, hi)
                    filt = jnp.pad(filt, pads)
                else:
                    idx = [slice(None)] * filt.ndim
                    idx[ax] = slice(-lo, filt.shape[ax] + hi)
                    filt = filt[tuple(idx)]
        return filt

    def sample(self, batch_size, key, **kwargs):
        k1, k2 = jax.random.split(key)
        if batch_size > 1 and len(self.factors) > 1:
            f_idx = jnp.full((batch_size,),
                             jax.random.randint(k1, (), 0, len(self.factors)))
        else:
            f_idx = jax.random.randint(k1, (batch_size,), 0, len(self.factors))
        factors = [self.factors[int(i)] for i in f_idx]
        filt_idx = jax.random.randint(k2, (batch_size,), 0, len(self.filters))
        kernels = [
            self.str2filter(self.filters[int(i)], f)
            for i, f in zip(filt_idx, factors)
        ]
        if not all(k.shape == kernels[0].shape for k in kernels):
            raise ValueError(
                "Generated filters have different shapes in batch. Set the "
                "psf_size argument so all filters share one shape, or limit "
                "filters/factors to one type per batch."
            )
        return {"filter": jnp.concatenate(kernels, axis=0),
                "factor": jnp.asarray(factors)}
