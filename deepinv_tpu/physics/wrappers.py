"""Physics wrappers: multiscale and cropping
(reference deepinv/physics/wrappers.py:11-612, virtual.py:6).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Physics, LinearPhysics

__all__ = [
    "PhysicsMultiScaler",
    "LinearPhysicsMultiScaler",
    "PhysicsCropper",
    "to_multiscale",
    "VirtualLinearPhysics",
]


def _downscale(x, scale: int):
    """Average-pool downscale by 2**scale."""
    for _ in range(scale):
        x = 0.25 * (
            x[..., 0::2, 0::2] + x[..., 1::2, 0::2] + x[..., 0::2, 1::2] + x[..., 1::2, 1::2]
        )
    return x


def _upscale(x, scale: int):
    """Nearest-neighbor upscale by 2**scale (adjoint-consistent with
    average pooling up to scaling)."""
    for _ in range(scale):
        x = jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)
    return x


class PhysicsMultiScaler(Physics):
    r"""Evaluate a physics at multiple scales (reference wrappers.py:11):
    ``A_s(x_s) = A(U_s x_s)`` where ``U_s`` upsamples the coarse image to the
    native resolution.
    """

    def __init__(self, physics: Physics, scale: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.physics = physics
        self.scale = scale
        self.noise_model = physics.noise_model
        self.sensor_model = physics.sensor_model

    def with_scale(self, scale: int):
        return self.replace(scale=scale)

    def A(self, x, scale=None, **params):
        s = self.scale if scale is None else scale
        return self.physics.A(_upscale(x, s), **params)

    def A_dagger(self, y, scale=None, **params):
        s = self.scale if scale is None else scale
        return _downscale(self.physics.A_dagger(y, **params), s)


class LinearPhysicsMultiScaler(PhysicsMultiScaler, LinearPhysics):
    r"""Linear multiscale wrapper (reference wrappers.py:117)."""

    def __init__(self, physics: LinearPhysics, scale: int = 0, **kwargs):
        PhysicsMultiScaler.__init__(self, physics, scale=scale, **kwargs)

    def A_adjoint(self, y, scale=None, **params):
        s = self.scale if scale is None else scale
        at = self.physics.A_adjoint(y, **params)
        # adjoint of nearest-upsample = sum-pool = 4^s * avg-pool
        return _downscale(at, s) * (4**s)


class BlurMultiScaler(LinearPhysicsMultiScaler):
    r"""Multiscale wrapper for blur physics (reference wrappers.py:281):
    the blur evaluated from coarse-scale images, with measurements
    downsamplable to coarse scales (``downsample_measurement``)."""

    def downsample_measurement(self, y, scale=None):
        s = self.scale if scale is None else scale
        return _downscale(y, s)


class BlurFFTMultiScaler(BlurMultiScaler):
    r"""Multiscale wrapper for FFT blur physics (reference wrappers.py:345)."""


class InpaintingMultiScaler(LinearPhysicsMultiScaler):
    r"""Multiscale wrapper for inpainting physics (reference wrappers.py:415):
    the coarse-scale mask is the average-pooled fine mask."""

    def downsample_measurement(self, y, scale=None):
        s = self.scale if scale is None else scale
        return _downscale(y, s)


def to_multiscale(physics: Physics, scale: int = 0) -> PhysicsMultiScaler:
    """Wrap a physics for multiscale evaluation (reference to_multiscale)."""
    if isinstance(physics, LinearPhysics):
        return LinearPhysicsMultiScaler(physics, scale=scale)
    return PhysicsMultiScaler(physics, scale=scale)


class PhysicsCropper(LinearPhysics):
    r"""Crop the physics input domain (reference wrappers.py:565):
    ``A_crop(x) = A(pad(x))`` for working on a region of interest."""

    def __init__(self, physics: LinearPhysics, crop, **kwargs):
        super().__init__(**kwargs)
        self.physics = physics
        self.crop = tuple(crop)  # (top, left, height, width) in the native grid
        self.noise_model = physics.noise_model

    def _pad(self, x, full_shape):
        top, left, h, w = self.crop
        H, W = full_shape
        return jnp.pad(
            x,
            [(0, 0)] * (x.ndim - 2) + [(top, H - top - h), (left, W - left - w)],
        )

    def A(self, x, full_shape=None, **params):
        if full_shape is None:
            raise ValueError("PhysicsCropper.A requires full_shape=(H, W)")
        return self.physics.A(self._pad(x, full_shape), **params)

    def A_adjoint(self, y, **params):
        at = self.physics.A_adjoint(y, **params)
        top, left, h, w = self.crop
        return at[..., top : top + h, left : left + w]


class VirtualLinearPhysics(LinearPhysics):
    r"""Lazily-rebuilt physics for memory frugality (reference virtual.py:6):
    stores a factory instead of the operator; under jit the rebuild traces
    into the same program, so this is free on TPU."""

    def __init__(self, factory: Callable[[], LinearPhysics], **kwargs):
        super().__init__(**kwargs)
        self.factory = factory

    def _p(self):
        return self.factory()

    def A(self, x, **params):
        return self._p().A(x, **params)

    def A_adjoint(self, y, **params):
        return self._p().A_adjoint(y, **params)

    def A_dagger(self, y, **params):
        return self._p().A_dagger(y, **params)

    def prox_l2(self, z, y, gamma, **params):
        return self._p().prox_l2(z, y, gamma, **params)
