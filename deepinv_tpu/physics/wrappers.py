"""Physics wrappers: multiscale and cropping
(reference deepinv/physics/wrappers.py:11-612, virtual.py:6).

The multiscale wrappers evaluate a base physics from coarse-scale images:
``A_s(x_s) = A(U_s x_s)`` where ``U_s`` is a sinc-filtered zero-fill
upsampling (an :class:`Upsampling` physics), matching the reference
semantics so measurement-conditioned models trained against them (RAM)
port bit-for-bit. ``scale`` is passed explicitly to every method so the
wrapper stays functional under ``jit``; the mutating ``set_scale`` is kept
for reference-API compatibility in eager code.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..core import Module
from ..ops.conv import conv2d
from .base import Physics, LinearPhysics
from .blur import Blur, BlurFFT, Upsampling

__all__ = [
    "PhysicsMultiScaler",
    "LinearPhysicsMultiScaler",
    "BlurMultiScaler",
    "BlurFFTMultiScaler",
    "InpaintingMultiScaler",
    "coarse_blur_filter",
    "PhysicsCropper",
    "to_multiscale",
    "VirtualLinearPhysics",
]


class PhysicsMultiScaler(Physics):
    r"""Evaluate a physics at multiple scales (reference wrappers.py:11):
    ``A_s(x_s) = A(U_s x_s)`` where ``U_s`` upsamples the coarse image to the
    native resolution with an anti-aliasing filter (default sinc).

    :param physics: base physics operating at the fine scale.
    :param img_size: (C, H, W) fine-scale image size.
    :param filter: upsampling filter name or kernel ('sinc' default).
    :param factors: upsampling factor per scale index (scale s uses
        ``factors[s-1]``; scale 0 is the base physics).
    """

    def __init__(self, physics: Physics, img_size=None, filter="sinc",
                 factors=(2, 4, 8), scale: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.base = physics
        self.img_size = tuple(img_size) if img_size is not None else None
        self.factors = tuple(factors)
        self.upsamplings = [
            Upsampling(img_size=self.img_size, filter=filter, factor=f)
            for f in self.factors
        ]
        self.scale = scale
        self.noise_model = physics.noise_model
        self.sensor_model = physics.sensor_model

    # -- scale selection ----------------------------------------------------
    def set_scale(self, scale=None):
        """Mutating scale setter (reference wrappers.py:62). Prefer passing
        ``scale=`` to each call (functional, jit-safe)."""
        if scale is not None:
            self.scale = scale

    def with_scale(self, scale: int):
        return self.replace(scale=scale)

    def _s(self, scale):
        return self.scale if scale is None else scale

    # -- operator -----------------------------------------------------------
    def A(self, x, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.A(x, **params)
        return self.base.A(self.upsamplings[s - 1].A(x), **params)

    def upsample(self, x, scale=None):
        s = self._s(scale)
        return x if s == 0 else self.upsamplings[s - 1].A(x)

    def downsample(self, x, scale=None):
        s = self._s(scale)
        return x if s == 0 else self.upsamplings[s - 1].A_adjoint(x)

    def downsample_measurement(self, y, scale=None):
        raise NotImplementedError(
            "downsample_measurement is physics-specific; see BlurMultiScaler, "
            "BlurFFTMultiScaler, InpaintingMultiScaler (reference wrappers.py:87)."
        )

    def update(self, **params):
        new = self.replace(base=self.base.update(**params))
        # keep the wrapper's own noise_model (used by Physics.__call__) in
        # sync with the base: without this, generator-driven sigma updates
        # and explicit noise_model= replacements were silently ignored
        if "noise_model" in params or getattr(new.base, "noise_model", None) is not getattr(self.base, "noise_model", None):
            new = new.replace(noise_model=getattr(new.base, "noise_model", None))
        return new


class LinearPhysicsMultiScaler(PhysicsMultiScaler, LinearPhysics):
    r"""Linear multiscale wrapper (reference wrappers.py:117):
    ``A_s^T = U_s^T A^T``."""

    def A_adjoint(self, y, scale=None, **params):
        s = self._s(scale)
        at = self.base.A_adjoint(y, **params)
        return at if s == 0 else self.upsamplings[s - 1].A_adjoint(at)

    def A_adjoint_A(self, x, scale=None, **params):
        return self.A_adjoint(self.A(x, scale=scale, **params), scale=scale, **params)

    def A_dagger(self, y, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.A_dagger(y, **params)
        return LinearPhysics.A_dagger(self.with_scale(s), y, **params)

    def prox_l2(self, z, y, gamma, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.prox_l2(z, y, gamma, **params)
        return LinearPhysics.prox_l2(self.with_scale(s), z, y, gamma, **params)


def coarse_blur_filter(in_filter, downsampling_filter, scale: int = 2):
    r"""Blur filter of the coarse-scale operator (reference wrappers.py:242):
    the fine filter convolved with the anti-aliasing filter and decimated,
    renormalized to preserve the filter mass."""
    in_filter = jnp.asarray(in_filter)
    df = jnp.asarray(downsampling_filter)

    diff_h = max(df.shape[-2] - in_filter.shape[-2], 0)
    diff_w = max(df.shape[-1] - in_filter.shape[-1], 0)
    pad_left, pad_top = diff_w // 2, diff_h // 2
    new_filt = jnp.pad(
        in_filter,
        [(0, 0)] * (in_filter.ndim - 2)
        + [(pad_top, diff_h - pad_top), (pad_left, diff_w - pad_left)],
    )
    # pad so the strided "valid" convolution covers the whole support
    ph, pw = df.shape[-2] // 2, df.shape[-1] // 2
    new_filt = jnp.pad(new_filt, [(0, 0)] * (new_filt.ndim - 2) + [(ph, ph), (pw, pw)])

    B, C, H, W = new_filt.shape
    inp = new_filt.reshape(B * C, 1, H, W)
    ker = jnp.broadcast_to(df[:1, :1], (1, 1) + df.shape[-2:])
    out = jax.lax.conv_general_dilated(
        inp, ker, window_strides=(scale, scale), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    coarse = out.reshape(B, C, out.shape[-2], out.shape[-1])
    return coarse / jnp.sum(coarse) * jnp.sum(new_filt)


class BlurMultiScaler(LinearPhysicsMultiScaler):
    r"""Multiscale blur (reference wrappers.py:281): coarse scales use a
    pre-coarsened kernel so ``A_s^T A_s`` runs on the coarse grid directly."""

    def __init__(self, physics, img_size=None, filter="sinc", factors=(2, 4, 8),
                 **kwargs):
        super().__init__(physics, img_size=img_size, filter=filter,
                         factors=factors, **kwargs)
        self.scaled_physics = [
            Blur(
                filter=coarse_blur_filter(physics.filter, ups.filter, ups.factor),
                padding=physics.padding,
            )
            for ups in self.upsamplings
        ]

    def downsample_measurement(self, y, scale=None):
        s = self._s(scale)
        return y if s == 0 else self.upsamplings[s - 1].A_adjoint(y)

    def A_adjoint_A(self, x, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.A_adjoint_A(x, **params)
        return self.scaled_physics[s - 1].A_adjoint_A(x) / self.factors[s - 1] ** 2


class BlurFFTMultiScaler(LinearPhysicsMultiScaler):
    r"""Multiscale FFT blur (reference wrappers.py:345)."""

    def __init__(self, physics, img_size=None, filter="sinc", factors=(2, 4, 8),
                 **kwargs):
        super().__init__(physics, img_size=img_size, filter=filter,
                         factors=factors, **kwargs)
        img_size = self.img_size if self.img_size is not None else physics.img_size
        self.scaled_physics = [
            BlurFFT(
                img_size=(img_size[0],
                          math.ceil(img_size[1] / ups.factor),
                          math.ceil(img_size[2] / ups.factor)),
                filter=coarse_blur_filter(physics.filter, ups.filter, ups.factor),
            )
            for ups in self.upsamplings
        ]

    def downsample_measurement(self, y, scale=None):
        s = self._s(scale)
        return y if s == 0 else self.upsamplings[s - 1].A_adjoint(y)

    def A_adjoint_A(self, x, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.A_adjoint_A(x, **params)
        return self.scaled_physics[s - 1].A_adjoint_A(x) / self.factors[s - 1] ** 2


class InpaintingMultiScaler(LinearPhysicsMultiScaler):
    r"""Multiscale inpainting (reference wrappers.py:415): the coarse mask is
    the sinc-downsampled fine mask."""

    def __init__(self, physics, img_size=None, filter="sinc", factors=(2, 4, 8),
                 **kwargs):
        from .inpainting import Inpainting

        super().__init__(physics, img_size=img_size, filter=filter,
                         factors=factors, **kwargs)
        self.scaled_physics = []
        for ups in self.upsamplings:
            mask = physics.mask
            coarse = ups.A_adjoint(mask[None] if mask.ndim == 3 else mask)
            coarse = coarse[0] if mask.ndim == 3 else coarse
            self.scaled_physics.append(
                Inpainting(img_size=coarse.shape[-3:], mask=coarse)
            )

    def downsample_measurement(self, y, scale=None):
        s = self._s(scale)
        return y if s == 0 else self.upsamplings[s - 1].A_adjoint(y)

    def A_adjoint_A(self, x, scale=None, **params):
        s = self._s(scale)
        if s == 0:
            return self.base.A_adjoint_A(x, **params)
        return self.scaled_physics[s - 1].A_adjoint_A(x) / self.factors[s - 1] ** 2


def to_multiscale(physics: Physics, img_size=None, factors=(2, 4, 8),
                  **kwargs) -> PhysicsMultiScaler:
    """Wrap a physics for multiscale evaluation, dispatching to the
    specialized wrapper when one exists (reference wrappers.py:481).

    :Examples:

        >>> import jax
        >>> from deepinv_tpu.physics import Inpainting, to_multiscale
        >>> base = Inpainting(img_size=(1, 16, 16), mask=0.5,
        ...                   key=jax.random.key(0))
        >>> ms = to_multiscale(base, img_size=(1, 16, 16))
        >>> x_coarse = jax.random.uniform(jax.random.key(1), (1, 1, 8, 8))
        >>> ms.A(x_coarse, scale=1).shape  # coarse input, native measurement
        (1, 1, 16, 16)
    """
    from .inpainting import Inpainting

    if isinstance(physics, BlurFFT):
        return BlurFFTMultiScaler(physics, img_size=img_size, factors=factors, **kwargs)
    if isinstance(physics, Blur):
        return BlurMultiScaler(physics, img_size=img_size, factors=factors, **kwargs)
    if isinstance(physics, Inpainting):
        return InpaintingMultiScaler(physics, img_size=img_size, factors=factors, **kwargs)
    if isinstance(physics, LinearPhysics):
        return LinearPhysicsMultiScaler(physics, img_size=img_size, factors=factors, **kwargs)
    return PhysicsMultiScaler(physics, img_size=img_size, factors=factors, **kwargs)


class PhysicsCropper(LinearPhysics):
    r"""Pad/crop the physics input domain (reference wrappers.py:565):
    ``A_pad(x) = A(remove_pad(x))`` where ``remove_pad`` drops ``crop``
    rows/columns from the top/left and ``pad`` (the adjoint) restores them
    with zeros. ``crop`` is ``(pad_h, pad_w)`` or ``(pad_c, pad_h, pad_w)``."""

    def __init__(self, physics: LinearPhysics, crop, **kwargs):
        super().__init__(**kwargs)
        self.base = physics
        self.crop = tuple(crop)
        if len(self.crop) not in (2, 3):
            raise ValueError("Crop must be a tuple of length 2 or 3.")
        self.noise_model = physics.noise_model

    def remove_pad(self, x):
        if len(self.crop) == 2:
            return x[..., self.crop[0]:, self.crop[1]:]
        return x[..., self.crop[0]:, self.crop[1]:, self.crop[2]:]

    def pad(self, x):
        pads = [(c, 0) for c in self.crop]
        return jnp.pad(x, [(0, 0)] * (x.ndim - len(pads)) + pads)

    def A(self, x, **params):
        return self.base.A(self.remove_pad(x), **params)

    def A_adjoint(self, y, **params):
        return self.pad(self.base.A_adjoint(y, **params))

    def update(self, **params):
        new = self.replace(base=self.base.update(**params))
        # keep the wrapper's own noise_model (used by Physics.__call__) in
        # sync with the base: without this, generator-driven sigma updates
        # and explicit noise_model= replacements were silently ignored
        if "noise_model" in params or getattr(new.base, "noise_model", None) is not getattr(self.base, "noise_model", None):
            new = new.replace(noise_model=getattr(new.base, "noise_model", None))
        return new


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
