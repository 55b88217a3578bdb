"""Remote sensing physics (reference deepinv/physics/remote_sensing.py:8).

Pansharpen = stack(Downsampling (low-res multispectral), Decolorize
(high-res panchromatic)); measurements are a TensorList [color_lr, pan_hr].
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import TensorList
from .base import StackedLinearPhysics
from .blur import Downsampling
from .misc import Decolorize

__all__ = ["Pansharpen"]


class Pansharpen(StackedLinearPhysics):
    r"""Pansharpening operator (reference remote_sensing.py:8).

    :param img_size: (C, H, W) of the high-resolution multispectral image.
    :param filter: anti-aliasing filter for the downsampling branch.
    :param factor: downsampling factor.
    :param srf: spectral response function for the pan branch.
    """

    def __init__(
        self,
        img_size,
        filter="gaussian",
        factor: int = 4,
        srf="flat",
        noise_color=None,
        noise_gray=None,
        padding: str = "circular",
        **kwargs,
    ):
        downsampling = Downsampling(
            img_size=img_size, filter=filter, factor=factor, padding=padding,
            noise_model=noise_color,
        )
        decolorize = Decolorize(img_size=img_size, srf=srf, noise_model=noise_gray)
        super().__init__([downsampling, decolorize], **kwargs)
        self.img_size = tuple(img_size)
        self.factor = factor

    @property
    def downsampling(self):
        return self.physics_list[0]

    @property
    def decolorize(self):
        return self.physics_list[1]

    def brovey(self, y, eps: float = 1e-6):
        """Brovey pansharpening baseline (reference use_brovey path)."""
        color_lr, pan = y[0], y[1]
        up = self.downsampling.A_adjoint(color_lr) * (self.factor**2)
        intensity = jnp.mean(up, axis=1, keepdims=True)
        return up * pan / jnp.clip(intensity, eps, None)
