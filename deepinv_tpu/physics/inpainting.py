"""Inpainting and demosaicing physics (reference deepinv/physics/inpainting.py).

:class:`Inpainting` is a :class:`DecomposablePhysics` with a binary (or soft)
mask as the singular-value diagonal — closed-form prox and dagger. The mask
is a pytree leaf, so random-mask training (splitting losses) is a pure
``update(mask=...)`` or a vmap over masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.rng import ensure_key
from .base import DecomposablePhysics

__all__ = ["Inpainting", "Demosaicing"]


class Inpainting(DecomposablePhysics):
    r"""Mask-multiplication forward operator (reference inpainting.py:8).

    :param img_size: image size (C, H, W) or (C, D, H, W).
    :param mask: None | float in (0,1) (random mask split ratio) | array mask.
        Float semantics match the reference: each pixel kept with prob
        ``mask`` (sampled once at construction from ``key``/``seed``).
    :param pixelwise: if True the mask is shared across channels.
    """

    def __init__(self, img_size, mask=None, pixelwise: bool = True, key=None, seed: int = 0, **kwargs):
        super().__init__(**kwargs)
        self.img_size = tuple(img_size)
        if mask is None:
            mask = 0.5
        if isinstance(mask, float) and 0 < mask <= 1:
            key = ensure_key(key, seed)
            if pixelwise:
                shape = (1,) + self.img_size[1:]
            else:
                shape = self.img_size
            m = (jax.random.uniform(key, shape) < mask).astype(jnp.float32)
            if pixelwise:
                m = jnp.broadcast_to(m, self.img_size)
            self.mask = m[None]  # (1, C, H, W) broadcasting over batch
        else:
            m = jnp.asarray(mask)
            if m.ndim == len(self.img_size):
                m = m[None]
            self.mask = m

    def noise(self, y, key=None):
        # measurements outside the mask stay exactly zero (reference :120)
        if self.noise_model is None:
            return y
        return self.noise_model(y, key=key) * (jnp.abs(self.mask) > 0)

    def __mul__(self, other):
        from .base import compose

        return compose(other, self)


class Demosaicing(Inpainting):
    r"""Bayer-pattern demosaicing (reference inpainting.py:170).

    RGGB Bayer pattern: the mask keeps one color per pixel.
    """

    def __init__(self, img_size, pattern: str = "RGGB", **kwargs):
        import numpy as np

        C, H, W = img_size if len(img_size) == 3 else (3,) + tuple(img_size)
        mask = np.zeros((3, H, W), np.float32)  # host-side static constant
        if pattern.upper() == "RGGB":
            mask[0, 0::2, 0::2] = 1  # R
            mask[1, 0::2, 1::2] = 1  # G
            mask[1, 1::2, 0::2] = 1  # G
            mask[2, 1::2, 1::2] = 1  # B
        else:
            raise ValueError(f"unsupported Bayer pattern {pattern!r}")
        mask = jnp.asarray(mask)
        super().__init__((3, H, W), mask=mask, **kwargs)
