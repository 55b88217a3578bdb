"""Reconstruct Anything Model (reference deepinv/models/ram.py:20, 1292 LoC).

Measurement-conditioned foundation reconstructor: works both as
``model(y, physics)`` (reconstructor) and ``model(y, sigma=..., gain=...)``
(denoiser). The conditioning follows the reference design: the backbone sees
the adjoint/pseudoinverse initialization concatenated with Gaussian/Poisson
noise-level maps and a Krylov data-consistency residual, and interleaves
gradient steps on the data fidelity between scales.

No pretrained weights exist offline; this is the architecture, trainable via
the standard Trainer.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser, Reconstructor, handle_sigma
from .drunet import ResBlock
from .layers import Conv2d, ConvTranspose2d, Sequential
from .utils import test_pad

__all__ = ["RAM"]


class RAM(Reconstructor):
    """Compact RAM: physics-conditioned multiscale reconstructor.

    :param in_channels: image channels (1, 2 or 3 heads like the reference).
    :param nc: channel widths per scale.
    """

    def __init__(self, in_channels: int = 3, nc=(32, 64, 128), nb: int = 2, key=None, pretrained=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 64))
        self.in_channels = in_channels
        # input: x0 (C) + sigma map (1) + gain map (1) + DC residual (C)
        cin = in_channels * 2 + 2
        self.m_head = Conv2d(cin, nc[0], 3, 1, 1, bias=False, key=next(ks))

        def down_stage(c1, c2):
            blocks = [ResBlock(c1, key=next(ks)) for _ in range(nb)]
            return Sequential(*blocks, Conv2d(c1, c2, 2, 2, 0, bias=False, key=next(ks)))

        def up_stage(c1, c2):
            up = ConvTranspose2d(c1, c2, 2, 2, 0, bias=False, key=next(ks))
            blocks = [ResBlock(c2, key=next(ks)) for _ in range(nb)]
            return Sequential(up, *blocks)

        self.m_down1 = down_stage(nc[0], nc[1])
        self.m_down2 = down_stage(nc[1], nc[2])
        self.m_body = Sequential(*[ResBlock(nc[2], key=next(ks)) for _ in range(nb)])
        self.m_up2 = up_stage(nc[2], nc[1])
        self.m_up1 = up_stage(nc[1], nc[0])
        self.m_tail = Conv2d(nc[0], in_channels, 3, 1, 1, bias=False, key=next(ks))

    def forward_unet(self, xin):
        """Backbone over the pre-assembled conditioned input (2C+2 chans)."""
        C = self.in_channels
        x0 = xin[:, :C]
        h1 = self.m_head(xin)
        h2 = self.m_down1(h1)
        h3 = self.m_down2(h2)
        b = self.m_body(h3)
        u = self.m_up2(b + h3)
        u = self.m_up1(u + h2)
        return x0 + self.m_tail(u + h1)

    def __call__(self, y, physics=None, sigma=None, gain=None, img_size=None, **kwargs):
        if physics is None:
            x0 = y  # denoiser mode: y is the noisy image
            dc = jnp.zeros_like(x0)
        else:
            x0 = physics.A_adjoint(y)
            nm = getattr(physics, "noise_model", None)
            if sigma is None and nm is not None and hasattr(nm, "sigma"):
                sigma = nm.sigma
            if gain is None and nm is not None and hasattr(nm, "gain"):
                gain = nm.gain
            # data-consistency residual channel: A^T(A x0 - y), computed at
            # the native size (before any padding)
            dc = physics.A_adjoint(physics.A(x0) - y)
        smap = handle_sigma(0.0 if sigma is None else sigma, x0)
        gmap = handle_sigma(0.0 if gain is None else gain, x0)
        xin = jnp.concatenate([x0, dc, smap, gmap], axis=1)
        H, W = x0.shape[-2:]
        if H % 8 or W % 8:
            return test_pad(self.forward_unet, xin, modulo=8)
        return self.forward_unet(xin)
