"""SCUNet denoiser (reference deepinv/models/scunet.py, 491 LoC).

Swin-Conv UNet: each stage mixes a residual conv branch with a Swin
transformer branch (the "SC" block), with strided-conv down and
transposed-conv up. Reuses the window-attention blocks from swinir.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, ConvTranspose2d
from .swinir import _SwinBlock
from .utils import test_pad

__all__ = ["SCUNet"]


class _SCBlock(Module):
    """Swin-Conv block: split channels into a conv path and a swin path."""

    def __init__(self, dim, ws, key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        half = dim // 2
        self.proj_in = Conv2d(dim, dim, 1, 1, 0, key=k1)
        self.conv1 = Conv2d(half, half, 3, 1, 1, key=k2)
        self.conv2 = Conv2d(half, half, 3, 1, 1, key=k3)
        self.swin = _SwinBlock(dim - half, 2, ws, 0, 2.0, k4)
        self.proj_out = Conv2d(dim, dim, 1, 1, 0, key=jax.random.fold_in(key, 9))
        self.half = half

    def __call__(self, x):
        h = self.proj_in(x)
        c, t = h[:, : self.half], h[:, self.half :]
        c = self.conv2(jax.nn.relu(self.conv1(c)))
        B, C, H, W = t.shape
        tt = jnp.transpose(t, (0, 2, 3, 1)).reshape(B, H * W, C)
        tt = self.swin(tt, H, W)
        t = jnp.transpose(tt.reshape(B, H, W, C), (0, 3, 1, 2))
        return x + self.proj_out(jnp.concatenate([c, t], axis=1))


class SCUNet(Denoiser):
    """SCUNet (reference scunet.py:491), compact configuration."""

    def __init__(self, in_nc: int = 3, dim: int = 32, n_blocks: int = 2, window_size: int = 8, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 64))
        self.head = Conv2d(in_nc, dim, 3, 1, 1, key=next(ks))
        self.enc1 = [_SCBlock(dim, window_size, next(ks)) for _ in range(n_blocks)]
        self.down1 = Conv2d(dim, dim * 2, 2, 2, 0, key=next(ks))
        self.enc2 = [_SCBlock(dim * 2, window_size, next(ks)) for _ in range(n_blocks)]
        self.down2 = Conv2d(dim * 2, dim * 4, 2, 2, 0, key=next(ks))
        self.body = [_SCBlock(dim * 4, window_size, next(ks)) for _ in range(n_blocks)]
        self.up2 = ConvTranspose2d(dim * 4, dim * 2, 2, 2, key=next(ks))
        self.dec2 = [_SCBlock(dim * 2, window_size, next(ks)) for _ in range(n_blocks)]
        self.up1 = ConvTranspose2d(dim * 2, dim, 2, 2, key=next(ks))
        self.dec1 = [_SCBlock(dim, window_size, next(ks)) for _ in range(n_blocks)]
        self.tail = Conv2d(dim, in_nc, 3, 1, 1, key=next(ks))
        self.window_size = window_size

    def _forward(self, x):
        h1 = self.head(x)
        for b in self.enc1:
            h1 = b(h1)
        h2 = self.down1(h1)
        for b in self.enc2:
            h2 = b(h2)
        h3 = self.down2(h2)
        for b in self.body:
            h3 = b(h3)
        u2 = self.up2(h3) + h2
        for b in self.dec2:
            u2 = b(u2)
        u1 = self.up1(u2) + h1
        for b in self.dec1:
            u1 = b(u1)
        return x + self.tail(u1)

    def __call__(self, x, sigma=None, **kwargs):
        mod = self.window_size * 4
        H, W = x.shape[-2:]
        if H % mod or W % mod:
            return test_pad(self._forward, x, modulo=mod)
        return self._forward(x)
