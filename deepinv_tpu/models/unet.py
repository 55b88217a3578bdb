"""UNet denoiser/reconstructor backbone (reference deepinv/models/unet.py:355)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d, ConvTranspose2d, MaxPool2d, Sequential, BatchNorm2d
from .utils import test_pad

__all__ = ["UNet"]


class _DoubleConv(Module):
    def __init__(self, cin, cout, batch_norm=True, dim=2, key=None):
        from .layers import conv_nd

        k1, k2 = jax.random.split(key if key is not None else jax.random.key(0))
        Conv = conv_nd(dim)
        self.conv1 = Conv(cin, cout, 3, 1, 1, bias=not batch_norm, key=k1)
        self.conv2 = Conv(cout, cout, 3, 1, 1, bias=not batch_norm, key=k2)
        self.bn1 = BatchNorm2d(cout) if batch_norm else None
        self.bn2 = BatchNorm2d(cout) if batch_norm else None

    def __call__(self, x):
        x = self.conv1(x)
        if self.bn1 is not None:
            x = self.bn1(x)
        x = jax.nn.relu(x)
        x = self.conv2(x)
        if self.bn2 is not None:
            x = self.bn2(x)
        return jax.nn.relu(x)


class UNet(Denoiser):
    """4-scale UNet with concat skips (reference unet.py:355).

    :param residual: add the input back to the output (denoising mode).
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int = 3,
        scales: int = 4,
        base: int = 64,
        residual: bool = True,
        batch_norm: bool = True,
        dim=2,
        key=None,
    ):
        from .layers import MaxPool3d, conv_nd, conv_transpose_nd, fix_dim

        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 32))
        self.scales = scales
        self.residual = residual
        dim = fix_dim(dim)
        self.dim = dim
        Conv = conv_nd(dim)
        ConvT = conv_transpose_nd(dim)
        chans = [base * (2**i) for i in range(scales)]

        self.inc = _DoubleConv(in_channels, chans[0], batch_norm, dim,
                               next(ks))
        self.down = [
            _DoubleConv(chans[i], chans[i + 1], batch_norm, dim, next(ks))
            for i in range(scales - 1)
        ]
        self.pool = MaxPool2d(2) if dim == 2 else MaxPool3d(2)
        self.upconv = [
            ConvT(chans[i + 1], chans[i], 2, 2, key=next(ks))
            for i in reversed(range(scales - 1))
        ]
        self.up = [
            _DoubleConv(chans[i] * 2, chans[i], batch_norm, dim, next(ks))
            for i in reversed(range(scales - 1))
        ]
        self.outc = Conv(chans[0], out_channels, 1, 1, 0, key=next(ks))

    def _forward(self, x):
        feats = [self.inc(x)]
        for d in self.down:
            feats.append(d(self.pool(feats[-1])))
        h = feats[-1]
        for up_conv, dc, skip in zip(self.upconv, self.up, reversed(feats[:-1])):
            h = up_conv(h)
            h = dc(jnp.concatenate([skip, h], axis=1))
        return self.outc(h)

    def __call__(self, x, sigma=None, **kwargs):
        mod = 2 ** (self.scales - 1)
        if all(s % mod == 0 for s in x.shape[2:]):
            out = self._forward(x)
        else:
            out = test_pad(self._forward, x, modulo=mod)
        return out + x if self.residual and out.shape == x.shape else out
