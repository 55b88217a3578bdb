"""CNN denoisers: FFDNet, SRResNet, AutoEncoder, DScCP
(reference deepinv/models/{ffdnet.py,srresnet.py,ae.py,dsccp.py}).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser, Reconstructor, handle_sigma
from .layers import Conv2d, ConvTranspose2d, Sequential, PixelShuffle, BatchNorm2d

__all__ = ["FFDNet", "SRResNet", "AutoEncoder", "DScCP"]


class FFDNet(Denoiser):
    """FFDNet (reference ffdnet.py:128): pixel-unshuffle by 2, concat noise
    map, 15 conv layers, pixel-shuffle back."""

    def __init__(self, in_channels: int = 3, out_channels: int = 3, nf: int = 64, depth: int = 15, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, depth + 2))
        cin = in_channels * 4 + 1
        layers = [Conv2d(cin, nf, 3, 1, 1, key=next(ks))]
        for _ in range(depth - 2):
            layers.append(Conv2d(nf, nf, 3, 1, 1, key=next(ks)))
        layers.append(Conv2d(nf, out_channels * 4, 3, 1, 1, key=next(ks)))
        self.layers = layers

    @staticmethod
    def _unshuffle(x):
        B, C, H, W = x.shape
        x = x.reshape(B, C, H // 2, 2, W // 2, 2)
        return jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(B, C * 4, H // 2, W // 2)

    @staticmethod
    def _shuffle(x):
        B, C4, H, W = x.shape
        C = C4 // 4
        x = x.reshape(B, C, 2, 2, H, W)
        return jnp.transpose(x, (0, 1, 4, 2, 5, 3)).reshape(B, C, H * 2, W * 2)

    def __call__(self, x, sigma=0.05, **kwargs):
        H, W = x.shape[-2:]
        ph, pw = H % 2, W % 2
        xp = jnp.pad(x, [(0, 0), (0, 0), (0, ph), (0, pw)], mode="edge")
        u = self._unshuffle(xp)
        sig = handle_sigma(sigma, u)[:, :1]
        h = jnp.concatenate([u, sig], axis=1)
        for i, l in enumerate(self.layers):
            h = l(h)
            if i < len(self.layers) - 1:
                h = jax.nn.relu(h)
        out = self._shuffle(h)
        return out[..., :H, :W]


class _ResidualBlockSR(Module):
    def __init__(self, nf, key):
        k1, k2 = jax.random.split(key)
        self.conv1 = Conv2d(nf, nf, 3, 1, 1, key=k1)
        self.conv2 = Conv2d(nf, nf, 3, 1, 1, key=k2)
        self.bn1 = BatchNorm2d(nf)
        self.bn2 = BatchNorm2d(nf)

    def __call__(self, x):
        h = jax.nn.relu(self.bn1(self.conv1(x)))
        return x + self.bn2(self.conv2(h))


class SRResNet(Reconstructor):
    """SRResNet super-resolution backbone (reference srresnet.py:185)."""

    def __init__(self, in_channels: int = 3, out_channels: int = 3, scale: int = 2, nf: int = 64, n_blocks: int = 16, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, n_blocks + 4))
        self.head = Conv2d(in_channels, nf, 9, 1, 4, key=next(ks))
        self.blocks = [_ResidualBlockSR(nf, next(ks)) for _ in range(n_blocks)]
        self.mid = Conv2d(nf, nf, 3, 1, 1, key=next(ks))
        self.up = Conv2d(nf, nf * scale * scale, 3, 1, 1, key=next(ks))
        self.shuffle = PixelShuffle(scale)
        self.tail = Conv2d(nf, out_channels, 9, 1, 4, key=next(ks))
        self.scale = scale

    def __call__(self, y, physics=None, **kwargs):
        h0 = jax.nn.relu(self.head(y))
        h = h0
        for b in self.blocks:
            h = b(h)
        h = self.mid(h) + h0
        h = jax.nn.relu(self.shuffle(self.up(h)))
        return self.tail(h)


class AutoEncoder(Denoiser):
    """Fully-connected autoencoder (reference ae.py:52)."""

    def __init__(self, dim_input: int, dim_hid: int = 512, dim_mid: int = 128, residual: bool = True, key=None):
        from .layers import Linear

        key = key if key is not None else jax.random.key(0)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        self.enc1 = Linear(dim_input, dim_hid, key=k1)
        self.enc2 = Linear(dim_hid, dim_mid, key=k2)
        self.dec1 = Linear(dim_mid, dim_hid, key=k3)
        self.dec2 = Linear(dim_hid, dim_input, key=k4)
        self.residual = residual

    def __call__(self, x, sigma=None, **kwargs):
        shape = x.shape
        v = x.reshape(shape[0], -1)
        h = jax.nn.relu(self.enc1(v))
        z = jax.nn.relu(self.enc2(h))
        h = jax.nn.relu(self.dec1(z))
        out = self.dec2(h)
        if self.residual:
            out = out + v
        return out.reshape(shape)


class DScCP(Denoiser):
    """Deep sparse-coding Chambolle-Pock denoiser (reference dsccp.py:156):
    unrolled CP iterations with learned analysis convolutions."""

    def __init__(self, depth: int = 20, nf: int = 64, in_channels: int = 3, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 2 * depth + 1))
        self.conv_a = [Conv2d(in_channels, nf, 3, 1, 1, bias=False, key=next(ks)) for _ in range(depth)]
        self.conv_s = [Conv2d(nf, in_channels, 3, 1, 1, bias=False, key=next(ks)) for _ in range(depth)]
        self.depth = depth
        self.tau = jnp.full((depth,), 0.5)
        self.sigma_cp = jnp.full((depth,), 0.5)

    def __call__(self, x, sigma=0.05, **kwargs):
        sig = handle_sigma(sigma, x)
        u = jnp.zeros_like(self.conv_a[0](x))
        z = x
        x_bar = x
        for k in range(self.depth):
            # dual ascent with soft clipping (l-inf ball of radius sigma)
            u = u + self.sigma_cp[k] * self.conv_a[k](x_bar)
            u = jnp.clip(u, -1.0, 1.0)
            # primal descent + data proximal
            z_new = (z - self.tau[k] * self.conv_s[k](u) + self.tau[k] * x) / (1 + self.tau[k])
            x_bar = 2 * z_new - z
            z = z_new
        return z
