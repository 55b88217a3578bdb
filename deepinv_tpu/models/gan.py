"""GAN architectures (reference deepinv/models/gan.py, 408 LoC):
PatchGAN / ESRGAN / DCGAN discriminators, DCGAN generator, CSGM wrapper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Reconstructor
from .layers import Conv2d, ConvTranspose2d, BatchNorm2d, Linear

__all__ = [
    "PatchGANDiscriminator",
    "ESRGANDiscriminator",
    "DCGANGenerator",
    "DCGANDiscriminator",
    "CSGMGenerator",
]


class PatchGANDiscriminator(Module):
    """70x70 PatchGAN (reference gan.py PatchGANDiscriminator)."""

    def __init__(self, input_nc: int = 3, ndf: int = 64, n_layers: int = 3, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, n_layers + 2))
        layers = [(Conv2d(input_nc, ndf, 4, 2, 1, key=next(ks)), None)]
        nf = ndf
        for _ in range(1, n_layers):
            layers.append((Conv2d(nf, min(nf * 2, 512), 4, 2, 1, key=next(ks)), BatchNorm2d(min(nf * 2, 512))))
            nf = min(nf * 2, 512)
        layers.append((Conv2d(nf, min(nf * 2, 512), 4, 1, 1, key=next(ks)), BatchNorm2d(min(nf * 2, 512))))
        nf = min(nf * 2, 512)
        self.layers = layers
        self.final = Conv2d(nf, 1, 4, 1, 1, key=next(ks))

    def __call__(self, x):
        h = x
        for conv, bn in self.layers:
            h = conv(h)
            if bn is not None:
                h = bn(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return self.final(h)


class ESRGANDiscriminator(Module):
    """VGG-style discriminator (reference gan.py ESRGANDiscriminator)."""

    def __init__(self, input_shape=(3, 128, 128), key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 16))
        C = input_shape[0]
        cfg = [(C, 64, 1), (64, 64, 2), (64, 128, 1), (128, 128, 2),
               (128, 256, 1), (256, 256, 2), (256, 512, 1), (512, 512, 2)]
        self.convs = [
            (Conv2d(cin, cout, 3, s, 1, key=next(ks)), BatchNorm2d(cout) if i > 0 else None)
            for i, (cin, cout, s) in enumerate(cfg)
        ]
        self.final = Conv2d(512, 1, 3, 1, 1, key=next(ks))

    def __call__(self, x):
        h = x
        for conv, bn in self.convs:
            h = conv(h)
            if bn is not None:
                h = bn(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return self.final(h)


class DCGANGenerator(Module):
    """DCGAN generator z -> image (reference gan.py DCGANGenerator)."""

    def __init__(self, output_size: int = 64, nz: int = 100, ngf: int = 64, nc: int = 3, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 6))
        self.nz = nz
        self.net = [
            (ConvTranspose2d(nz, ngf * 8, 4, 1, 0, bias=False, key=next(ks)), BatchNorm2d(ngf * 8)),
            (ConvTranspose2d(ngf * 8, ngf * 4, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ngf * 4)),
            (ConvTranspose2d(ngf * 4, ngf * 2, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ngf * 2)),
            (ConvTranspose2d(ngf * 2, ngf, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ngf)),
        ]
        self.final = ConvTranspose2d(ngf, nc, 4, 2, 1, bias=False, key=next(ks))

    def __call__(self, z):
        h = z.reshape(z.shape[0], self.nz, 1, 1)
        for conv, bn in self.net:
            h = jax.nn.relu(bn(conv(h)))
        return jnp.tanh(self.final(h))


class DCGANDiscriminator(Module):
    """DCGAN discriminator (reference gan.py DCGANDiscriminator)."""

    def __init__(self, ndf: int = 64, nc: int = 3, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, 6))
        self.net = [
            (Conv2d(nc, ndf, 4, 2, 1, bias=False, key=next(ks)), None),
            (Conv2d(ndf, ndf * 2, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ndf * 2)),
            (Conv2d(ndf * 2, ndf * 4, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ndf * 4)),
            (Conv2d(ndf * 4, ndf * 8, 4, 2, 1, bias=False, key=next(ks)), BatchNorm2d(ndf * 8)),
        ]
        self.final = Conv2d(ndf * 8, 1, 4, 1, 0, bias=False, key=next(ks))

    def __call__(self, x):
        h = x
        for conv, bn in self.net:
            h = conv(h)
            if bn is not None:
                h = bn(h)
            h = jax.nn.leaky_relu(h, 0.2)
        return self.final(h)


class CSGMGenerator(Reconstructor):
    r"""Compressed sensing with generative models (reference gan.py
    CSGMGenerator): optimize the latent z so that ``A(G(z)) ~ y``."""

    def __init__(self, backbone_generator, inf_max_iter: int = 100, inf_lr: float = 1e-2, inf_tol: float = 1e-4):
        self.G = backbone_generator
        self.inf_max_iter = inf_max_iter
        self.inf_lr = inf_lr
        self.inf_tol = inf_tol

    def random_latent(self, key=None, batch_size: int = 1):
        """Uniform[-1, 1] latent sample of shape (B, nz) (reference
        gan.py:339)."""
        from ..core.rng import ensure_key

        key = ensure_key(key, 0)
        return jax.random.uniform(key, (batch_size, self.G.nz)) * 2 - 1

    def optimize_z(self, z, y, physics):
        """Inference-time latent optimization: heavy-ball gradient descent
        on ``||A(G(z)) - y||^2`` (reference gan.py:361, Adam loop)."""

        def loss(zz):
            r = physics.A(self.G(zz)) - y
            return jnp.sum(jnp.abs(r) ** 2)

        def body(_, state):
            zz, m = state
            g = jax.grad(loss)(zz)
            m = 0.9 * m + g
            return (zz - self.inf_lr * m, m)

        z, _ = jax.lax.fori_loop(0, self.inf_max_iter, body,
                                 (z, jnp.zeros_like(z)))
        return z

    def __call__(self, y, physics, key=None, **kwargs):
        from ..core.rng import ensure_key

        key = ensure_key(key, 0)
        z0 = jax.random.normal(key, (y.shape[0], self.G.nz))
        return self.G(self.optimize_z(z0, y, physics))
