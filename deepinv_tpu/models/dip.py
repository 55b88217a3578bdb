"""Deep Image Prior and ConvDecoder (reference deepinv/models/dip.py:198).

Untrained reconstruction: optimize the weights of a decoder network so that
``A(G_w(z)) ~ y``. The inner optimization is an optax adam loop inside
``lax.fori_loop`` — one compiled program for the whole fit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from .base import Reconstructor
from .layers import Conv2d, UpsampleNearest, BatchNorm2d

__all__ = ["ConvDecoder", "DeepImagePrior"]


class ConvDecoder(Module):
    """Convolutional decoder z -> image (reference dip.py ConvDecoder)."""

    def __init__(self, img_shape, in_size=(4, 4), channels: int = 64, layers: int = 5, key=None):
        key = key if key is not None else jax.random.key(0)
        ks = iter(jax.random.split(key, layers + 2))
        C_out, H, W = img_shape
        self.in_size = tuple(in_size)
        self.channels = channels
        self.convs = [Conv2d(channels, channels, 3, 1, 1, key=next(ks)) for _ in range(layers)]
        # learnable per-channel affine after each normalization (the
        # reference's BatchNorm has affine=True, dip.py ConvDecoder) —
        # without it the normalization strips the scale the fit needs
        self.gammas = [jnp.ones((1, channels, 1, 1)) for _ in range(layers)]
        self.betas = [jnp.zeros((1, channels, 1, 1)) for _ in range(layers)]
        self.out_conv = Conv2d(channels, C_out, 1, 1, 0, key=next(ks))
        self.img_shape = tuple(img_shape)
        self.n_up = layers

    def __call__(self, z):
        h = z
        H, W = self.img_shape[1:]
        for i, conv in enumerate(self.convs):
            # progressive nearest-neighbor upsampling toward the target size
            th = max(self.in_size[0], int(round(H * (i + 1) / self.n_up)))
            tw = max(self.in_size[1], int(round(W * (i + 1) / self.n_up)))
            h = jax.image.resize(h, h.shape[:2] + (th, tw), method="nearest")
            h = jax.nn.relu(conv(h))
            # channel norm + learnable affine
            mu = jnp.mean(h, axis=(2, 3), keepdims=True)
            sd = jnp.std(h, axis=(2, 3), keepdims=True) + 1e-5
            h = self.gammas[i] * (h - mu) / sd + self.betas[i]
        return jax.nn.sigmoid(self.out_conv(h))

    def latent_shape(self, batch: int = 1):
        return (batch, self.channels) + self.in_size


class DeepImagePrior(Reconstructor):
    """DIP reconstruction (reference dip.py:198).

    :param generator: decoder network (default ConvDecoder).
    :param iterations: inner optimization steps.
    :param lr: adam learning rate.
    """

    def __init__(self, generator=None, img_shape=(1, 64, 64), iterations: int = 1000, lr: float = 1e-2, verbose: bool = False):
        self.generator = generator if generator is not None else ConvDecoder(img_shape)
        self.iterations = iterations
        self.lr = lr

    def __call__(self, y, physics, key=None, **kwargs):
        import optax

        key = ensure_key(key, 0)
        z = jax.random.normal(key, self.generator.latent_shape(y.shape[0])) * 0.1
        opt = optax.adam(self.lr)
        params0 = self.generator
        state0 = opt.init(params0)

        def loss(params):
            r = physics.A(params(z)) - y
            return jnp.sum(jnp.abs(r) ** 2)

        def body(_, carry):
            params, state = carry
            g = jax.grad(loss)(params)
            updates, state = opt.update(g, state, params)
            params = jax.tree_util.tree_map(lambda a, b: a + b, params, updates)
            return (params, state)

        params, _ = jax.lax.fori_loop(0, self.iterations, body, (params0, state0))
        return params(z)
