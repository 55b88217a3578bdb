"""Poisson2Sparse / ConvLista (reference deepinv/models/poisson2sparse.py:367).

ConvLista: unrolled convolutional ISTA with learned analysis/synthesis
dictionaries and soft-thresholds — each iteration is two convs + a
shrinkage (pure VPU/MXU work). Poisson2Sparse trains it self-supervised on
a single Poisson-noisy image with a Neighbor2Neighbor + sparsity objective.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Denoiser
from .layers import Conv2d

__all__ = ["ConvLista", "Poisson2Sparse"]


class ConvLista(Module):
    """Unrolled convolutional ISTA (reference ConvLista)."""

    def __init__(self, in_channels: int = 1, n_filters: int = 64, kernel_size: int = 5, n_iter: int = 10, key=None):
        key = key if key is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(key, 3)
        p = kernel_size // 2
        self.We = Conv2d(in_channels, n_filters, kernel_size, 1, p, bias=False, key=k1)
        self.Wd = Conv2d(n_filters, in_channels, kernel_size, 1, p, bias=False, key=k2)
        self.Wg = Conv2d(in_channels, n_filters, kernel_size, 1, p, bias=False, key=k3)
        # small-gain dictionaries keep the unrolled ISTA iterations stable
        self.We = self.We.replace(weight=self.We.weight * 0.1)
        self.Wd = self.Wd.replace(weight=self.Wd.weight * 0.1)
        self.Wg = self.Wg.replace(weight=self.Wg.weight * 0.1)
        self.theta = jnp.full((n_iter, 1, n_filters, 1, 1), 0.01)
        self.alpha = jnp.ones(())  # identity skip: stable self-supervised start
        self.n_iter = n_iter

    def __call__(self, x):
        z = self.encode(x)
        return self.alpha * x + self.Wd(z)

    def encode(self, x):
        z = jnp.zeros_like(self.We(x))
        for k in range(self.n_iter):
            r = x - self.Wd(z)
            z = z + self.Wg(r)
            th = jnp.abs(self.theta[k])
            z = jnp.sign(z) * jnp.maximum(jnp.abs(z) - th, 0.0)
        return z


class Poisson2Sparse(Denoiser):
    """Single-image self-supervised Poisson denoiser (reference
    poisson2sparse.py): fits a ConvLista on the noisy image with an
    N2N-style neighbor loss + L1 code sparsity, then denoises."""

    def __init__(self, n_iter: int = 10, n_filters: int = 32, train_steps: int = 200, lr: float = 1e-3, sparsity: float = 1e-4, key=None):
        self.net = ConvLista(n_filters=n_filters, n_iter=n_iter, key=key)
        self.train_steps = train_steps
        self.lr = lr
        self.sparsity = sparsity

    @staticmethod
    def _neighbors(y, key):
        B, C, H, W = y.shape
        H2, W2 = H // 2, W // 2
        kc, ko = jax.random.split(key)
        choice = jax.random.randint(kc, (B, 1, H2, W2), 0, 4)
        offset = jax.random.randint(ko, (B, 1, H2, W2), 1, 4)
        cells = y[:, :, : H2 * 2, : W2 * 2].reshape(B, C, H2, 2, W2, 2)
        cells = jnp.moveaxis(cells, 3, -2).reshape(B, C, H2, W2, 4)
        g1 = jnp.take_along_axis(cells, (choice % 4)[..., None], axis=-1)[..., 0]
        g2 = jnp.take_along_axis(cells, ((choice + offset) % 4)[..., None], axis=-1)[..., 0]
        return g1, g2

    def __call__(self, y, sigma=None, key=None, **kwargs):
        import optax

        from ..core.rng import ensure_key

        key = ensure_key(key, 0)
        net = self.net
        opt = optax.adam(self.lr)
        state = opt.init(net)

        def loss(net, k):
            g1, g2 = self._neighbors(y, k)
            pred = net(g1)
            rec = jnp.mean((pred - g2) ** 2)
            sp = jnp.mean(jnp.abs(net.encode(y)))
            return rec + self.sparsity * sp

        def body(i, carry):
            net, state = carry
            k = jax.random.fold_in(key, i)
            g = jax.grad(loss)(net, k)
            updates, state = opt.update(g, state, net)
            net = jax.tree_util.tree_map(lambda a, b: a + b, net, updates)
            return (net, state)

        net, _ = jax.lax.fori_loop(0, self.train_steps, body, (net, state))
        return net(y)
