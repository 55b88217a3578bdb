"""Patch-based priors: PatchPrior and PatchNR
(reference deepinv/optim/prior.py:614 PatchPrior, :678-838 PatchNR).

PatchNR's normalizing flow is a compact RealNVP built from affine coupling
layers — invertible by construction, with exact log-determinants; trained
with maximum likelihood on clean patches. All flow passes are fused matmuls.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import Module
from ..core.rng import ensure_key
from .prior import Prior
from .epll import patch_extractor

__all__ = ["PatchPrior", "PatchNR"]


class PatchPrior(Prior):
    """g(x) = sum_patches phi(patch) for any patch potential phi
    (reference prior.py:614)."""

    def __init__(self, negative_patch_log_likelihood, patch_size: int = 6, n_patches: int = -1, pad: bool = False):
        self.nll = negative_patch_log_likelihood
        self.patch_size = patch_size
        self.n_patches = n_patches

    def fn(self, x, *args, **kwargs):
        patches, _ = patch_extractor(x, self.patch_size)
        B, N, d = patches.shape
        if self.n_patches > 0 and self.n_patches < N:
            patches = patches[:, : self.n_patches]
        vals = self.nll(patches.reshape(-1, d)).reshape(B, -1)
        return jnp.sum(vals, axis=1)


class _Coupling(Module):
    """Affine coupling layer with a 2-layer MLP conditioner.

    Split x = [a (d1), b (d2)]; ``flip=False`` transforms b conditioned on a,
    ``flip=True`` transforms a conditioned on b.
    """

    def __init__(self, dim: int, hidden: int, flip: bool, key):
        from ..models.layers import Linear

        k1, k2, k3 = jax.random.split(key, 3)
        self.d1 = dim // 2
        self.d2 = dim - self.d1
        self.flip = flip
        cond_dim = self.d2 if flip else self.d1
        out_dim = self.d1 if flip else self.d2
        self.out_dim = out_dim
        self.l1 = Linear(cond_dim, hidden, key=k1)
        self.l2 = Linear(hidden, hidden, key=k2)
        self.l3 = Linear(hidden, 2 * out_dim, key=k3)
        # zero-init the last layer: identity flow at start
        self.l3 = self.l3.replace(weight=self.l3.weight * 0.0)

    def _net(self, cond):
        h = jax.nn.gelu(self.l1(cond))
        h = jax.nn.gelu(self.l2(h))
        out = self.l3(h)
        s, t = out[..., : self.out_dim], out[..., self.out_dim :]
        s = jnp.tanh(s)  # bounded log-scale for stability
        return s, t

    def forward(self, x):
        a, b = x[..., : self.d1], x[..., self.d1 :]
        if self.flip:
            s, t = self._net(b)
            a = a * jnp.exp(s) + t
        else:
            s, t = self._net(a)
            b = b * jnp.exp(s) + t
        return jnp.concatenate([a, b], axis=-1), jnp.sum(s, axis=-1)

    def inverse(self, z):
        a, b = z[..., : self.d1], z[..., self.d1 :]
        if self.flip:
            s, t = self._net(b)
            a = (a - t) * jnp.exp(-s)
        else:
            s, t = self._net(a)
            b = (b - t) * jnp.exp(-s)
        return jnp.concatenate([a, b], axis=-1)


class PatchNR(Prior):
    """Normalizing-flow patch prior (reference prior.py:678).

    ``g(x) = sum_patches -log p_flow(patch)`` with p_flow a RealNVP over
    flattened patches. ``fit`` trains by maximum likelihood.
    """

    def __init__(self, patch_size: int = 6, channels: int = 1, n_layers: int = 5, hidden: int = 128, key=None, seed: int = 0):
        key = ensure_key(key, seed)
        self.patch_size = patch_size
        self.channels = channels
        dim = channels * patch_size**2
        self.dim = dim
        ks = jax.random.split(key, n_layers)
        self.layers = [
            _Coupling(dim, hidden, flip=(i % 2 == 1), key=ks[i]) for i in range(n_layers)
        ]

    def flow_forward(self, x):
        """x -> (z, log|det J|)."""
        logdet = jnp.zeros(x.shape[:-1])
        z = x
        for l in self.layers:
            z, ld = l.forward(z)
            logdet = logdet + ld
        return z, logdet

    def flow_inverse(self, z):
        x = z
        for l in reversed(self.layers):
            x = l.inverse(x)
        return x

    def nll(self, patches):
        z, logdet = self.flow_forward(patches)
        log_pz = -0.5 * jnp.sum(z**2, axis=-1) - 0.5 * self.dim * math.log(2 * math.pi)
        return -(log_pz + logdet)

    def fn(self, x, *args, **kwargs):
        patches, _ = patch_extractor(x, self.patch_size)
        B, N, d = patches.shape
        return jnp.sum(self.nll(patches.reshape(-1, d)).reshape(B, N), axis=1)

    def fit(self, patches, n_steps: int = 500, lr: float = 1e-3, batch_size: int = 256, key=None, verbose: bool = False):
        """Max-likelihood training on (N, d) clean patches."""
        import optax

        key = ensure_key(key, 7)
        opt = optax.adam(lr)
        model = self
        state = opt.init(model)
        patches = jnp.asarray(patches)

        @jax.jit
        def step(model, state, batch):
            def loss(m):
                return jnp.mean(m.nll(batch))

            l, g = jax.value_and_grad(loss)(model)
            updates, state = opt.update(g, state, model)
            model = jax.tree_util.tree_map(lambda a, b: a + b, model, updates)
            return model, state, l

        n = patches.shape[0]
        for i in range(n_steps):
            key, kb = jax.random.split(key)
            idx = jax.random.randint(kb, (min(batch_size, n),), 0, n)
            model, state, l = step(model, state, patches[idx])
            if verbose and i % 100 == 0:
                print(f"PatchNR step {i}: nll {float(l):.3f}")
        return model
