"""Potential base class (reference deepinv/optim/potential.py:13).

A Potential is anything with ``fn / grad / prox / conjugate / prox_conjugate /
bregman_prox``. JAX-native defaults: ``grad`` falls back to ``jax.grad`` of
``fn`` (the reference uses torch.autograd — potential.py:52), and ``prox``
falls back to an internal gradient descent compiled to ``lax.fori_loop``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = ["Potential"]


class Potential(Module):
    """Base potential; pass ``fn`` to wrap a plain callable without
    subclassing (reference potential.py:13 ``Potential(fn=...)``)."""

    def __init__(self, fn=None):
        if fn is not None:
            self._custom_fn = fn

    def fn(self, x, *args, **kwargs):
        f = getattr(self, "_custom_fn", None)
        if f is not None:
            return f(x, *args, **kwargs)
        raise NotImplementedError

    def __call__(self, x, *args, **kwargs):
        return self.fn(x, *args, **kwargs)

    def grad(self, x, *args, **kwargs):
        """Gradient of the potential; autodiff default (potential.py:52)."""
        g = jax.grad(lambda u: jnp.sum(self.fn(u, *args, **kwargs)))(x)
        return g

    def prox(self, x, *args, gamma=1.0, stepsize_inter=1.0, max_iter_inter: int = 50, **kwargs):
        """prox_{gamma f}(x) by inner gradient descent (potential.py:154)."""

        def obj_grad(u):
            return jax.grad(
                lambda v: jnp.sum(gamma * self.fn(v, *args, **kwargs))
                + 0.5 * jnp.sum((v - x) ** 2)
            )(u)

        def body(_, u):
            return u - stepsize_inter * obj_grad(u)

        return jax.lax.fori_loop(0, max_iter_inter, body, x)

    def conjugate(self, x, *args, **kwargs):
        raise NotImplementedError

    def grad_conj(self, x, *args, **kwargs):
        """Gradient of the convex conjugate (reference potential.py:74);
        autodiff of :meth:`conjugate` by default (for convex differentiable
        potentials this is the inverse of :meth:`grad`)."""
        return jax.grad(
            lambda u: jnp.sum(self.conjugate(u, *args, **kwargs))
        )(x)

    def prox_conjugate(self, x, *args, gamma=1.0, lamb=1.0, **kwargs):
        r"""Moreau decomposition: prox_{gamma (lamb f)^*}(x) =
        x - gamma prox_{lamb f / gamma}(x / gamma) (potential.py:139)."""
        return x - gamma * self.prox(x / gamma, *args, gamma=lamb / gamma, **kwargs)

    def bregman_prox(self, x, bregman_potential, *args, gamma=1.0, **kwargs):
        """Bregman proximal operator (potential.py:175); gradient-descent
        default in the dual variable."""
        xi = bregman_potential.grad(x)

        def obj_grad(u):
            return jax.grad(
                lambda v: jnp.sum(gamma * self.fn(v, *args, **kwargs))
                + jnp.sum(bregman_potential.fn(v))
                - jnp.sum(v * xi)
            )(u)

        def body(_, u):
            return u - 1.0 * obj_grad(u)

        return jax.lax.fori_loop(0, 50, body, x)
