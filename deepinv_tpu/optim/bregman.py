"""Bregman potentials for mirror descent (reference deepinv/optim/bregman.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .potential import Potential

__all__ = ["Bregman", "BregmanL2", "BurgEntropy", "NegEntropy", "Bregman_ICNN"]


class Bregman(Potential):
    """Base Bregman potential h (bregman.py:7): needs grad and grad_conj.
    ``Bregman(phi=callable)`` wraps a plain potential; its gradient comes
    from autodiff and ``grad_conj`` must then be supplied or overridden."""

    def __init__(self, phi=None):
        super().__init__(fn=phi)

    def grad_conj(self, xi, *args, **kwargs):
        raise NotImplementedError

    def div(self, x, y):
        """Bregman divergence D_h(x, y) = h(x) - h(y) - <grad h(y), x-y>."""
        return (
            jnp.sum(self.fn(x))
            - jnp.sum(self.fn(y))
            - jnp.vdot(self.grad(y), x - y).real
        )

    def MD_step(self, x, grad, *args, gamma: float = 1.0, **kwargs):
        """One mirror-descent step ``grad_conj(grad(x) - gamma * grad)``
        (reference bregman.py:36)."""
        return self.grad_conj(self.grad(x, *args, **kwargs) - gamma * grad)


class BregmanL2(Bregman):
    """h(x) = 0.5||x||^2; mirror descent reduces to GD (bregman.py:50)."""

    def fn(self, x, *args, **kwargs):
        return 0.5 * jnp.sum(x.reshape(x.shape[0], -1) ** 2, axis=1)

    def grad(self, x, *args, **kwargs):
        return x

    def grad_conj(self, xi, *args, **kwargs):
        return xi


class BurgEntropy(Bregman):
    """h(x) = -sum log x (positive orthant geometry, bregman.py:107).

    :Examples:

        ``grad_conj`` inverts ``grad`` — the defining property mirror
        descent relies on:

        >>> import jax, jax.numpy as jnp
        >>> from deepinv_tpu.optim import BurgEntropy
        >>> h = BurgEntropy()
        >>> x = jax.random.uniform(jax.random.key(0), (1, 1, 4, 4)) + 0.5
        >>> bool(jnp.allclose(h.grad_conj(h.grad(x)), x, atol=1e-5))
        True
    """

    def fn(self, x, *args, **kwargs):
        return -jnp.sum(jnp.log(x.reshape(x.shape[0], -1)), axis=1)

    def grad(self, x, *args, **kwargs):
        return -1.0 / x

    def grad_conj(self, xi, *args, **kwargs):
        return -1.0 / xi


class NegEntropy(Bregman):
    """h(x) = sum x log x (simplex geometry, bregman.py:158)."""

    def fn(self, x, *args, **kwargs):
        v = x.reshape(x.shape[0], -1)
        return jnp.sum(v * jnp.log(jnp.clip(v, 1e-30, None)), axis=1)

    def grad(self, x, *args, **kwargs):
        return jnp.log(jnp.clip(x, 1e-30, None)) + 1

    def grad_conj(self, xi, *args, **kwargs):
        return jnp.exp(xi - 1)


class Bregman_ICNN(Bregman):
    """Learned Bregman potential from an input-convex network
    (reference bregman.py:207). ``grad_conj`` solves the inverse-gradient
    problem by conjugate-gradient-free fixed-point iterations."""

    def __init__(self, icnn=None):
        if icnn is None:
            from ..models.wrappers_models import ICNN

            icnn = ICNN()
        self.icnn = icnn

    def fn(self, x, *args, **kwargs):
        return self.icnn.fn(x)

    def grad(self, x, *args, **kwargs):
        return self.icnn.grad(x)

    def grad_conj(self, xi, *args, max_iter: int = 50, lr: float = 0.5, **kwargs):
        # solve grad h(x) = xi  <=>  x = argmax <xi, x> - h(x) by ascent
        def body(_, x):
            return x - lr * (self.grad(x) - xi)

        return jax.lax.fori_loop(0, max_iter, body, xi)
