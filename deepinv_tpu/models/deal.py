"""DEAL reconstructor (reference deepinv/models/deal.py:15, 1163 LoC).

Compact re-design of "Deep Equilibrium Attention Least-squares": solve
``argmin_x 1/2||Ax-y||^2 + lam * g_theta(x)`` where ``g_theta`` is a learned
*convex ridge* regularizer ``sum_i psi(w_i * x)`` with convex softplus-spline
profiles — minimized by accelerated gradient descent in a ``fori_loop``
(gradients of the convex ridge are exact via jax.grad).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import Module
from .base import Reconstructor
from .layers import Conv2d
from ..core.linalg import transpose_primal

__all__ = ["DEAL"]


class _ConvexRidge(Module):
    """g(x) = sum_i mean(psi_i(W x)_i) with convex profiles psi (softplus
    integral form): psi'(t) = a * tanh(t / b) — monotone => psi convex."""

    def __init__(self, channels: int = 32, in_channels: int = 1, kernel_size: int = 7, key=None):
        key = key if key is not None else jax.random.key(0)
        self.W = Conv2d(in_channels, channels, kernel_size, 1, kernel_size // 2, bias=False, key=key)
        self.a = jnp.ones((channels,)) * 0.1
        self.b = jnp.ones((channels,)) * 0.1

    def grad(self, x):
        """exact grad: W^T psi'(W x)."""
        u = self.W(x)
        g = jnp.abs(self.a)[None, :, None, None] * jnp.tanh(
            u / jnp.clip(jnp.abs(self.b)[None, :, None, None], 1e-3, None)
        )
        B, C = x.shape[:2]
        fwd = lambda v: self.W(v)
        (xt,) = jax.linear_transpose(
            fwd, transpose_primal(g, x.shape, x.dtype)
        )(g)
        return xt


class DEAL(Reconstructor):
    """Learned convex-regularized least squares (reference deal.py:15).

    :param lam: regularization strength.
    :param n_iter: accelerated gradient iterations (one compiled loop).
    """

    def __init__(self, in_channels: int = 1, channels: int = 32, lam: float = 1.0, n_iter: int = 100, step: float = 0.5, key=None):
        self.ridge = _ConvexRidge(channels, in_channels, key=key)
        self.lam = jnp.asarray(lam)
        self.n_iter = n_iter
        self.step = step

    def __call__(self, y, physics, **kwargs):
        x0 = physics.A_adjoint(y)

        def grad_F(x):
            return physics.A_adjoint(physics.A(x) - y) + self.lam * self.ridge.grad(x)

        def body(i, carry):
            x, z = carry
            x_new = z - self.step * grad_F(z)
            t = (i + 2.0) / (i + 5.0)
            z_new = x_new + t * (x_new - x)
            return (x_new, z_new)

        x, _ = jax.lax.fori_loop(0, self.n_iter, body, (x0, x0))
        return x
