"""Public SURE divergence estimators (reference deepinv/loss/sure.py:12-95):
exact, Hutchinson, and Ramani Monte-Carlo divergence of ``y -> A(f(y))``,
pixel-normalized per batch element like the reference.

JAX-native formulations: the reference uses reverse-mode vector-Jacobian
products; forward-mode ``jax.jvp`` computes the same bilinear forms in one
pass (b^T J b == b^T (J b)), and the exact divergence is the trace of the
full Jacobian via ``jax.jacfwd``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["exact_div", "hutch_div", "mc_div"]


def _af(f, physics):
    return lambda v: physics.A(f(v, physics))


def _bmean(t):
    return jnp.mean(t.reshape(t.shape[0], -1), axis=1)


def exact_div(y, physics, model):
    """Exact pixel-normalized divergence of ``y -> A(model(y, physics))``:
    Jacobian trace / n (reference sure.py:42 — use on SMALL images only)."""
    fn = _af(model, physics)
    J = jax.jacfwd(fn)(y)
    n = y.size
    return jnp.trace(J.reshape(n, n)) / (y.size // y.shape[0])


def hutch_div(y, physics, f, mc_iter: int = 1, key=None):
    """Hutchinson estimate ``E_b[mean(b * (J b))]`` with Gaussian probes
    (reference sure.py:12), per batch element, averaged over ``mc_iter``."""
    key = key if key is not None else jax.random.key(0)
    fn = _af(f, physics)
    out = 0.0
    for i in range(mc_iter):
        b = jax.random.normal(jax.random.fold_in(key, i), y.shape, y.dtype)
        _, jvp_b = jax.jvp(fn, (y,), (b,))
        out = out + _bmean(b * jvp_b)
    return out / mc_iter


def mc_div(y1, y, f, physics, tau: float, precond=lambda x: x, key=None):
    """Ramani Monte-Carlo divergence ``mean(b * (A f(y + tau b) - y1)) /
    tau`` per batch element (reference sure.py:70); ``y1 = A(f(y))``."""
    key = key if key is not None else jax.random.key(0)
    b = jax.random.normal(key, y.shape, y.dtype)
    y2 = physics.A(f(y + b * tau, physics))
    return _bmean(precond(b) * precond(y2 - y1) / tau)
