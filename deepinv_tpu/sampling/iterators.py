"""MCMC sampling iterators (reference deepinv/sampling/sampling_iterators/).

Each iterator maps state ``X = {"x": x}`` to the next chain state. Explicit
``key`` threading replaces the reference's global torch generators.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import Module

__all__ = ["SamplingIterator", "ULAIterator", "SKRockIterator"]


class SamplingIterator(Module):
    def __init__(self, algo_params: dict = None, clip=None):
        self.algo_params = dict(algo_params or {})
        self.clip = clip

    def initialize(self, x_init):
        return {"x": x_init}

    def initialize_latent_variables(self, x_init, y, physics,
                                    cur_data_fidelity, cur_prior):
        """Initial chain state dict (reference
        sampling_iterators/sampling_iterator.py:30); override to add latent
        variables beyond ``{"x": x}``."""
        return {"x": x_init}

    def _clip(self, x):
        if self.clip is not None:
            x = jnp.clip(x, self.clip[0], self.clip[1])
        return x

    def __call__(self, X, y, physics, data_fidelity, prior, iteration, key):
        raise NotImplementedError


class ULAIterator(SamplingIterator):
    r"""Unadjusted Langevin step (reference ula.py:79):
    ``x+ = x + eta (grad log p(y|x) + alpha grad log p(x)) + sqrt(2 eta) z``.

    algo_params: step_size, alpha, sigma.
    """

    def __call__(self, X, y, physics, data_fidelity, prior, iteration, key):
        x = X["x"]
        eta = self.algo_params["step_size"]
        alpha = self.algo_params.get("alpha", 1.0)
        sigma = self.algo_params.get("sigma", 0.05)
        noise = jax.random.normal(key, x.shape, x.dtype) * jnp.sqrt(2 * eta)
        lhood = -data_fidelity.grad(x, y, physics)
        lprior = -prior.grad(x, sigma) * alpha
        x_t = x + eta * (lhood + lprior) + noise
        return {"x": self._clip(x_t)}


class SKRockIterator(SamplingIterator):
    r"""SK-ROCK step (reference SKRock.py:80): stabilized Runge-Kutta-
    Chebyshev Langevin with ``inner_iter`` internal stages.

    algo_params: step_size, alpha, inner_iter (default 10), eta (default
    0.05), sigma.
    """

    def __call__(self, X, y, physics, data_fidelity, prior, iteration, key):
        x = X["x"]
        p = self.algo_params
        eta_damp = p.get("eta", 0.05)
        s = int(p.get("inner_iter", 10))
        step = p["step_size"]
        alpha = p.get("alpha", 1.0)
        sigma = p.get("sigma", 0.05)

        posterior = lambda u: data_fidelity.grad(u, y, physics) + alpha * prior.grad(
            u, sigma
        )

        import numpy as np

        w0 = 1 + eta_damp / (s**2)
        th = float(np.arccosh(w0))
        T = lambda k: float(np.cosh(k * th))
        Tp = lambda k: float(k * np.sinh(k * th) / np.sinh(th))
        w1 = T(s) / Tp(s)
        mu1 = w1 / w0
        nu1 = s * w1 / 2
        kappa1 = s * (w1 / w0)

        noise = jax.random.normal(key, x.shape, x.dtype) * jnp.sqrt(2 * step)

        xts_2 = x
        xts = x - mu1 * step * posterior(x + nu1 * noise) + kappa1 * noise
        for js in range(2, s + 1):
            xts_1 = xts
            mu = 2 * w1 * T(js - 1) / T(js)
            nu = 2 * w0 * T(js - 1) / T(js)
            kappa = 1 - nu
            xts = -mu * step * posterior(xts) + nu * xts + kappa * xts_2
            xts_2 = xts_1
        return {"x": self._clip(xts)}


class DiffusionIterator(SamplingIterator):
    """One Monte-Carlo 'iteration' = a full diffusion run from fresh noise
    (reference sampling_iterators/diffusion.py:7); used by
    :class:`deepinv_tpu.sampling.DiffusionSampler` to estimate posterior
    moments by repeated sampling."""

    def __call__(self, X, y, physics, data_fidelity, prior, iteration, key):
        # `prior` is the diffusion reconstructor: model(y, physics, key)
        x = prior(y, physics, key=key)
        return {"x": self._clip(x)}
